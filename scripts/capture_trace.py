"""Capture a jax.profiler trace of the flagship EnCodec serving path.

Produces a TensorBoard-profile / Perfetto-compatible trace under --out
covering N already-compiled inference calls at the production point
(B x dur_s, bf16). View with `tensorboard --logdir <out>` (profile plugin)
or upload the .trace.json.gz from <out>/plugins/profile/ to ui.perfetto.dev.

Usage:  python scripts/capture_trace.py [--out /tmp/tpu_trace] [--batch 256]
        [--dur 10.0] [--iters 3] [--fp32]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/tpu_trace")
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--dur", type=float, default=10.0)
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--fp32", action="store_true",
                    help="trace the bit-exact fp32 path instead of bf16")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    import funcodec_tpu.quant.rvq as rvq_mod
    from __graft_entry__ import _build_flagship

    rvq_mod.PALLAS_RVQ = not args.fp32  # production path uses the fused search
    model, _ = _build_flagship(kmeans_init=False)
    params, rvq_state = model.init(jax.random.PRNGKey(0))
    if not args.fp32:
        params = jax.tree_util.tree_map(
            lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x,
            params,
        )

    sr = 16_000
    T = int(args.dur * sr)
    rng = np.random.default_rng(0)
    speech = jnp.asarray(rng.standard_normal((args.batch, T)), jnp.float32) * 0.1
    if not args.fp32:
        speech = speech.astype(jnp.bfloat16)

    @jax.jit
    def infer(params, rvq_state, speech):
        out = model.inference(params, rvq_state, speech, need_recon=True)
        return jnp.sum(jnp.abs(out["recon_speech"].astype(jnp.float32)))

    # warm up / compile outside the trace; scalar fetch is the sync fence
    float(infer(params, rvq_state, speech))

    jax.profiler.start_trace(args.out)
    for _ in range(args.iters):
        float(infer(params, rvq_state, speech))
    jax.profiler.stop_trace()
    print(f"trace written to {args.out} "
          f"({args.iters} x B={args.batch} x {args.dur}s, "
          f"{'fp32' if args.fp32 else 'bf16'})")


if __name__ == "__main__":
    main()
