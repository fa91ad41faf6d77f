"""Decisive e2e A/B of the encoder/decoder execution variants on real TPU.

Variants (flags in funcodec_tpu.ops.conv):
  base            — plain XLA apply_layers (production default)
  resblock        — PALLAS_RESBLOCK (fused whole-resblock kernel, unpacked)
  packed          — PACKED_NARROW with packed-XLA resblocks
  packed+resblock — PACKED_NARROW dispatching resblocks to the Pallas kernel

e2e at ~400 ms/call is far above the ~38 ms axon dispatch floor, so plain
best-of-N timing is valid here (no fori_loop amortization needed).
Appends to /tmp/enc_ab.log.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

LOG = "/tmp/enc_ab.log"


from _benchlib import make_logger  # noqa: E402

log = make_logger(LOG)


def timeit(fn, *args, warmup=2, iters=6):
    for _ in range(warmup):
        out = fn(*args)
        float(np.asarray(out[0]))
    best = float("inf")
    for _ in range(iters):
        t0 = time.perf_counter()
        out = fn(*args)
        float(np.asarray(out[0]))
        best = min(best, time.perf_counter() - t0)
    return best, out


def main():
    import jax
    import jax.numpy as jnp

    import funcodec_tpu.ops.conv as conv_ops
    import funcodec_tpu.quant.rvq as rvq_mod
    from __graft_entry__ import _build_flagship

    B, SECONDS, SR = 256, 10, 16000
    T = SECONDS * SR
    audio_secs = B * SECONDS
    log(f"devices: {jax.devices()}  B={B} T={T}")

    model, _ = _build_flagship(kmeans_init=False)
    params_f32, rvq_state = model.init(jax.random.PRNGKey(0))
    params = jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x,
        params_f32,
    )
    speech = jnp.asarray(
        np.random.RandomState(0).randn(B, T).astype(np.float32) * 0.1
    ).astype(jnp.bfloat16)
    rvq_mod.PALLAS_RVQ = True

    ref_sum = None
    for name, packed, rb in [
        ("base", False, False),
        ("resblock", False, True),
        ("packed", True, False),
        ("packed+resblock", True, True),
    ]:
        conv_ops.PACKED_NARROW = packed
        conv_ops.PALLAS_RESBLOCK = rb

        @jax.jit
        def e2e(params, state, speech):
            out = model.inference(params, state, speech, need_recon=True)
            return (
                jnp.sum(jnp.abs(out["recon_speech"].astype(jnp.float32))),
                out["code_indices"][0],
            )

        try:
            dt, out = timeit(e2e, params, rvq_state, speech)
        except Exception as e:  # noqa: BLE001
            log(f"{name}: FAILED {type(e).__name__}: {str(e)[:200]}")
            continue
        s = float(np.asarray(out[0]))
        if ref_sum is None:
            ref_sum = s
        drift = abs(s - ref_sum) / max(abs(ref_sum), 1e-9)
        log(
            f"{name}: {dt*1e3:.1f} ms ({audio_secs/dt:.0f} audio_s/s)"
            f"  recon-sum drift vs base {drift:.2e}"
        )

    conv_ops.PACKED_NARROW = False
    conv_ops.PALLAS_RESBLOCK = False


if __name__ == "__main__":
    main()
