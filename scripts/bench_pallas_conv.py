"""A/B: PALLAS_STRIDE1 fused conv vs XLA path, full EnCodec inference on TPU.

Usage: python scripts/bench_pallas_conv.py [batch]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run(batch, pallas_on):
    import jax
    import jax.numpy as jnp

    import funcodec_tpu.ops.conv as conv_mod
    import funcodec_tpu.ops.conv_pallas as cp

    conv_mod.PALLAS_STRIDE1 = pallas_on
    cp.MIN_C = int(os.environ.get('MIN_C', '8'))

    from __graft_entry__ import _build_flagship

    model, _ = _build_flagship(kmeans_init=False)
    params, rvq_state = model.init(jax.random.PRNGKey(0))
    params = jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x, params
    )
    T = 10 * 16000
    speech = jnp.asarray(
        np.random.RandomState(0).randn(batch, T).astype(np.float32) * 0.1
    ).astype(jnp.bfloat16)

    @jax.jit
    def encode_decode(params, rvq_state, speech):
        out = model.inference(params, rvq_state, speech, need_recon=True)
        return (
            jnp.sum(jnp.abs(out["recon_speech"].astype(jnp.float32))),
            jnp.sum(out["code_indices"][0]),
        )

    s = None
    for _ in range(2):
        s, c = encode_decode(params, rvq_state, speech)
        checksum = (float(s), int(c))
    times = []
    for _ in range(7):
        t0 = time.perf_counter()
        s, _ = encode_decode(params, rvq_state, speech)
        float(s)
        times.append(time.perf_counter() - t0)
    best = min(times)
    print(
        f"pallas={pallas_on} batch={batch}: best={best*1e3:.1f}ms "
        f"({batch*10/best:.0f} audio-s/s) checksum={checksum}",
        flush=True,
    )
    return best, checksum


if __name__ == "__main__":
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    t_off, ck_off = run(batch, False)
    t_on, ck_on = run(batch, True)
    print(
        f"speedup: {t_off/t_on:.3f}x  checksum drift: "
        f"{abs(ck_on[0]-ck_off[0])/max(abs(ck_off[0]),1e-9):.2e} tokens_equal={ck_on[1]==ck_off[1]}",
        flush=True,
    )
