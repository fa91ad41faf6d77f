# A/B: PALLAS_RVQ fused codebook search vs the XLA scan, full EnCodec
# inference at the headline batch. Measured on v5e: 418.3 -> 408.9ms (B=256).
import os, sys, time
sys.path.insert(0, "/root/repo")
import numpy as np

def run(pallas_rvq):
    import jax, jax.numpy as jnp
    import funcodec_tpu.quant.rvq as rvq_mod
    rvq_mod.PALLAS_RVQ = pallas_rvq
    from __graft_entry__ import _build_flagship
    model, _ = _build_flagship(kmeans_init=False)
    params, rvq_state = model.init(jax.random.PRNGKey(0))
    params = jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x, params)
    batch, T = 256, 160000
    speech = jnp.asarray(np.random.RandomState(0).randn(batch, T).astype(np.float32) * 0.1).astype(jnp.bfloat16)
    @jax.jit
    def f(params, rvq_state, speech):
        out = model.inference(params, rvq_state, speech, need_recon=True)
        return jnp.sum(jnp.abs(out["recon_speech"].astype(jnp.float32))), jnp.sum(out["code_indices"][0])
    for _ in range(2):
        s, c = f(params, rvq_state, speech); ck = (float(s), int(c))
    ts = []
    for _ in range(6):
        t0 = time.perf_counter(); s, _ = f(params, rvq_state, speech); float(s)
        ts.append(time.perf_counter() - t0)
    best = min(ts)
    print(f"pallas_rvq={pallas_rvq}: best={best*1e3:.1f}ms ({batch*10/best:.0f} audio-s/s) ck={ck}", flush=True)
    return best

t0 = run(False)
t1 = run(True)
print(f"speedup {t0/t1:.3f}x", flush=True)
