"""Phase breakdown of the flagship EnCodec inference path on real TPU.

VERDICT r1 item 3: the headline number rode an unprofiled path. This script
A/B-times each phase (encoder convs, LSTM ablation, RVQ search, decoder) at
the production serving point (B=256, 10 s, bf16) plus the bit-exact fp32
path, and reports the fp32-vs-bf16 token flip rate.

Axon timing protocol (NOTES_ROUND1): scalar host fetch as the sync fence,
best-of-N over whole jitted calls (never per-op), results appended to a log
file so the run can be detached and polled.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

LOG = "/tmp/prof_phase.log"


def log(msg):
    line = f"[{time.strftime('%H:%M:%S')}] {msg}"
    print(line, flush=True)
    with open(LOG, "a") as f:
        f.write(line + "\n")


def timeit(fn, *args, warmup=2, iters=6):
    for _ in range(warmup):
        out = fn(*args)
        float(np.asarray(jax_first_scalar(out)))
    best = float("inf")
    for _ in range(iters):
        t0 = time.perf_counter()
        out = fn(*args)
        float(np.asarray(jax_first_scalar(out)))
        best = min(best, time.perf_counter() - t0)
    return best, out


def jax_first_scalar(out):
    if isinstance(out, tuple):
        return out[0]
    return out


def main():
    import jax
    import jax.numpy as jnp

    import funcodec_tpu.quant.rvq as rvq_mod
    from __graft_entry__ import _build_flagship

    B, SECONDS, SR = 256, 10, 16000
    T = SECONDS * SR
    audio_secs = B * SECONDS
    log(f"devices: {jax.devices()}  B={B} T={T}")

    model, _ = _build_flagship(kmeans_init=False)
    params_f32, rvq_state = model.init(jax.random.PRNGKey(0))
    to_bf16 = lambda tree: jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x, tree
    )
    params_bf16 = to_bf16(params_f32)

    speech_f32 = jnp.asarray(
        np.random.RandomState(0).randn(B, T).astype(np.float32) * 0.1
    )
    speech_bf16 = speech_f32.astype(jnp.bfloat16)

    results = {}

    def record(name, dt):
        results[name] = dt
        log(f"{name}: {dt*1e3:.1f} ms  ({audio_secs/dt:.0f} audio_s/s)")

    # ---- 1. e2e fp32 (bit-exact path, PALLAS off) ----
    rvq_mod.PALLAS_RVQ = False

    @jax.jit
    def e2e_f32(params, state, speech):
        out = model.inference(params, state, speech, need_recon=True)
        return (
            jnp.sum(jnp.abs(out["recon_speech"].astype(jnp.float32))),
            out["code_indices"][0],
        )

    dt, out = timeit(e2e_f32, params_f32, rvq_state, speech_f32)
    record("e2e_fp32", dt)
    tokens_f32 = np.asarray(out[1])

    # ---- 2. e2e bf16 + Pallas RVQ (production path) ----
    rvq_mod.PALLAS_RVQ = True

    @jax.jit
    def e2e_bf16(params, state, speech):
        out = model.inference(params, state, speech, need_recon=True)
        return (
            jnp.sum(jnp.abs(out["recon_speech"].astype(jnp.float32))),
            out["code_indices"][0],
        )

    dt, out = timeit(e2e_bf16, params_bf16, rvq_state, speech_bf16)
    record("e2e_bf16_pallas", dt)
    tokens_bf16 = np.asarray(out[1])
    flip = float((tokens_f32 != tokens_bf16).mean())
    results["token_flip_rate"] = flip
    log(f"token flip rate fp32-vs-bf16: {flip:.4%}")

    # ---- 3. bf16, XLA RVQ scan (isolate the Pallas RVQ gain) ----
    rvq_mod.PALLAS_RVQ = False

    @jax.jit
    def e2e_bf16_xla(params, state, speech):
        out = model.inference(params, state, speech, need_recon=True)
        return (
            jnp.sum(jnp.abs(out["recon_speech"].astype(jnp.float32))),
            out["code_indices"][0],
        )

    dt, _ = timeit(e2e_bf16_xla, params_bf16, rvq_state, speech_bf16)
    record("e2e_bf16_xlarvq", dt)

    # ---- 4. encoder only (bf16) ----
    @jax.jit
    def enc_only(params, speech):
        emb = model.encoder(params["encoder"], speech)
        return jnp.sum(jnp.abs(emb.astype(jnp.float32))), emb

    dt, out = timeit(enc_only, params_bf16, speech_bf16)
    record("encoder_bf16", dt)
    emb = out[1]
    log(f"emb shape {emb.shape} dtype {emb.dtype}")

    # ---- 5. RVQ inference only, on the real emb (bf16 in, Pallas) ----
    rvq_mod.PALLAS_RVQ = True

    @jax.jit
    def rvq_only(params, state, emb):
        q, idx, _ = model.quantizer.inference(params["quantizer"], state, emb)
        return jnp.sum(jnp.abs(q.astype(jnp.float32))), q

    dt, out = timeit(rvq_only, params_bf16, rvq_state, emb)
    record("rvq_inference_bf16_pallas", dt)
    qemb = out[1]

    rvq_mod.PALLAS_RVQ = False

    @jax.jit
    def rvq_only_xla(params, state, emb):
        q, idx, _ = model.quantizer.inference(params["quantizer"], state, emb)
        return jnp.sum(jnp.abs(q.astype(jnp.float32))), q

    dt, _ = timeit(rvq_only_xla, params_bf16, rvq_state, emb)
    record("rvq_inference_bf16_xla", dt)

    # ---- 6. decoder only ----
    @jax.jit
    def dec_only(params, qemb):
        out = model.decoder(params["decoder"], qemb)
        return jnp.sum(jnp.abs(out.astype(jnp.float32)))

    dt, _ = timeit(dec_only, params_bf16, qemb)
    record("decoder_bf16", dt)

    # ---- 7. LSTM ablation: encoder/decoder with seq_model="none" ----
    from funcodec_tpu.models.seanet import SEANetConfig, SEANetDecoder, SEANetEncoder

    cfg_nolstm = SEANetConfig(norm="time_group_norm", causal=False, seq_model="none")
    enc_nl, dec_nl = SEANetEncoder(cfg_nolstm), SEANetDecoder(cfg_nolstm)
    p_enc = to_bf16(enc_nl.init(jax.random.PRNGKey(0)))
    p_dec = to_bf16(dec_nl.init(jax.random.PRNGKey(1)))

    @jax.jit
    def enc_nolstm(p, speech):
        emb = enc_nl(p, speech)
        return jnp.sum(jnp.abs(emb.astype(jnp.float32))), emb

    dt, out = timeit(enc_nolstm, p_enc, speech_bf16)
    record("encoder_bf16_nolstm", dt)

    @jax.jit
    def dec_nolstm(p, qemb):
        out = dec_nl(p, qemb)
        return jnp.sum(jnp.abs(out.astype(jnp.float32)))

    dt, _ = timeit(dec_nolstm, p_dec, qemb)
    record("decoder_bf16_nolstm", dt)

    with open("/tmp/prof_phase.json", "w") as f:
        json.dump(results, f, indent=2)
    log("DONE " + json.dumps(results))


if __name__ == "__main__":
    main()
