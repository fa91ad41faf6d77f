"""Headline benchmark: nq32 encode+decode audio-seconds/sec/chip on TPU.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, ...}

`value` is the PRODUCTION serving path (bf16 params + fused Pallas RVQ
search). The same line also reports the bit-exact fp32 path (the CLI
default used for token-parity claims), the token flip rate between the two
(first quantizer and all 32), and MFU / HBM-utilization estimates from
XLA's compiled cost analysis — the model is HBM-bandwidth-bound at this
batch point (see NOTES_ROUND2.md).

vs_baseline is measured against the PyTorch reference implementation
(funcodec SEANet + DistributedRVQ) running on this host's CPU — the only
reference runtime available in this environment (no GPU). The BASELINE.json
north-star (>=5x PyTorch-GPU) is tracked separately.
"""

import json
import os
import sys
import time

import numpy as np


def _artifact(name):
    """Measured-artifact JSONs committed under artifacts/ (see NOTES_ROUND3)."""
    p = os.path.join(os.path.dirname(os.path.abspath(__file__)), "artifacts", name)
    try:
        with open(p) as f:
            return json.load(f)
    except Exception:
        return None

V5E_PEAK_TFLOPS = 197.0  # bf16
V5E_PEAK_GBS = 819.0  # HBM


def _timeit(fn, args, warmup=2, iters=5):
    """Best-of-N wall time; a scalar host fetch is the sync fence (on the
    axon tunnel block_until_ready does not synchronize)."""
    out = None
    for _ in range(warmup):
        out = fn(*args)
        float(out[0])
    best = float("inf")
    for _ in range(iters):
        t0 = time.perf_counter()
        out = fn(*args)
        float(out[0])
        best = min(best, time.perf_counter() - t0)
    return best, out


def bench_tpu(batch=256, seconds=10, sr=16000):
    """Times both serving paths at the measured v5e throughput knee (B=256;
    B=32: 2.2k, B=64: 3.4k, B=128: 5.8k, B=256: 6.1-6.2k audio-s/s; B=512
    exceeds the 16G HBM)."""
    import jax
    import jax.numpy as jnp

    import funcodec_tpu.quant.rvq as rvq_mod
    from __graft_entry__ import _build_flagship

    model, _ = _build_flagship(kmeans_init=False)
    params_f32, rvq_state = model.init(jax.random.PRNGKey(0))
    params_bf16 = jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x,
        params_f32,
    )

    T = seconds * sr
    speech_f32 = jnp.asarray(
        np.random.RandomState(0).randn(batch, T).astype(np.float32) * 0.1
    )
    speech_bf16 = speech_f32.astype(jnp.bfloat16)
    audio_secs = batch * seconds

    def make_fn():
        @jax.jit
        def encode_decode(params, rvq_state, speech):
            out = model.inference(params, rvq_state, speech, need_recon=True)
            return (
                jnp.sum(jnp.abs(out["recon_speech"].astype(jnp.float32))),
                out["code_indices"][0],
            )

        return encode_decode

    # bit-exact fp32 path (CLI default; token-parity contract)
    rvq_mod.PALLAS_RVQ = False
    f32_fn = make_fn()
    dt_f32, out = _timeit(f32_fn, (params_f32, rvq_state, speech_f32))
    tokens_f32 = np.asarray(out[1])

    # production path: bf16 convs + fused Pallas RVQ search
    rvq_mod.PALLAS_RVQ = True
    bf16_fn = make_fn()
    dt_bf16, out = _timeit(bf16_fn, (params_bf16, rvq_state, speech_bf16))
    tokens_bf16 = np.asarray(out[1])

    flip_all = float((tokens_f32 != tokens_bf16).mean())
    flip_q0 = float((tokens_f32[0] != tokens_bf16[0]).mean())

    # compiled cost analysis -> roofline utilization of the production path
    mfu = hbm = None
    try:
        an = (
            bf16_fn.lower(params_bf16, rvq_state, speech_bf16)
            .compile()
            .cost_analysis()
        )
        if isinstance(an, list):
            an = an[0]
        tflops = float(an.get("flops", 0.0)) / 1e12
        gbytes = float(an.get("bytes accessed", 0.0)) / 1e9
        mfu = 100.0 * (tflops / dt_bf16) / V5E_PEAK_TFLOPS
        hbm = 100.0 * (gbytes / dt_bf16) / V5E_PEAK_GBS
    except Exception:
        pass

    return {
        "bf16_audio_s_per_s": audio_secs / dt_bf16,
        "fp32_audio_s_per_s": audio_secs / dt_f32,
        "token_flip_rate_q0": flip_q0,
        "token_flip_rate_all": flip_all,
        "mfu_pct": mfu,
        "hbm_util_pct": hbm,
    }


def bench_train_tpu(batch=64, samples=40960):
    """Full GAN training step (both turns, EMA codebooks, all losses) with
    mixed-precision bf16 at a steady-state (all codebooks inited) point.

    Uses the production shared-forward step (generator encode->RVQ->decode
    computed once per step, stop_gradient'd fake into the disc turn) — the
    trainer/CLI default since round 3; measured 1.11x over the
    exact-reference two-forward step at this batch point. Also reports
    MFU / HBM utilization from XLA's compiled cost analysis (the GAN step is
    HBM-bound: AI ~18 FLOP/byte, see NOTES_ROUND3.md training roofline)."""
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _build_flagship
    from funcodec_tpu.train.step import (
        create_gan_train_state,
        make_gan_train_step,
        make_optimizer,
    )

    model, disc = _build_flagship(kmeans_init=True)
    params, rvq_state = model.init(jax.random.PRNGKey(0))
    rvq_state = rvq_state.replace(
        inited=jnp.ones_like(rvq_state.inited),
        embed=jnp.asarray(
            np.random.RandomState(2).randn(*rvq_state.embed.shape), jnp.float32
        ),
        cluster_size=jnp.ones_like(rvq_state.cluster_size),
    )
    disc_params = disc.init(jax.random.PRNGKey(1))
    opt_g = make_optimizer(lr=3e-4, betas=(0.5, 0.9))
    opt_d = make_optimizer(lr=3e-4, betas=(0.5, 0.9))
    step = jax.jit(
        make_gan_train_step(
            model, disc, opt_g, opt_d,
            compute_dtype=jnp.bfloat16, shared_forward=True,
        )
    )
    state = create_gan_train_state(params, disc_params, rvq_state, opt_g, opt_d)
    speech = jnp.asarray(
        np.random.RandomState(0).randn(batch, samples).astype(np.float32) * 0.1
    )
    rng = jax.random.PRNGKey(7)
    state, stats = step(state, {"speech": speech}, rng)
    float(stats["generator_loss"])  # warmup + fence
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        state, stats = step(state, {"speech": speech}, rng)
        float(stats["generator_loss"])
        best = min(best, time.perf_counter() - t0)
    mfu = hbm = None
    try:
        an = step.lower(state, {"speech": speech}, rng).compile().cost_analysis()
        if isinstance(an, list):
            an = an[0]
        tflops = float(an.get("flops", 0.0)) / 1e12
        gbytes = float(an.get("bytes accessed", 0.0)) / 1e9
        mfu = 100.0 * (tflops / best) / V5E_PEAK_TFLOPS
        hbm = 100.0 * (gbytes / best) / V5E_PEAK_GBS
    except Exception:
        pass
    return batch * samples / 16000 / best, mfu, hbm


def bench_torch_reference(batch=1, seconds=10, sr=16000, iters=2):
    """Reference encode+decode on host CPU (same topology, eval mode)."""
    sys.path.insert(0, "/root/reference")
    import torch

    from funcodec.models.encoder.seanet_encoder import SEANetEncoder
    from funcodec.models.decoder.seanet_decoder import SEANetDecoder
    from funcodec.modules.quantization.ddp_core_vq import (
        DistributedResidualVectorQuantization,
    )

    torch.set_num_threads(max(torch.get_num_threads(), 8))
    enc = SEANetEncoder(norm="time_group_norm", causal=False).eval()
    dec = SEANetDecoder(norm="time_group_norm", causal=False).eval()
    rvq = DistributedResidualVectorQuantization(
        num_quantizers=32, dim=128, codebook_size=1024, decay=0.99,
        kmeans_init=False, kmeans_iters=50, threshold_ema_dead_code=2,
        quantize_dropout=False, rand_num_quant=None,
    ).eval()

    x = torch.randn(batch, 1, seconds * sr) * 0.1
    with torch.no_grad():
        emb = enc(x)  # warmup
        codes = rvq.encode(emb.permute(0, 2, 1))
        quant = rvq.decode(codes)
        dec(quant.permute(0, 2, 1))
        t0 = time.perf_counter()
        for _ in range(iters):
            emb = enc(x)
            codes = rvq.encode(emb.permute(0, 2, 1))
            quant = rvq.decode(codes)
            y = dec(quant.permute(0, 2, 1))
        dt = (time.perf_counter() - t0) / iters
    return batch * seconds / dt


def main():
    tpu = bench_tpu()
    try:
        train_rate, train_mfu, train_hbm = bench_train_tpu()
    except Exception:
        train_rate = train_mfu = train_hbm = None
    try:
        baseline = bench_torch_reference()
    except Exception:
        baseline = None
    # The quality adjudication DECIDES the headline (VERDICT r2 item 1): the
    # bf16+Pallas number is claimed only if the measured worst-case quality
    # degradation vs the fp32 bit-exact path, across the n_q in {1..32}
    # bitrate sweep on trained weights, is perceptually negligible —
    # thresholds chosen to mirror the reference's <=0.05-ViSQOL-delta
    # acceptance contract (BASELINE.json): STOI drop <=0.01, SI-SNR drop
    # <=0.5 dB, LSD increase <=0.1 dB. Absent or failing artifact -> the
    # honest headline is the fp32 bit-exact path.
    # prefer the round-5 adjudication: measured on a from-scratch checkpoint
    # trained under the SHIPPED recipe default (kmeans init + effective
    # expiry, all 32k codes live) rather than round 4's sick-codebook run
    qa = (_artifact("quality_adjudication_r5.json")
          or _artifact("quality_adjudication_r4.json")
          or _artifact("quality_adjudication_r3.json"))
    bf16_ok = False
    if qa and "worst_degradation" in qa:
        w = qa["worst_degradation"]
        bf16_ok = (
            w.get("stoi", 1.0) <= 0.01
            and w.get("si_snr_db_drop", 99.0) <= 0.5
            and w.get("lsd_db", 99.0) <= 0.1
        )
    value = tpu["bf16_audio_s_per_s"] if bf16_ok else tpu["fp32_audio_s_per_s"]
    result = {
        "metric": "encode+decode audio-secs/sec/chip (EnCodec 16k nq32ds320)",
        "value": round(value, 2),
        "unit": "audio_s/s/chip",
        "vs_baseline": round(value / baseline, 2) if baseline else None,
        "headline_path": "bf16+pallas (quality-adjudicated neutral)"
        if bf16_ok else "fp32 bit-exact (bf16 not quality-adjudicated)",
        "bf16_audio_s_per_s": round(tpu["bf16_audio_s_per_s"], 2),
        "fp32_bitexact_audio_s_per_s": round(tpu["fp32_audio_s_per_s"], 2),
        "token_flip_rate_q0": round(tpu["token_flip_rate_q0"], 5),
        "token_flip_rate_all": round(tpu["token_flip_rate_all"], 5),
        "mfu_pct": round(tpu["mfu_pct"], 2) if tpu["mfu_pct"] else None,
        "hbm_util_pct": round(tpu["hbm_util_pct"], 2) if tpu["hbm_util_pct"] else None,
        "train_bf16_b64_audio_s_per_s": round(train_rate, 2) if train_rate else None,
        "train_mfu_pct": round(train_mfu, 2) if train_mfu else None,
        "train_hbm_util_pct": round(train_hbm, 2) if train_hbm else None,
        "baseline": {
            "what": "PyTorch reference (funcodec) encode+decode on host CPU",
            "audio_s_per_s": round(baseline, 2) if baseline else None,
        },
    }
    cli = _artifact("cli_serving_r4.json") or _artifact("cli_serving_r3.json")
    if cli:
        # measured end-to-end wav.scp -> tokens+wavs through cli/codec_inference
        # (tunnel-transport-bound on this 1-core host; real-host projection in
        # artifacts/cli_stages_r3.json — see NOTES_ROUND3.md)
        result["cli_e2e_bf16_audio_s_per_s"] = round(
            cli["encode_decode_bfloat16_b64_steady"], 1
        )
    if qa and "worst_degradation" in qa:
        result["bf16_quality_delta_worst"] = {
            k: round(v, 4) for k, v in qa["worst_degradation"].items()
        }
    # knee benchmarks for the other model-card families (VERDICT r3 item 4):
    # FreqCodec gr8/gr1 serving + Laura train/decode at their measured knees
    fc = _artifact("freqcodec_r4.json")
    if fc:
        for k in ("gr8_bf16_audio_s_per_s", "gr1_bf16_audio_s_per_s"):
            if fc.get(k) is not None:
                result[f"freqcodec_{k}"] = round(fc[k], 1)
    la = _artifact("laura_r4.json")
    if la:
        for k, v in la.items():
            if isinstance(v, (int, float)):
                result[f"laura_{k}"] = round(v, 2)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
