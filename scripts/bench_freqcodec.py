"""FreqCodec (mag_phase, 2D SEANet) serving throughput on real TPU.

The second released codec family (freqcodec_magphase 2D grouped convs,
gr8/gr1 variants). Times e2e encode+decode at FREQ_B x 10 s in bf16 +
fp32, plus the (DFT-matmul) ISTFT phase alone. B=256 crashes the axon
remote compile helper in the 2D conv stacks; FREQ_B defaults to 64.
Appends to /tmp/freqcodec_bench.log.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

LOG = "/tmp/freqcodec_bench.log"


from _benchlib import make_logger  # noqa: E402

log = make_logger(LOG)


from _benchlib import timeit  # noqa: E402


def freq_config(gr: int):
    return {
        "input_size": 3,
        "encoder": "encodec_seanet_encoder_2d",
        "encoder_conf": {
            "ratios": [[4, 1], [4, 1], [4, 2], [4, 1]],
            "norm": "time_group_norm", "causal": False, "dilation_base": 1,
            "conv_group_ratio": gr,
        },
        "quantizer": "costume_quantizer",
        "quantizer_conf": {
            "codebook_size": 1024, "num_quantizers": 32, "ema_decay": 0.99,
            "kmeans_init": False, "sampling_rate": 16000,
            "encoder_hop_length": 320, "use_ddp": True,
        },
        "decoder": "encodec_seanet_decoder_2d",
        "decoder_conf": {
            "ratios": [[4, 1], [4, 1], [4, 2], [4, 1]],
            "norm": "time_group_norm", "causal": False, "channels": 3,
            "dilation_base": 1, "conv_group_ratio": gr,
            "tr_conv_group_ratio": gr,
        },
        "model": "freq_codec",
        "model_conf": {
            "odim": 128,
            "target_sample_hz": 16000,
            "audio_normalize": True,
            "segment_dur": None, "overlap_ratio": None,
            "codec_domain": ["mag_phase", "mag_phase"],
        },
    }


def main():
    import jax
    import jax.numpy as jnp

    from funcodec_tpu.tasks.codec import build_codec_model

    B, SECONDS, SR = int(os.environ.get("FREQ_B", "64")), 10, 16000
    T = SECONDS * SR
    audio_secs = B * SECONDS
    log(f"devices: {jax.devices()}  B={B} T={T}")
    results = {}

    for gr in (8, 1):
        model, _ = build_codec_model(freq_config(gr))
        params_f32, rvq_state = model.init(jax.random.PRNGKey(0))
        n = sum(
            np.prod(x.shape)
            for x in jax.tree_util.tree_leaves(
                {"e": params_f32["encoder"], "d": params_f32["decoder"]}
            )
        )
        log(f"gr{gr}: enc+dec params {n/1e6:.2f}M")
        to_bf16 = lambda tree: jax.tree_util.tree_map(
            lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x,
            tree,
        )
        speech = jnp.asarray(
            np.random.RandomState(0).randn(B, T).astype(np.float32) * 0.1
        )

        for tag, p, sp in (
            ("fp32", params_f32, speech),
            ("bf16", to_bf16(params_f32), speech.astype(jnp.bfloat16)),
        ):

            @jax.jit
            def e2e(p, st, sp):
                out = model.inference(p, st, sp, need_recon=True)
                return (
                    jnp.sum(jnp.abs(out["recon_speech"].astype(jnp.float32))),
                    out["code_indices"][0],
                )

            try:
                dt = timeit(e2e, p, rvq_state, sp)
            except Exception as e:  # noqa: BLE001
                log(f"gr{gr} {tag}: FAILED {type(e).__name__}: {str(e)[:160]}")
                continue
            log(f"gr{gr} {tag}: {dt*1e3:.1f} ms -> {audio_secs/dt:.0f} audio_s/s")
            results[f"gr{gr}_{tag}_audio_s_per_s"] = audio_secs / dt

    # isolate the ISTFT (decode-side inverse transform; gr-independent)
    from funcodec_tpu.ops.stft import istft, stft

    speech = jnp.asarray(
        np.random.RandomState(0).randn(B, T).astype(np.float32) * 0.1
    )
    spec = stft(speech, 512, 160, win_length=512, center=True)

    @jax.jit
    def istft_only(spec):
        wav = istft(spec, 512, 160, win_length=512, center=True, length=T)
        return jnp.sum(jnp.abs(wav))

    dt = timeit(istft_only, spec)
    log(f"istft(512/160) alone: {dt*1e3:.1f} ms")
    results["istft_ms"] = dt * 1e3

    with open("/tmp/freqcodec_bench.json", "w") as f:
        json.dump(results, f, indent=2)
    log("DONE " + json.dumps(results))


if __name__ == "__main__":
    main()
