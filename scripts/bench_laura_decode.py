"""Measure Laura AR decode throughput on TPU: B=1 vs batched B=8/16.

Builds the shipped LauraTTS topology (conf/text2audio_codec_lm_nq2_uni_rel_pos
.yaml: 512-dim 12-layer rel-pos codec LM + 6-layer conformer text encoder,
~84M params), random init, and times decode_codec vs decode_codec_batch at a
fixed generation length (greedy never hits eos on random weights, so every
run generates exactly max_length groups).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

LOG = "/tmp/laura_decode.log"


def log(msg):
    line = f"[{time.strftime('%H:%M:%S')}] {msg}"
    print(line, flush=True)
    with open(LOG, "a") as f:
        f.write(line + "\n")


CONFIG = {
    "input_size": 512,  # precomputed text embeddings (T5-style path)
    "audio_max_duration": 30,
    "codec_token_rate": 25,
    "text_encoder": "conformer",
    "text_encoder_conf": {
        "output_size": 512, "attention_heads": 8, "linear_units": 2048,
        "num_blocks": 6, "dropout_rate": 0.0, "positional_dropout_rate": 0.0,
        "attention_dropout_rate": 0.0, "input_layer": "linear",
        "normalize_before": True, "rel_pos_type": "latest",
        "pos_enc_layer_type": "rel_pos", "selfattention_layer_type": "rel_selfattn",
        "use_cnn_module": False,
    },
    "codec_encoder": "conformer",
    "codec_encoder_conf": {
        "output_size": 512, "attention_heads": 8, "linear_units": 2048,
        "num_blocks": 6, "dropout_rate": 0.0, "input_layer": "linear",
        "use_cnn_module": False, "pos_enc_layer_type": "rel_pos",
        "selfattention_layer_type": "rel_selfattn",
    },
    "model": "laura_gen_model",
    "model_conf": {
        "codec_sampling_ratio": 0.0, "lsm_weight": 0.0,
        "length_normalized_loss": True, "predict_nq": 2,
        "codec_conf": {"num_quantizers": 32, "codebook_size": 1024, "codebook_dim": 128},
        "codec_lm_conf": {
            "name": "transformer", "pos_enc": "rel_pos",
            "selfattention_layer_type": "rel_selfattn",
            "embed_unit": 128, "att_unit": 512, "head": 8, "unit": 2048,
            "layer": 12, "dropout_rate": 0.0, "pe_type": "uni",
            "bidirectional_inputs": True, "codec_groups": 1,
        },
    },
}


def main():
    import jax
    import jax.numpy as jnp

    from funcodec_tpu.tasks.text2audio import build_laura_model

    model = build_laura_model(CONFIG)
    params = model.init(jax.random.PRNGKey(0))
    n_params = sum(np.prod(x.shape) for x in jax.tree_util.tree_leaves(params))
    log(f"params: {n_params/1e6:.2f}M  devices: {jax.devices()}")

    GEN = 250  # groups to generate (10 s of 25 Hz tokens)
    Lt = 40
    rng = np.random.RandomState(0)
    results = {}

    # B=1 baseline (existing decode_codec path)
    text = jnp.asarray(rng.randn(1, Lt, 512).astype(np.float32))
    tl = jnp.asarray([Lt])
    t0 = time.perf_counter()
    toks = model.decode_codec(params, text, tl, max_length=GEN, sampling=False)
    warm = time.perf_counter() - t0
    t0 = time.perf_counter()
    toks = model.decode_codec(params, text, tl, max_length=GEN, sampling=False)
    dt1 = time.perf_counter() - t0
    n1 = toks.shape[1]
    log(f"B=1: {n1} groups in {dt1:.2f}s (warmup {warm:.1f}s) -> "
        f"{n1/dt1:.1f} groups/s, {1e3*dt1/max(n1,1):.1f} ms/group")
    results["b1_groups_per_s"] = n1 / dt1

    # production dtype: bf16 params (sampling-mode TTS tolerates near-tie flips)
    params_bf16 = jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x, params
    )
    t0 = time.perf_counter()
    toks = model.decode_codec(params_bf16, text.astype(jnp.bfloat16), tl,
                              max_length=GEN, sampling=False)
    warm = time.perf_counter() - t0
    t0 = time.perf_counter()
    toks = model.decode_codec(params_bf16, text.astype(jnp.bfloat16), tl,
                              max_length=GEN, sampling=False)
    dt1b = time.perf_counter() - t0
    n1b = toks.shape[1]
    log(f"B=1 bf16: {n1b} groups in {dt1b:.2f}s -> {n1b/dt1b:.1f} groups/s, "
        f"{1e3*dt1b/max(n1b,1):.1f} ms/group")
    results["b1_bf16_groups_per_s"] = n1b / dt1b

    for B in (8, 16):
        texts = jnp.asarray(rng.randn(B, Lt, 512).astype(np.float32))
        tls = jnp.asarray([Lt] * B)
        t0 = time.perf_counter()
        rows = model.decode_codec_batch(
            params, texts, tls, max_length=GEN, sampling=False
        )
        warm = time.perf_counter() - t0
        t0 = time.perf_counter()
        rows = model.decode_codec_batch(
            params, texts, tls, max_length=GEN, sampling=False
        )
        dt = time.perf_counter() - t0
        n = sum(r.shape[0] for r in rows)
        log(f"B={B}: {n} groups in {dt:.2f}s (warmup {warm:.1f}s) -> "
            f"{n/dt:.1f} groups/s ({n/dt/25:.1f}x realtime audio)")
        results[f"b{B}_groups_per_s"] = n / dt

        model.decode_codec_batch(  # warm/compile
            params_bf16, texts.astype(jnp.bfloat16), tls,
            max_length=GEN, sampling=False,
        )
        t0 = time.perf_counter()
        rows = model.decode_codec_batch(
            params_bf16, texts.astype(jnp.bfloat16), tls,
            max_length=GEN, sampling=False,
        )
        dt = time.perf_counter() - t0
        n = sum(r.shape[0] for r in rows)
        log(f"B={B} bf16: {n} groups in {dt:.2f}s -> {n/dt:.1f} groups/s "
            f"({n/dt/25:.1f}x realtime audio)")
        results[f"b{B}_bf16_groups_per_s"] = n / dt

    with open("/tmp/laura_decode.json", "w") as f:
        json.dump(results, f, indent=2)
    log("DONE " + json.dumps(results))


if __name__ == "__main__":
    main()
