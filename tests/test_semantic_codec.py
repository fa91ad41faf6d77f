"""Semantic-augmented codec: all PPG usage modes run + train + infer."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from funcodec_tpu.models.discriminators import MultiScaleSTFTDiscriminator
from funcodec_tpu.models.quantizer import Quantizer, QuantizerConfig
from funcodec_tpu.models.seanet import SEANetConfig, SEANetDecoder, SEANetEncoder
from funcodec_tpu.models.semantic import CodecSemanticAug, SemanticCodecConfig


def _build(mode):
    seanet = SEANetConfig(n_filters=4, dimension=16, ratios=(4, 2), norm="time_group_norm")
    q = Quantizer(QuantizerConfig(
        input_size=16, codebook_size=32, num_quantizers=4, ema_decay=0.9,
        kmeans_init=False, sampling_rate=16000, encoder_hop_length=8,
    ))
    cfg = SemanticCodecConfig(
        odim=16, multi_spectral_window_powers_of_two=(5, 6),
        use_power_spec_loss=True, ppg_dim=12, ppg_ds_rate=2,
        ppg_usage_mod=mode,
    )
    model = CodecSemanticAug(cfg, SEANetEncoder(seanet), q, SEANetDecoder(seanet))
    params, rvq_state = model.init(jax.random.PRNGKey(0))
    return model, params, rvq_state


@pytest.mark.parametrize("mode", ["residual", "addition", "concat", "supervision", "ptts"])
def test_semantic_modes_train_and_infer(mode):
    model, params, rvq_state = _build(mode)
    disc = MultiScaleSTFTDiscriminator(
        filters=4, n_ffts=(512,), hop_lengths=(128,), win_lengths=(512,)
    )
    dp = disc.init(jax.random.PRNGKey(1))

    B, T = 2, 2048
    speech = jnp.asarray(np.random.RandomState(0).randn(B, T).astype(np.float32) * 0.2)
    # ppg frames at frame_shift=... use T//4 frames of ids
    ppg = jnp.asarray(np.random.RandomState(1).randint(0, 12, (B, T // 4)))

    loss, out = model.forward_generator_ppg(
        params, dp, disc, rvq_state, speech, ppg, jax.random.PRNGKey(2)
    )
    assert np.isfinite(float(loss))
    for k, v in out["stats"].items():
        assert np.isfinite(float(v)), k
    if mode == "supervision":
        assert float(out["stats"]["ppg_supervision_loss"]) > 0

    res = model.inference_ppg(params, out["rvq_state"], speech, ppg)
    assert res["recon_speech"].shape == (B, T)
    assert np.isfinite(np.asarray(res["recon_speech"])).all()

    # gradients flow into the ppg conditioning params
    g = jax.grad(
        lambda p: model.forward_generator_ppg(
            p, dp, disc, rvq_state, speech, ppg, jax.random.PRNGKey(2)
        )[0]
    )(params)
    emb_g = float(jnp.abs(g["ppg_embedding"]).max())
    if mode in ("residual", "addition", "concat", "ptts"):
        assert emb_g > 0, mode
    if mode == "ptts":
        assert float(jnp.abs(g["utt_level_proj"]["kernel"]).max()) > 0


def test_semantic_builds_from_config():
    from funcodec_tpu.tasks.codec import build_codec_model

    config = {
        "input_size": 1,
        "encoder": "encodec_seanet_encoder",
        "encoder_conf": {"n_filters": 4, "ratios": [4, 2], "norm": "time_group_norm"},
        "quantizer_conf": {"codebook_size": 32, "num_quantizers": 4,
                           "kmeans_init": False, "encoder_hop_length": 8},
        "decoder": "encodec_seanet_decoder",
        "decoder_conf": {"n_filters": 4, "ratios": [4, 2], "norm": "time_group_norm"},
        "model": "codec_semantic_aug",
        "model_conf": {
            "odim": 16, "target_sample_hz": 16000,
            "ppg_conf": {"ppg_dim": 12, "ppg_ds_rate": 2, "ppg_usage_mod": "residual"},
        },
    }
    model, _ = build_codec_model(config)
    params, rvq_state = model.init(jax.random.PRNGKey(0))
    assert "ppg_embedding" in params
    assert params["ppg_embedding"].shape == (12, 16)
