"""Encodec context loss (masked prediction + context LM) behavior."""

import numpy as np
import pytest
import yaml

import jax
import jax.numpy as jnp


def _config(ctx_conf):
    return {
        "input_size": 1,
        "encoder": "encodec_seanet_encoder",
        "encoder_conf": {"n_filters": 4, "ratios": [4, 2], "norm": "time_group_norm"},
        "quantizer_conf": {"codebook_size": 32, "num_quantizers": 4,
                           "kmeans_init": False, "encoder_hop_length": 8},
        "decoder": "encodec_seanet_decoder",
        "decoder_conf": {"n_filters": 4, "ratios": [4, 2], "norm": "time_group_norm"},
        "model": "encodec",
        "model_conf": {
            "odim": 16, "target_sample_hz": 16000,
            "multi_spectral_window_powers_of_two": [5, 6],
            "segment_dur": None, "overlap_ratio": None,
            "context_loss_weight": 1.0,
            "context_loss_conf": ctx_conf,
        },
    }


@pytest.mark.parametrize(
    "ctx_conf",
    [
        {"model": "transformer",
         "model_conf": {"attention_heads": 2, "linear_units": 32, "num_blocks": 1},
         "mask_conf": {"mask_ratio_range": [0.0, 0.2], "num_mask": 2},
         "ce_loss_weight": 1.0},
        {"model": "lstm", "model_conf": {"num_layers": 1},
         "mask_conf": {"mask_ratio_range": [0.0, 0.2], "num_mask": 2},
         "ce_loss_weight": 1.0, "mask_pred_weight": 0.7},
        {"model": "transformer",
         "model_conf": {"attention_heads": 2, "linear_units": 32, "num_blocks": 1},
         "mask_conf": {"mask_ratio_range": [0.0, 0.2], "num_mask": 2},
         "lm_loss_weight": 1.0},
    ],
    ids=["masked-pred", "lstm-weighted", "context-lm"],
)
def test_context_loss_variants(ctx_conf):
    from funcodec_tpu.models.discriminators import MultiScaleSTFTDiscriminator
    from funcodec_tpu.tasks.codec import build_codec_model

    model, _ = build_codec_model(_config(ctx_conf))
    assert model.context is not None
    params, rvq_state = model.init(jax.random.PRNGKey(0))
    assert "context" in params

    disc = MultiScaleSTFTDiscriminator(
        filters=4, n_ffts=(512,), hop_lengths=(128,), win_lengths=(512,)
    )
    dp = disc.init(jax.random.PRNGKey(1))
    speech = jnp.asarray(np.random.RandomState(0).randn(2, 2048).astype(np.float32) * 0.2)
    loss, out = model.forward_generator(
        params, dp, disc, rvq_state, speech, jax.random.PRNGKey(2)
    )
    assert np.isfinite(float(loss))
    assert float(out["stats"]["context_loss"]) > 0
    assert 0.0 <= float(out["stats"]["context_pred_acc"]) <= 1.0

    # gradient flows into the context model
    g = jax.grad(
        lambda p: model.forward_generator(
            p, dp, disc, rvq_state, speech, jax.random.PRNGKey(2)
        )[0]
    )(params)
    leaves = [float(jnp.abs(x).max()) for x in jax.tree_util.tree_leaves(g["context"])]
    assert max(leaves) > 0
