"""Every shipped FunCodec codec config must build through our task layer.

This is the config.yaml round-trip contract (abs_task.py:1896-1947): the yaml
that ships with a released checkpoint reconstructs the model.
"""

import glob

import numpy as np
import pytest
import yaml

import jax
import jax.numpy as jnp

from funcodec_tpu.tasks.codec import build_codec_model

CONFIGS = sorted(glob.glob("/root/reference/egs/LibriTTS/codec/conf/*.yaml"))
SUPPORTED = CONFIGS


@pytest.mark.parametrize("path", SUPPORTED, ids=lambda p: p.split("/")[-1])
def test_build_from_shipped_config(path):
    with open(path) as f:
        config = yaml.safe_load(f)
    model, disc = build_codec_model(config)
    # param shapes must materialize
    params, rvq_state = model.init(jax.random.PRNGKey(0))
    n_params = sum(
        int(np.prod(x.shape)) for x in jax.tree_util.tree_leaves(params)
    )
    assert n_params > 0
    assert rvq_state.embed.shape == (
        config["quantizer_conf"]["num_quantizers"],
        config["quantizer_conf"]["codebook_size"],
        config["model_conf"]["odim"],
    )
    # hop length must match the quantizer's encoder_hop_length
    # (2D encoders count spectrogram frames: waveform hop = stft_hop * prod)
    if config["encoder"] == "encodec_seanet_encoder":
        assert model.encoder.hop_length == config["quantizer_conf"]["encoder_hop_length"]
    else:
        stft_hop = 160
        assert model.encoder.hop_length * stft_hop == config["quantizer_conf"]["encoder_hop_length"]


def test_encodec_param_count_matches_model_card():
    """EnCodec nq32ds320 generator ~14.85M params (README models table)."""
    with open("/root/reference/egs/LibriTTS/codec/conf/encodec_16k_n32_600k_step.yaml") as f:
        config = yaml.safe_load(f)
    model, _ = build_codec_model(config)
    params, rvq_state = model.init(jax.random.PRNGKey(0))
    # model card counts trainable params only (codebooks are buffers)
    n = sum(int(np.prod(x.shape)) for x in jax.tree_util.tree_leaves(params))
    assert abs(n - 14_850_000) / 14_850_000 < 0.02, n


def test_encodec_ds640_param_count():
    """EnCodec nq32ds640 generator ~57.83M params (README models table)."""
    with open(
        "/root/reference/egs/LibriTTS/codec/conf/encodec_16k_n32_600k_step_ds640.yaml"
    ) as f:
        config = yaml.safe_load(f)
    model, _ = build_codec_model(config)
    params, rvq_state = model.init(jax.random.PRNGKey(0))
    n = sum(int(np.prod(x.shape)) for x in jax.tree_util.tree_leaves(params))
    assert abs(n - 57_830_000) / 57_830_000 < 0.02, n
