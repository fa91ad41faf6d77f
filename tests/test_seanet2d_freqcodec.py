"""2D SEANet parity vs the torch reference + FreqCodec end-to-end behavior."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import yaml

from funcodec_tpu.compat.torch_import import import_seanet_layers
from funcodec_tpu.models.seanet2d import (
    SEANetConfig2d,
    SEANetDecoder2d,
    SEANetEncoder2d,
)


@pytest.mark.parametrize("conv_group_ratio", [-1, 2])
def test_seanet_encoder2d_parity(torch, conv_group_ratio):
    from funcodec.models.encoder.seanet_encoder import SEANetEncoder2d as RefEnc

    kw = dict(
        input_size=3, dimension=32, n_filters=8,
        ratios=[(4, 1), (4, 2)], norm="time_group_norm",
        dilation_base=1, conv_group_ratio=conv_group_ratio,
    )
    ref = RefEnc(**kw).eval()
    cfg = SEANetConfig2d(
        input_size=3, dimension=32, n_filters=8,
        ratios=((4, 1), (4, 2)), norm="time_group_norm",
        dilation_base=1, conv_group_ratio=conv_group_ratio,
    )
    enc = SEANetEncoder2d(cfg)
    sd = {f"encoder.{k}": v for k, v in ref.state_dict().items()}
    params = import_seanet_layers(sd, "encoder", enc.layers)

    x = torch.randn(2, 3, 16, 20)  # (B, C, F, T)
    with torch.no_grad():
        y_ref = ref(x).numpy()  # (B, T', dimension)
    x_j = jnp.asarray(x.numpy().transpose(0, 2, 3, 1))  # (B, F, T, C)
    y = np.asarray(enc(params, x_j))
    assert y.shape == y_ref.shape
    np.testing.assert_allclose(y, y_ref, atol=5e-4, rtol=1e-4)


def test_seanet_decoder2d_parity(torch):
    from funcodec.models.decoder.seanet_decoder import SEANetDecoder2d as RefDec

    ref = RefDec(
        input_size=32, channels=3, n_filters=8,
        ratios=[(4, 1), (4, 2)], norm="time_group_norm", dilation_base=1,
        last_out_padding=[(0, 1), (0, 0)],
    ).eval()
    cfg = SEANetConfig2d(
        input_size=3, dimension=32, n_filters=8,
        ratios=((4, 1), (4, 2)), norm="time_group_norm", dilation_base=1,
        last_out_padding=((0, 1), (0, 0)),
    )
    dec = SEANetDecoder2d(cfg)
    sd = {f"decoder.{k}": v for k, v in ref.state_dict().items()}
    params = import_seanet_layers(sd, "decoder", dec.layers)

    z = torch.randn(2, 10, 32)  # (B, T', D)
    with torch.no_grad():
        y_ref = ref(z).numpy()  # (B, C, F, T)
    y = np.asarray(dec(params, jnp.asarray(z.numpy())))  # (B, F, T, C)
    assert y.transpose(0, 3, 1, 2).shape == y_ref.shape
    np.testing.assert_allclose(y.transpose(0, 3, 1, 2), y_ref, atol=5e-4, rtol=1e-4)


@pytest.fixture(scope="module")
def freq_model():
    """FreqCodec mag_phase built through the task config path (shipped yaml
    topology, shrunk for CPU)."""
    from funcodec_tpu.tasks.codec import build_codec_model

    config = yaml.safe_load(
        """
input_size: 3
encoder: encodec_seanet_encoder_2d
encoder_conf:
    n_filters: 4
    ratios: [[4, 1], [4, 1], [4, 2], [4, 1]]
    norm: time_group_norm
    causal: false
    dilation_base: 1
quantizer: costume_quantizer
quantizer_conf:
    codebook_size: 64
    num_quantizers: 4
    ema_decay: 0.99
    kmeans_init: false
    sampling_rate: 16000
    encoder_hop_length: 320
decoder: encodec_seanet_decoder_2d
decoder_conf:
    n_filters: 4
    ratios: [[4, 1], [4, 1], [4, 2], [4, 1]]
    norm: time_group_norm
    causal: false
    channels: 3
    dilation_base: 1
model: freq_codec
model_conf:
    odim: 32
    target_sample_hz: 16000
    audio_normalize: true
    segment_dur: null
    overlap_ratio: null
    codec_domain: [mag_phase, mag_phase]
"""
    )
    model, disc = build_codec_model(config)
    params, rvq_state = model.init(jax.random.PRNGKey(0))
    return model, params, rvq_state


def test_freqcodec_inference_roundtrip(freq_model):
    model, params, rvq_state = freq_model
    t = 3200  # 0.2 s
    speech = jnp.asarray(
        (0.3 * np.sin(2 * np.pi * 300 * np.arange(t) / 16000)).astype(np.float32)
    )[None]
    out = model.inference(params, rvq_state, speech)
    tokens = out["code_indices"][0]
    # 512-fft/160-hop spectrogram with center=True has T/160+1 frames,
    # time-downsampled 2x by the encoder
    assert tokens.shape[0] == 4 and tokens.shape[1] == 1
    assert out["recon_speech"].shape == (1, t)
    assert np.isfinite(np.asarray(out["recon_speech"])).all()

    # decode-from-tokens path agrees with the quantized-embedding path
    tok_btq = jnp.transpose(tokens, (1, 2, 0))
    dec = model.inference_decoding(params, rvq_state, tok_btq)
    assert np.isfinite(np.asarray(dec["recon_speech"])).all()


def test_freqcodec_train_forward(freq_model):
    model, params, rvq_state = freq_model
    from funcodec_tpu.models.discriminators import MultiScaleSTFTDiscriminator

    disc = MultiScaleSTFTDiscriminator(
        filters=4, n_ffts=(512,), hop_lengths=(128,), win_lengths=(512,)
    )
    dp = disc.init(jax.random.PRNGKey(1))

    speech = jnp.asarray(
        np.random.RandomState(0).randn(2, 3200).astype(np.float32) * 0.2
    )
    loss, out = model.forward_generator(
        params, dp, disc, rvq_state, speech, jax.random.PRNGKey(2)
    )
    assert np.isfinite(float(loss))
    for k, v in out["stats"].items():
        assert np.isfinite(float(v)), k
    # gradients flow to the encoder params
    g = jax.grad(
        lambda p: model.forward_generator(
            p, dp, disc, rvq_state, speech, jax.random.PRNGKey(2)
        )[0]
    )(params)
    leaves = [float(jnp.abs(x).max()) for x in jax.tree_util.tree_leaves(g["encoder"])]
    assert max(leaves) > 0


def test_seanet_encoder2d_transformer_seq_model(torch):
    """2D stack with seq_model='transformer' (seanet_encoder.py:330-337):
    the bottleneck transformer runs after the freq squeeze, like 1D."""
    from funcodec.models.encoder.seanet_encoder import SEANetEncoder2d as RefEnc

    ref = RefEnc(
        input_size=3, dimension=32, n_filters=8,
        ratios=[(4, 1), (4, 2)], norm="time_group_norm",
        dilation_base=1, seq_model="transformer", seq_layer_num=2,
    ).eval()
    cfg = SEANetConfig2d(
        input_size=3, dimension=32, n_filters=8,
        ratios=((4, 1), (4, 2)), norm="time_group_norm",
        dilation_base=1, seq_model="transformer", seq_layer_num=2,
    )
    enc = SEANetEncoder2d(cfg)
    sd = {f"encoder.{k}": v for k, v in ref.state_dict().items()}
    params = import_seanet_layers(sd, "encoder", enc.layers)

    x = torch.randn(2, 3, 16, 20)
    with torch.no_grad():
        y_ref = ref(x).numpy()
    y = np.asarray(enc(params, jnp.asarray(x.numpy().transpose(0, 2, 3, 1))))
    assert y.shape == y_ref.shape
    np.testing.assert_allclose(y, y_ref, atol=5e-4, rtol=1e-3)


def test_seanet_decoder2d_transformer_seq_model(torch):
    """2D decoder with seq_model='transformer' (seanet_decoder.py:300-307)."""
    from funcodec.models.decoder.seanet_decoder import SEANetDecoder2d as RefDec

    ref = RefDec(
        input_size=32, channels=3, n_filters=8,
        ratios=[(4, 1), (4, 2)], norm="time_group_norm", dilation_base=1,
        last_out_padding=[(0, 1), (0, 0)],
        seq_model="transformer", seq_layer_num=2,
    ).eval()
    cfg = SEANetConfig2d(
        input_size=3, dimension=32, n_filters=8,
        ratios=((4, 1), (4, 2)), norm="time_group_norm", dilation_base=1,
        last_out_padding=((0, 1), (0, 0)),
        seq_model="transformer", seq_layer_num=2,
    )
    dec = SEANetDecoder2d(cfg)
    sd = {f"decoder.{k}": v for k, v in ref.state_dict().items()}
    params = import_seanet_layers(sd, "decoder", dec.layers)

    z = torch.randn(2, 10, 32)
    with torch.no_grad():
        y_ref = ref(z).numpy()  # (B, C, F, T)
    y = np.asarray(dec(params, jnp.asarray(z.numpy())))  # (B, F, T, C)
    np.testing.assert_allclose(y.transpose(0, 3, 1, 2), y_ref, atol=5e-4, rtol=1e-3)
