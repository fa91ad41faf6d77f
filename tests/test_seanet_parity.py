"""Full SEANet encoder/decoder parity vs the PyTorch reference."""

import numpy as np
import pytest

import jax.numpy as jnp

from funcodec_tpu.compat.torch_import import import_lstm, import_seanet_layers
from funcodec_tpu.models.seanet import SEANetConfig, SEANetDecoder, SEANetEncoder
from funcodec_tpu.ops.rnn import apply_slstm


def test_slstm_parity(torch):
    from funcodec.modules.normed_modules.lstm import SLSTM

    dim = 32
    m = SLSTM(dim, num_layers=2, skip=True).eval()
    sd = {f"l.{k}": v for k, v in m.state_dict().items()}
    params = import_lstm(sd, "l.lstm", 2)

    x = torch.randn(3, dim, 20)  # (B, C, T)
    with torch.no_grad():
        y_ref = m(x).numpy()
    x_j = jnp.asarray(x.numpy().transpose(0, 2, 1))
    y = np.asarray(apply_slstm(params, x_j, skip=True)).transpose(0, 2, 1)
    np.testing.assert_allclose(y, y_ref, atol=3e-5, rtol=1e-4)


@pytest.mark.parametrize(
    "norm,causal",
    [("time_group_norm", False), ("weight_norm", True)],
)
def test_seanet_encoder_parity(torch, norm, causal):
    from funcodec.models.encoder.seanet_encoder import SEANetEncoder as RefEnc

    ref = RefEnc(norm=norm, causal=causal).eval()
    cfg = SEANetConfig(norm=norm, causal=causal)
    enc = SEANetEncoder(cfg)
    sd = {f"encoder.{k}": v for k, v in ref.state_dict().items()}
    params = import_seanet_layers(sd, "encoder", enc.layers)

    x = torch.randn(2, 1, 3210)
    with torch.no_grad():
        y_ref = ref(x).numpy()  # (B, T', C)
    y = np.asarray(enc(params, jnp.asarray(x.numpy()[:, 0, :])))
    assert y.shape == y_ref.shape
    np.testing.assert_allclose(y, y_ref, atol=5e-4, rtol=1e-4)


@pytest.mark.parametrize(
    "norm,causal",
    [("time_group_norm", False), ("weight_norm", True)],
)
def test_seanet_decoder_parity(torch, norm, causal):
    from funcodec.models.decoder.seanet_decoder import SEANetDecoder as RefDec

    ref = RefDec(norm=norm, causal=causal).eval()
    cfg = SEANetConfig(norm=norm, causal=causal)
    dec = SEANetDecoder(cfg)
    sd = {f"decoder.{k}": v for k, v in ref.state_dict().items()}
    params = import_seanet_layers(sd, "decoder", dec.layers)

    z = torch.randn(2, 11, 128)  # (B, T', C)
    with torch.no_grad():
        y_ref = ref(z).numpy()  # (B, 1, T)
    y = np.asarray(dec(params, jnp.asarray(z.numpy())))
    assert y.transpose(0, 2, 1).shape == y_ref.shape
    np.testing.assert_allclose(y.transpose(0, 2, 1), y_ref, atol=5e-4, rtol=1e-4)


def test_encoder_hop_alignment():
    """T' = ceil(T / hop) for arbitrary input lengths (streamable padding)."""
    cfg = SEANetConfig(norm="weight_norm", causal=True)
    enc = SEANetEncoder(cfg)
    import jax

    params = enc.init(jax.random.PRNGKey(0))
    for t in (320, 321, 639, 1000):
        y = enc(params, jnp.zeros((1, t)))
        assert y.shape[1] == -(-t // 320), (t, y.shape)


def test_seanet_encoder_transformer_seq_model(torch):
    """seq_model='transformer' bottleneck (normed_modules/transformer.py)."""
    from funcodec.models.encoder.seanet_encoder import SEANetEncoder as RefEnc

    ref = RefEnc(
        n_filters=4, dimension=16, ratios=[4, 2], norm="weight_norm",
        causal=True, seq_model="transformer", seq_layer_num=2,
    ).eval()
    cfg = SEANetConfig(
        n_filters=4, dimension=16, ratios=(4, 2), norm="weight_norm",
        causal=True, seq_model="transformer", seq_layer_num=2,
    )
    enc = SEANetEncoder(cfg)
    sd = {f"encoder.{k}": v for k, v in ref.state_dict().items()}
    from funcodec_tpu.compat.torch_import import import_seanet_layers

    params = import_seanet_layers(sd, "encoder", enc.layers)
    x = torch.randn(2, 1, 407)
    with torch.no_grad():
        y_ref = ref(x).numpy()
    y = np.asarray(enc(params, jnp.asarray(x.numpy()[:, 0, :])))
    assert y.shape == y_ref.shape
    np.testing.assert_allclose(y, y_ref, atol=5e-4, rtol=1e-3)
