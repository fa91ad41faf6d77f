"""Transformer/Conformer encoder parity vs the ESPnet-style torch reference."""

import numpy as np
import pytest

import jax.numpy as jnp

from funcodec_tpu.models.transformer import (
    KVCache,
    TransformerConfig,
    apply_embed,
    apply_encoder,
    apply_encoder_step,
    causal_mask,
    import_encoder,
    init_kv_cache,
)


def _np(t):
    return t.detach().numpy()


def test_transformer_s0_parity(torch):
    """TransformerEncoder_s0 with abs pos + 'linear' (ReLU) input layer."""
    from funcodec.models.encoder.transformer_encoder import TransformerEncoder_s0
    from funcodec.modules.embedding import PositionalEncoding

    ref = TransformerEncoder_s0(
        idim=24, attention_dim=32, attention_heads=4, linear_units=64,
        num_blocks=2, dropout_rate=0.0, positional_dropout_rate=0.0,
        attention_dropout_rate=0.0, input_layer="linear",
        pos_enc_class=PositionalEncoding, selfattention_layer_type="selfattn",
    ).eval()
    cfg = TransformerConfig(
        input_size=24, attention_dim=32, attention_heads=4, linear_units=64,
        num_blocks=2, input_layer="linear_relu", pos_enc_type="abs_pos",
    )
    params = import_encoder(ref.state_dict(), "", cfg)

    x = torch.randn(2, 9, 24)
    lengths = torch.tensor([9, 7])
    from funcodec.modules.nets_utils import make_pad_mask, subsequent_mask

    ys_mask = ~make_pad_mask(lengths)
    m = subsequent_mask(9).unsqueeze(0)
    mask = ys_mask.unsqueeze(-2) & m
    with torch.no_grad():
        y_ref, _ = ref(x, mask)

    mask_j = causal_mask(jnp.asarray(lengths.numpy()), 9)
    y = apply_encoder(cfg, params, jnp.asarray(x.numpy()), mask_j)
    np.testing.assert_allclose(np.asarray(y), _np(y_ref), atol=2e-5, rtol=1e-4)


def test_transformer_s0_relpos_parity(torch):
    """rel_pos + rel_selfattn (the shipped Laura LM configuration)."""
    from funcodec.models.encoder.transformer_encoder import TransformerEncoder_s0
    from funcodec.modules.embedding import RelPositionalEncoding

    ref = TransformerEncoder_s0(
        idim=24, attention_dim=32, attention_heads=4, linear_units=64,
        num_blocks=2, dropout_rate=0.0, positional_dropout_rate=0.0,
        attention_dropout_rate=0.0, input_layer="linear",
        pos_enc_class=RelPositionalEncoding,
        selfattention_layer_type="rel_selfattn",
    ).eval()
    cfg = TransformerConfig(
        input_size=24, attention_dim=32, attention_heads=4, linear_units=64,
        num_blocks=2, input_layer="linear_relu", pos_enc_type="rel_pos",
    )
    params = import_encoder(ref.state_dict(), "", cfg)

    x = torch.randn(2, 11, 24)
    lengths = torch.tensor([11, 8])
    from funcodec.modules.nets_utils import make_pad_mask, subsequent_mask

    mask = (~make_pad_mask(lengths)).unsqueeze(-2) & subsequent_mask(11).unsqueeze(0)
    with torch.no_grad():
        y_ref, _ = ref(x, mask)
    mask_j = causal_mask(jnp.asarray(lengths.numpy()), 11)
    y = apply_encoder(cfg, params, jnp.asarray(x.numpy()), mask_j)
    np.testing.assert_allclose(np.asarray(y), _np(y_ref), atol=2e-5, rtol=1e-4)


def test_conformer_parity(torch):
    """ConformerEncoder as shipped for Laura (rel_pos, no macaron, no cnn)."""
    from funcodec.models.encoder.conformer_encoder import ConformerEncoder

    ref = ConformerEncoder(
        input_size=24, output_size=32, attention_heads=4, linear_units=64,
        num_blocks=2, dropout_rate=0.0, positional_dropout_rate=0.0,
        attention_dropout_rate=0.0, input_layer="linear", normalize_before=True,
        rel_pos_type="latest", pos_enc_layer_type="rel_pos",
        selfattention_layer_type="rel_selfattn", use_cnn_module=False,
    ).eval()
    cfg = TransformerConfig(
        input_size=24, attention_dim=32, attention_heads=4, linear_units=64,
        num_blocks=2, input_layer="linear", pos_enc_type="rel_pos",
        activation="swish",
    )
    params = import_encoder(ref.state_dict(), "", cfg)

    x = torch.randn(2, 10, 24)
    lengths = torch.tensor([10, 6])
    with torch.no_grad():
        y_ref, olens, _ = ref(x, lengths)

    from funcodec_tpu.models.transformer import make_pad_mask_bool

    mask_j = make_pad_mask_bool(jnp.asarray(lengths.numpy()), 10)[:, None, :]
    y = apply_encoder(cfg, params, jnp.asarray(x.numpy()), mask_j)
    # compare only valid positions
    y_np, ref_np = np.asarray(y), _np(y_ref)
    for b, L in enumerate([10, 6]):
        np.testing.assert_allclose(
            y_np[b, :L], ref_np[b, :L], atol=3e-5, rtol=1e-4
        )


def test_conformer_full_features_parity(torch):
    """Conformer with macaron + cnn module (completeness path)."""
    from funcodec.models.encoder.conformer_encoder import ConformerEncoder

    ref = ConformerEncoder(
        input_size=24, output_size=32, attention_heads=4, linear_units=64,
        num_blocks=2, dropout_rate=0.0, positional_dropout_rate=0.0,
        attention_dropout_rate=0.0, input_layer="linear", normalize_before=True,
        rel_pos_type="latest", pos_enc_layer_type="rel_pos",
        selfattention_layer_type="rel_selfattn", use_cnn_module=True,
        macaron_style=True, cnn_module_kernel=7,
    ).eval()
    cfg = TransformerConfig(
        input_size=24, attention_dim=32, attention_heads=4, linear_units=64,
        num_blocks=2, input_layer="linear", pos_enc_type="rel_pos",
        activation="swish", macaron_style=True, use_cnn_module=True,
        cnn_module_kernel=7,
    )
    params = import_encoder(ref.state_dict(), "", cfg)
    x = torch.randn(2, 10, 24)
    lengths = torch.tensor([10, 10])
    with torch.no_grad():
        y_ref, _, _ = ref(x, lengths)
    from funcodec_tpu.models.transformer import make_pad_mask_bool

    mask_j = make_pad_mask_bool(jnp.asarray(lengths.numpy()), 10)[:, None, :]
    y = apply_encoder(cfg, params, jnp.asarray(x.numpy()), mask_j)
    np.testing.assert_allclose(np.asarray(y), _np(y_ref), atol=3e-5, rtol=1e-4)


@pytest.mark.parametrize("pos_enc_type", ["abs_pos", "rel_pos"])
def test_kv_cache_matches_full_forward(pos_enc_type):
    """Incremental decode with KV cache == full causal forward."""
    import jax

    cfg = TransformerConfig(
        input_size=16, attention_dim=16, attention_heads=2, linear_units=32,
        num_blocks=2, input_layer="none", pos_enc_type=pos_enc_type,
    )
    from funcodec_tpu.models.transformer import init_encoder

    params = init_encoder(jax.random.PRNGKey(0), cfg)
    T, B, D = 7, 2, 16
    x = jax.random.normal(jax.random.PRNGKey(1), (B, T, D))

    lengths = jnp.asarray([T, T])
    full = apply_encoder(
        cfg, params, x, causal_mask(lengths, T)
    )

    # incremental: feed one position at a time through the cache path
    x_scaled, _ = apply_embed(cfg, params, x)
    cache = init_kv_cache(cfg, B, max_len=T)
    outs = []
    for t in range(T):
        y, cache = apply_encoder_step(cfg, params, cache, x_scaled[:, t : t + 1])
        outs.append(y)
    inc = jnp.concatenate(outs, axis=1)
    np.testing.assert_allclose(np.asarray(inc), np.asarray(full), atol=2e-5, rtol=1e-4)
