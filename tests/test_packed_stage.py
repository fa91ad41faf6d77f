"""Packed narrow-stage execution parity (ops/packed.py, apply_layers_packed).

The packed view (B, T/f, f*C=128) must be numerically equivalent to the
normal path up to conv-accumulation-order tolerance, across strided
downsamples (packing-factor changes), tgn, snake, resblocks, and the full
encoder walk.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import funcodec_tpu.ops.conv as conv_ops
import funcodec_tpu.ops.resblock_pallas as rbp
from funcodec_tpu.ops.conv import ConvSpec, apply_sconv1d, init_conv
from funcodec_tpu.ops.packed import apply_sconv1d_packed, pack_factor


def _pack(x, f):
    B, T, C = x.shape
    return x.reshape(B, T // f, f * C)


def _unpack(yp, T, C):
    return yp.reshape(yp.shape[0], T, C)


@pytest.mark.parametrize(
    "Cin,Cout,k,s,d,causal,pad_mode",
    [
        (32, 64, 4, 2, 1, False, "reflect"),    # stage-1 downsample
        (64, 128, 8, 4, 1, False, "reflect"),   # stage-2 downsample
        (32, 16, 3, 1, 1, False, "reflect"),    # resblock conv1
        (16, 32, 1, 1, 1, False, "reflect"),    # resblock conv2
        (32, 32, 1, 1, 1, False, "reflect"),    # shortcut
        (32, 64, 4, 2, 1, True, "replicate"),   # causal variant
        (64, 64, 3, 1, 2, False, "reflect"),    # dilated
        (32, 64, 4, 2, 1, False, "zero"),       # zero pad
    ],
)
def test_packed_conv_parity(Cin, Cout, k, s, d, causal, pad_mode):
    spec = ConvSpec(Cin, Cout, k, stride=s, dilation=d, causal=causal,
                    norm="time_group_norm", pad_mode=pad_mode)
    params = init_conv(jax.random.PRNGKey(0), spec)
    T = 640
    x = jax.random.normal(jax.random.PRNGKey(1), (2, T, Cin), jnp.float32)
    ref = apply_sconv1d(spec, params, x)

    f_in = pack_factor(Cin)
    res = apply_sconv1d_packed(spec, params, _pack(x, f_in), T)
    assert res is not None, "unexpected packed-plan fallback"
    yp, T_out, f_out = res
    assert T_out == ref.shape[1]
    y = _unpack(yp, T_out, Cout)
    np.testing.assert_allclose(np.asarray(y), np.asarray(ref),
                               atol=3e-5, rtol=3e-5)


def test_packed_conv_falls_back_on_layer_norm():
    spec = ConvSpec(32, 64, 4, stride=2, norm="layer_norm")
    params = init_conv(jax.random.PRNGKey(0), spec)
    x = jnp.zeros((1, 128, 32))
    assert apply_sconv1d_packed(spec, params, _pack(x, 4), 128) is None


def _encoder_setup(norm="time_group_norm", seed=0, T=1280):
    from funcodec_tpu.models.seanet import (
        SEANetConfig, build_encoder_layers, init_layers,
    )

    cfg = SEANetConfig(n_filters=32, dimension=64, norm=norm,
                       ratios=(4, 2), causal=False)
    layers = build_encoder_layers(cfg)
    p = init_layers(jax.random.PRNGKey(seed), layers)
    x = jax.random.normal(jax.random.PRNGKey(seed + 1), (2, T, 1), jnp.float32)
    return layers, p, x


def test_encoder_packed_walk_xla():
    """Full encoder: packed walk (pure XLA packed convs) vs normal path."""
    from funcodec_tpu.models.seanet import apply_layers, apply_layers_packed

    layers, p, x = _encoder_setup()
    ref = apply_layers(layers, p, x)
    out = apply_layers_packed(layers, p, x)
    assert out.shape == ref.shape
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-4, rtol=1e-3)


def test_encoder_packed_walk_with_pallas(monkeypatch):
    """Packed walk dispatching resblocks to the fused Pallas kernel."""
    from funcodec_tpu.models.seanet import apply_layers, apply_layers_packed

    layers, p, x = _encoder_setup()
    ref = apply_layers(layers, p, x)
    monkeypatch.setattr(conv_ops, "PALLAS_RESBLOCK", True)
    monkeypatch.setattr(rbp, "INTERPRET", True)
    out = apply_layers_packed(layers, p, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=5e-4, rtol=2e-3)


def test_encoder_flag_dispatch(monkeypatch):
    """SEANetEncoder.__call__ honors PACKED_NARROW."""
    from funcodec_tpu.models.seanet import SEANetConfig, SEANetEncoder

    cfg = SEANetConfig(n_filters=32, dimension=64, norm="time_group_norm",
                       ratios=(4, 2))
    enc = SEANetEncoder(cfg)
    params = enc.init(jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 1280), jnp.float32)
    ref = enc(params, x)
    monkeypatch.setattr(conv_ops, "PACKED_NARROW", True)
    out = enc(params, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-4, rtol=1e-3)


def test_packed_walk_true_skip_resblock_terminates():
    """Regression: a true_skip resblock (shortcut=None) fails the packed plan;
    the walk must execute it unpacked and ADVANCE — previously it re-packed
    and retried the same layer forever (advisor round-2 finding)."""
    from funcodec_tpu.models.seanet import (
        SEANetConfig, apply_layers, apply_layers_packed,
        build_encoder_layers, init_layers,
    )

    cfg = SEANetConfig(n_filters=32, dimension=64, norm="time_group_norm",
                       ratios=(4, 2), causal=False, true_skip=True)
    layers = build_encoder_layers(cfg)
    assert any(k == "resblock" and spec[1] is None for k, spec in layers)
    p = init_layers(jax.random.PRNGKey(7), layers)
    x = jax.random.normal(jax.random.PRNGKey(8), (2, 1280, 1), jnp.float32)
    ref = apply_layers(layers, p, x)
    out = apply_layers_packed(layers, p, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-4, rtol=1e-3)


def test_encoder_packed_walk_weight_norm_unpacks():
    """weight_norm encoders run through the packed walk too (weight-side
    norm folds into the kernel), staying correct."""
    from funcodec_tpu.models.seanet import apply_layers, apply_layers_packed

    layers, p, x = _encoder_setup(norm="weight_norm", seed=3)
    ref = apply_layers(layers, p, x)
    out = apply_layers_packed(layers, p, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-4, rtol=1e-3)
