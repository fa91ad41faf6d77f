"""Parity of the fused Pallas stride-1 conv vs the XLA path (interpret mode).

Two lowerings are covered: direct (C % 128 == 0) and channel-packed
(C in {8,16,32,64} -> (B, T/f, 128) with block-Toeplitz weights).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from funcodec_tpu.ops.conv import ConvSpec, apply_sconv1d, init_conv
from funcodec_tpu.ops.conv_pallas import fused_conv1d_s1, pick_tile
from funcodec_tpu.ops.pad import conv_padding_total, split_padding


def _xla_ref(spec, params, x, act=None):
    if act == "elu":
        x = jax.nn.elu(x)
    return apply_sconv1d(spec, params, x)


def _run_case(T, K, dil, causal, pad_mode, C=128, O=24, B=2, tile=64, act=None, seed=0):
    key = jax.random.PRNGKey(seed)
    spec = ConvSpec(
        in_channels=C, out_channels=O, kernel_size=K, dilation=dil,
        causal=causal, pad_mode=pad_mode,
    )
    params = init_conv(key, spec)
    x = jax.random.normal(jax.random.PRNGKey(seed + 1), (B, T, C), jnp.float32)

    total = conv_padding_total(K, 1, dil)
    left, right = split_padding(total, causal)

    y_pal = fused_conv1d_s1(
        x, params["kernel"], params["bias"], left, right,
        dilation=dil, pad_mode=pad_mode, act=act, tile=tile, interpret=True,
    )
    assert y_pal is not None, f"unexpected fallback for T={T} K={K} dil={dil} C={C}"
    y_ref = _xla_ref(spec, params, x, act=act)
    assert y_pal.shape == y_ref.shape
    np.testing.assert_allclose(np.asarray(y_pal), np.asarray(y_ref), atol=2e-5, rtol=2e-5)


@pytest.mark.parametrize("causal", [True, False])
@pytest.mark.parametrize("pad_mode", ["reflect", "replicate", "constant"])
def test_k3_basic(causal, pad_mode):
    _run_case(T=200, K=3, dil=1, causal=causal, pad_mode=pad_mode)


@pytest.mark.parametrize("T", [64, 65, 127, 128, 129, 200, 250])
def test_ragged_lengths(T):
    _run_case(T=T, K=3, dil=1, causal=False, pad_mode="reflect", tile=64)


@pytest.mark.parametrize("dil", [1, 3, 9])
@pytest.mark.parametrize("causal", [True, False])
def test_dilated(dil, causal):
    _run_case(T=300, K=3, dil=dil, causal=causal, pad_mode="reflect", tile=64)


def test_k7_head_conv():
    _run_case(T=333, K=7, dil=1, causal=False, pad_mode="reflect", tile=64)
    _run_case(T=333, K=7, dil=1, causal=True, pad_mode="replicate", tile=64)


# ---- channel-packed lowering (C < 128) -------------------------------------


@pytest.mark.parametrize("C", [16, 32, 64])
@pytest.mark.parametrize("causal", [True, False])
def test_packed_channels(C, causal):
    _run_case(T=1600, K=3, dil=1, causal=causal, pad_mode="reflect", C=C, tile=512)


@pytest.mark.parametrize("dil", [3, 9])
def test_packed_dilated(dil):
    _run_case(T=1600, K=3, dil=dil, causal=False, pad_mode="reflect", C=32, tile=512)


def test_packed_ragged():
    # T % f == 0 but T_s ragged vs the packed tile
    _run_case(T=1504, K=3, dil=1, causal=False, pad_mode="reflect", C=32, tile=512)
    _run_case(T=1504, K=7, dil=1, causal=True, pad_mode="replicate", C=64, tile=512)


def test_packed_requires_divisible_T():
    x = jnp.zeros((1, 101, 32))  # 101 % 4 != 0
    out = fused_conv1d_s1(x, jnp.zeros((3, 32, 8)), jnp.zeros(8), 1, 1, interpret=True)
    assert out is None


def test_fused_act():
    _run_case(T=200, K=3, dil=1, causal=False, pad_mode="reflect", act="elu")
    _run_case(T=1600, K=3, dil=1, causal=False, pad_mode="reflect", C=32,
              tile=512, act="elu")


def test_bf16_close():
    key = jax.random.PRNGKey(0)
    C, O, K, T, B = 32, 32, 3, 1600, 2
    spec = ConvSpec(in_channels=C, out_channels=O, kernel_size=K)
    params = init_conv(key, spec)
    x = jax.random.normal(jax.random.PRNGKey(1), (B, T, C), jnp.bfloat16)
    y = fused_conv1d_s1(
        x, params["kernel"], params["bias"], 1, 1, tile=512, interpret=True
    )
    xf = x.astype(jnp.float32)
    y_ref = _xla_ref(spec, params, xf)
    np.testing.assert_allclose(
        np.asarray(y, np.float32), np.asarray(y_ref), atol=0.15, rtol=0.1
    )


def test_seanet_encoder_with_toggle(monkeypatch):
    """Full SEANet encoder, PALLAS_STRIDE1 on vs off (interpret mode)."""
    import funcodec_tpu.ops.conv as conv_mod
    import funcodec_tpu.ops.conv_pallas as cp
    from funcodec_tpu.models.seanet import (
        SEANetConfig,
        apply_layers,
        build_encoder_layers,
        init_layers,
    )

    cfg = SEANetConfig(
        input_size=1, dimension=32, n_filters=16, ratios=(2, 2),
        n_residual_layers=2, causal=False, pad_mode="reflect",
    )
    layers = build_encoder_layers(cfg)
    params = init_layers(jax.random.PRNGKey(0), layers)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 2560, 1), jnp.float32)

    y_off = apply_layers(layers, params, x)
    monkeypatch.setattr(conv_mod, "PALLAS_STRIDE1", True)
    monkeypatch.setattr(cp, "INTERPRET", True)
    y_on = apply_layers(layers, params, x)
    np.testing.assert_allclose(np.asarray(y_on), np.asarray(y_off), atol=2e-5, rtol=2e-5)


def test_fallbacks():
    # K=1 and too-small T must decline
    x = jnp.zeros((1, 16, 8))
    assert fused_conv1d_s1(x, jnp.zeros((1, 8, 8)), jnp.zeros(8), 0, 0) is None
    assert pick_tile(T=4, K=7, dil=1, right=3, want=64) is None


@pytest.mark.parametrize("C,T,dil", [(128, 100, 3), (16, 1600, 1)])
def test_gradients_match_xla(C, T, dil):
    """custom_vjp: d(loss)/d(x,w,b) equals the XLA path's gradients
    (both the direct and the channel-packed forward)."""
    O, K, B = 24, 3, 2
    spec = ConvSpec(in_channels=C, out_channels=O, kernel_size=K, dilation=dil)
    params = init_conv(jax.random.PRNGKey(0), spec)
    x = jax.random.normal(jax.random.PRNGKey(1), (B, T, C), jnp.float32)
    total = conv_padding_total(K, 1, dil)
    left, right = split_padding(total, False)
    cot = jax.random.normal(jax.random.PRNGKey(2), (B, T, O), jnp.float32)

    def loss_pal(x, w, b):
        y = fused_conv1d_s1(x, w, b, left, right, dilation=dil, tile=512, interpret=True)
        return jnp.sum(y * cot)

    def loss_xla(x, w, b):
        return jnp.sum(apply_sconv1d(spec, {"kernel": w, "bias": b}, x) * cot)

    gp = jax.grad(loss_pal, argnums=(0, 1, 2))(x, params["kernel"], params["bias"])
    gx = jax.grad(loss_xla, argnums=(0, 1, 2))(x, params["kernel"], params["bias"])
    for a, b_, name in zip(gp, gx, ("dx", "dw", "db")):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b_), atol=3e-4, rtol=3e-4, err_msg=name
        )
