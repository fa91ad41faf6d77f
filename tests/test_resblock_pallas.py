"""Parity of the fused whole-resblock Pallas kernel vs the XLA path.

Runs in interpret mode on the CPU backend. Covers the direct (C % 128 == 0)
and channel-packed (C in {32, 64}) lowerings, causal/non-causal, dilation,
ragged tiles, gradients, and the apply_layers peephole wiring.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import funcodec_tpu.ops.resblock_pallas as rbp
from funcodec_tpu.ops.conv import ConvSpec, apply_sconv1d, init_conv
from funcodec_tpu.ops.resblock_pallas import fused_resblock_tgn


def _make_block(C, K=3, dil=1, causal=False, pad_mode="reflect", seed=0):
    H = C // 2
    spec1 = ConvSpec(C, H, K, dilation=dil, causal=causal,
                     norm="time_group_norm", pad_mode=pad_mode)
    spec2 = ConvSpec(H, C, 1, causal=causal,
                     norm="time_group_norm", pad_mode=pad_mode)
    spec_s = ConvSpec(C, C, 1, causal=causal,
                      norm="time_group_norm", pad_mode=pad_mode)
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(seed), 3)
    p1, p2, ps = init_conv(k1, spec1), init_conv(k2, spec2), init_conv(k3, spec_s)
    # non-trivial norm affine so A/D folding is actually exercised
    p1["norm_scale"] = p1["norm_scale"] * 1.3 + 0.1
    p1["norm_bias"] = p1["norm_bias"] + 0.05
    ps["norm_bias"] = ps["norm_bias"] - 0.02
    return (p1, p2, ps), (spec1, spec2, spec_s)


def _xla_resblock(params, specs, x):
    (p1, p2, ps), (spec1, spec2, spec_s) = params, specs
    elu = jax.nn.elu
    h = apply_sconv1d(spec1, p1, elu(x))
    c = apply_sconv1d(spec2, p2, elu(h))
    s = apply_sconv1d(spec_s, ps, x)
    return c + s


def _run_case(C, T, B=2, K=3, dil=1, causal=False, pad_mode="reflect",
              tile=64, seed=0, atol=2e-4):
    params, specs = _make_block(C, K, dil, causal, pad_mode, seed)
    x = jax.random.normal(jax.random.PRNGKey(seed + 7), (B, T, C), jnp.float32)
    y = fused_resblock_tgn(x, *params, *specs, tile=tile, interpret=True)
    assert y is not None, f"unexpected fallback C={C} T={T} K={K} dil={dil}"
    ref = _xla_resblock(params, specs, x)
    assert y.shape == ref.shape
    np.testing.assert_allclose(np.asarray(y), np.asarray(ref), atol=atol, rtol=1e-3)


def test_direct_c128():
    _run_case(C=128, T=192)


def test_packed_c32():
    _run_case(C=32, T=512, tile=32)


def test_packed_c64():
    _run_case(C=64, T=400, tile=40)


@pytest.mark.parametrize("causal", [True, False])
def test_causal(causal):
    _run_case(C=128, T=160, causal=causal, tile=None)


def test_dilated():
    _run_case(C=128, T=320, dil=2)


def test_even_tiles():
    _run_case(C=128, T=192, tile=64)


def test_single_tile_fallback_length():
    # Tp with no mult-of-8 divisor >= 256 still runs as one tile
    _run_case(C=128, T=200, tile=None)


def test_non_mult8_length_falls_back():
    params, specs = _make_block(128)
    x = jnp.zeros((1, 250, 128))
    assert fused_resblock_tgn(x, *params, *specs, interpret=True) is None


def test_fallback_on_weight_norm():
    params, specs = _make_block(128)
    spec1 = ConvSpec(128, 64, 3, norm="weight_norm", pad_mode="reflect")
    x = jnp.zeros((1, 64, 128))
    assert fused_resblock_tgn(x, *params, spec1, specs[1], specs[2],
                              interpret=True) is None


def test_gradients_flow_to_params():
    params, specs = _make_block(128, seed=3)
    x = jax.random.normal(jax.random.PRNGKey(11), (1, 96, 128), jnp.float32)

    def loss_fused(p1, xv):
        y = fused_resblock_tgn(xv, p1, params[1], params[2], *specs,
                               tile=32, interpret=True)
        return jnp.sum(y ** 2)

    def loss_ref(p1, xv):
        return jnp.sum(_xla_resblock((p1, params[1], params[2]), specs, xv) ** 2)

    g_fused = jax.grad(loss_fused, argnums=(0, 1))(params[0], x)
    g_ref = jax.grad(loss_ref, argnums=(0, 1))(params[0], x)
    for a, b in zip(jax.tree_util.tree_leaves(g_fused),
                    jax.tree_util.tree_leaves(g_ref)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-3, rtol=1e-3)


def test_apply_layers_peephole(monkeypatch):
    """The SEANet resblock path dispatches to the fused kernel when enabled."""
    import funcodec_tpu.ops.conv as conv_ops
    from funcodec_tpu.models.seanet import (
        SEANetConfig, apply_layers, build_encoder_layers, init_layers,
    )

    cfg = SEANetConfig(n_filters=16, dimension=32, norm="time_group_norm",
                       ratios=(2, 2), causal=False)
    layers = build_encoder_layers(cfg)
    p = init_layers(jax.random.PRNGKey(0), layers)
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 256, 1), jnp.float32)

    y_ref = apply_layers(layers, p, x)
    monkeypatch.setattr(conv_ops, "PALLAS_RESBLOCK", True)
    monkeypatch.setattr(rbp, "INTERPRET", True)
    y_fused = apply_layers(layers, p, x)
    np.testing.assert_allclose(np.asarray(y_fused), np.asarray(y_ref),
                               atol=5e-4, rtol=2e-3)
