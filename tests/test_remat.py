"""REMAT_RESBLOCKS must not change the math — only the backward's memory
schedule. jax.checkpoint recomputes each resblock during the backward pass
instead of saving its intermediates; forward values and gradients must be
bit-identical on CPU (same ops, same order, fp32)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import funcodec_tpu.models.seanet as seanet_mod
from funcodec_tpu.models.seanet import SEANetConfig, SEANetDecoder, SEANetEncoder


@pytest.fixture()
def enc_dec():
    cfg = SEANetConfig(
        n_filters=8, dimension=32, ratios=[4, 2], norm="time_group_norm",
        causal=False,
    )
    enc = SEANetEncoder(cfg)
    dcfg = SEANetConfig(
        n_filters=8, dimension=32, ratios=[4, 2], norm="time_group_norm",
        causal=False,
    )
    dec = SEANetDecoder(dcfg)
    key = jax.random.PRNGKey(0)
    pe = enc.init(key)
    pd = dec.init(jax.random.fold_in(key, 1))
    return enc, dec, pe, pd


def _loss_and_grads(enc, dec, pe, pd, x):
    def loss_fn(params):
        pe_, pd_ = params
        z = enc(pe_, x)
        y = dec(pd_, z)
        return jnp.sum(y * y)

    return jax.value_and_grad(loss_fn)((pe, pd))


def test_remat_bitexact_forward_and_grads(enc_dec):
    enc, dec, pe, pd = enc_dec
    x = jnp.asarray(np.random.RandomState(0).randn(2, 256).astype(np.float32))

    assert seanet_mod.REMAT_RESBLOCKS is False  # default off
    loss0, grads0 = jax.jit(
        lambda p: _loss_and_grads(enc, dec, p[0], p[1], x)
    )((pe, pd))

    seanet_mod.REMAT_RESBLOCKS = True
    try:
        loss1, grads1 = jax.jit(
            lambda p: _loss_and_grads(enc, dec, p[0], p[1], x)
        )((pe, pd))
    finally:
        seanet_mod.REMAT_RESBLOCKS = False

    assert float(loss0) == float(loss1)
    flat0 = jax.tree_util.tree_leaves(grads0)
    flat1 = jax.tree_util.tree_leaves(grads1)
    assert len(flat0) == len(flat1)
    for a, b in zip(flat0, flat1):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_remat_full_gan_step_losses_match():
    """One production shared-forward GAN step: stats identical with and
    without resblock remat (the step is where the flag is meant to be used)."""
    from funcodec_tpu.train.step import (
        create_gan_train_state,
        make_gan_train_step,
        make_optimizer,
    )
    from tests.test_shared_forward import _setup

    model, disc = _setup()
    params, rvq_state = model.init(jax.random.PRNGKey(0))
    disc_params = disc.init(jax.random.PRNGKey(1))
    opt_g = make_optimizer(lr=3e-4, betas=(0.5, 0.9))
    opt_d = make_optimizer(lr=3e-4, betas=(0.5, 0.9))
    speech = jnp.asarray(
        np.random.RandomState(1).randn(2, 512).astype(np.float32) * 0.1
    )
    rng = jax.random.PRNGKey(7)

    def run_one(remat):
        seanet_mod.REMAT_RESBLOCKS = remat
        try:
            step = jax.jit(make_gan_train_step(
                model, disc, opt_g, opt_d, shared_forward=True,
            ))
            state = create_gan_train_state(
                params, disc_params, rvq_state, opt_g, opt_d
            )
            state, stats = step(state, {"speech": speech}, rng)
            return {k: float(v) for k, v in stats.items()}, state
        finally:
            seanet_mod.REMAT_RESBLOCKS = False

    stats0, state0 = run_one(False)
    stats1, state1 = run_one(True)
    assert set(stats0) == set(stats1)
    for k in stats0:
        assert stats0[k] == pytest.approx(stats1[k], rel=0, abs=0), k
    for a, b in zip(jax.tree_util.tree_leaves(state0.params),
                    jax.tree_util.tree_leaves(state1.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
