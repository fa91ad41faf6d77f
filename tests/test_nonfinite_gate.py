"""Non-finite-gradient step skip.

The reference refuses to apply an optimizer step when the grad norm is
inf/NaN (funcodec/train/trainer.py:703-719, gan_trainer.py:274-295): the
step is skipped, params and optimizer moments stay untouched, and training
continues. These tests inject a NaN batch and assert exactly that.
"""

import numpy as np
import optax
import pytest

import jax
import jax.numpy as jnp

from funcodec_tpu.models.discriminators import MultiScaleSTFTDiscriminator
from funcodec_tpu.models.encodec import Encodec, EncodecConfig
from funcodec_tpu.models.quantizer import Quantizer, QuantizerConfig
from funcodec_tpu.models.seanet import SEANetConfig, SEANetDecoder, SEANetEncoder
from funcodec_tpu.train.step import (
    apply_updates_if_finite,
    create_gan_train_state,
    make_gan_train_step,
    make_optimizer,
)


def _trees_equal(a, b):
    leaves_a = jax.tree_util.tree_leaves(a)
    leaves_b = jax.tree_util.tree_leaves(b)
    assert len(leaves_a) == len(leaves_b)
    return all(
        np.array_equal(np.asarray(x), np.asarray(y))
        for x, y in zip(leaves_a, leaves_b)
    )


def test_helper_skips_on_nan_grads():
    params = {"w": jnp.ones((3,)), "b": jnp.float32(2.0)}
    opt = optax.adam(1e-2)
    opt_state = opt.init(params)

    bad_grads = {"w": jnp.array([1.0, jnp.nan, 0.0]), "b": jnp.float32(0.5)}
    new_params, new_opt, gnorm, finite = apply_updates_if_finite(
        opt, bad_grads, opt_state, params
    )
    assert not bool(finite)
    assert not np.isfinite(float(gnorm))
    assert _trees_equal(new_params, params)
    assert _trees_equal(new_opt, opt_state)

    good_grads = {"w": jnp.array([1.0, -1.0, 0.0]), "b": jnp.float32(0.5)}
    new_params, new_opt, gnorm, finite = apply_updates_if_finite(
        opt, good_grads, opt_state, params
    )
    assert bool(finite)
    assert np.isfinite(float(gnorm))
    assert not _trees_equal(new_params, params)
    assert not _trees_equal(new_opt, opt_state)


def test_helper_skips_on_inf_grads_under_jit():
    params = {"w": jnp.ones((4,))}
    opt = make_optimizer(lr=1e-3, grad_clip=1.0)
    opt_state = opt.init(params)

    @jax.jit
    def run(grads, opt_state, params):
        return apply_updates_if_finite(opt, grads, opt_state, params)

    new_params, new_opt, _, finite = run(
        {"w": jnp.array([1.0, jnp.inf, 0.0, 0.0])}, opt_state, params
    )
    assert not bool(finite)
    assert _trees_equal(new_params, params)
    assert _trees_equal(new_opt, opt_state)


def _tiny_gan():
    seanet = SEANetConfig(
        n_filters=4, dimension=16, ratios=(4, 2), norm="time_group_norm"
    )
    enc, dec = SEANetEncoder(seanet), SEANetDecoder(seanet)
    q = Quantizer(
        QuantizerConfig(
            input_size=16, codebook_size=32, num_quantizers=4, ema_decay=0.9,
            kmeans_init=True, sampling_rate=16000, encoder_hop_length=8,
        )
    )
    cfg = EncodecConfig(
        odim=16, multi_spectral_window_powers_of_two=(5, 6),
        use_power_spec_loss=True,
    )
    model = Encodec(cfg, enc, q, dec)
    disc = MultiScaleSTFTDiscriminator(
        filters=4, n_ffts=(256, 512), hop_lengths=(64, 128), win_lengths=(256, 512)
    )

    class WrapDisc:
        def init(self, key):
            return disc.init(key)

        def __call__(self, params, x, precision=None):
            return disc(params, x, precision=precision)

    return model, WrapDisc()


def test_gan_step_survives_nan_batch():
    model, disc = _tiny_gan()
    params, rvq_state = model.init(jax.random.PRNGKey(0))
    disc_params = disc.init(jax.random.PRNGKey(1))
    opt_g = make_optimizer(lr=1e-3)
    opt_d = make_optimizer(lr=1e-3)
    state = create_gan_train_state(params, disc_params, rvq_state, opt_g, opt_d)
    step = jax.jit(make_gan_train_step(model, disc, opt_g, opt_d))
    rng = jax.random.PRNGKey(7)

    good = jnp.asarray(
        np.random.RandomState(0).randn(2, 1024).astype(np.float32) * 0.3
    )
    state, stats = step(state, {"speech": good}, rng)
    assert float(stats["generator_nonfinite_skip"]) == 0.0
    assert float(stats["discriminator_nonfinite_skip"]) == 0.0
    assert np.isfinite(float(stats["generator_grad_norm"]))

    before = jax.device_get(
        (state.params, state.disc_params, state.opt_state_g, state.opt_state_d,
         state.rvq_state, state.gen_loss_carry)
    )

    bad = good.at[0, 0].set(jnp.nan)
    state, stats = step(state, {"speech": bad}, rng)
    # both turns must have been skipped, with all learnable state untouched
    assert float(stats["generator_nonfinite_skip"]) == 1.0
    assert float(stats["discriminator_nonfinite_skip"]) == 1.0
    assert int(state.step) == 2  # training continues
    after = jax.device_get(
        (state.params, state.disc_params, state.opt_state_g, state.opt_state_d,
         state.rvq_state, state.gen_loss_carry)
    )
    # gen_loss_carry is reset to 0 by the disc turn, then only advanced by a
    # finite gen turn — compare everything except leaving NaN anywhere
    assert _trees_equal(after[0], before[0])
    assert _trees_equal(after[1], before[1])
    assert _trees_equal(after[2], before[2])
    assert _trees_equal(after[3], before[3])
    assert _trees_equal(after[4], before[4])
    for leaf in jax.tree_util.tree_leaves(after):
        assert np.isfinite(np.asarray(leaf, dtype=np.float64)).all()

    # and a subsequent good batch trains normally
    state, stats = step(state, {"speech": good}, rng)
    assert float(stats["generator_nonfinite_skip"]) == 0.0
    assert not _trees_equal(state.params, before[0])


def test_optimizer_name_mapping():
    """make_optimizer maps the reference registry names (abs_task.py:87-153):
    fairseq_adam/lazy_adamw/sgd all build and step."""
    params = {"w": jnp.ones((4,))}
    grads = {"w": jnp.full((4,), 0.1)}
    for name, wd in (
        ("adam", 0.0), ("adamw", 0.01), ("fairseq_adam", 0.0),
        ("fairseq_adam", 0.01), ("lazy_adamw", 0.01), ("sgd", 0.0),
    ):
        opt = make_optimizer(lr=1e-2, name=name, weight_decay=wd, momentum=0.9)
        st = opt.init(params)
        updates, st = opt.update(grads, st, params)
        new = optax.apply_updates(params, updates)
        assert float(jnp.abs(new["w"] - params["w"]).max()) > 0

    with pytest.raises(ValueError):
        make_optimizer(name="adagrad_spicy")
