"""Mixed-precision (bf16 compute, fp32 masters) training steps.

The reference trains fp32 with an optional AMP GradScaler
(funcodec/train/trainer.py:213-227). The TPU equivalent is a compute_dtype
cast inside the loss function (train/step.py make_gan_train_step
compute_dtype / laura_trainer train_dtype): master params and Adam moments
stay fp32, the forward/backward runs bf16, no loss scaling (bf16 keeps
fp32's exponent range). These tests pin the contract: params remain fp32,
losses stay finite and close to the fp32 step's, and training still learns.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from funcodec_tpu.train.step import (
    cast_floating,
    create_gan_train_state,
    make_gan_train_step,
    make_optimizer,
)

from tests.test_gan_training import _tiny_setup


def _leaf_dtypes(tree):
    return {
        str(jax.tree_util.keystr(kp)): x.dtype
        for kp, x in jax.tree_util.tree_flatten_with_path(tree)[0]
        if hasattr(x, "dtype")
    }


def test_cast_floating_only_touches_f32():
    tree = {
        "w": jnp.ones((3,), jnp.float32),
        "i": jnp.ones((3,), jnp.int32),
        "half": jnp.ones((3,), jnp.bfloat16),
    }
    out = cast_floating(tree, jnp.bfloat16)
    assert out["w"].dtype == jnp.bfloat16
    assert out["i"].dtype == jnp.int32
    assert out["half"].dtype == jnp.bfloat16
    assert cast_floating(tree, None) is tree


@pytest.mark.parametrize("compute_dtype", [None, jnp.bfloat16])
def test_gan_bf16_step_masters_stay_fp32(compute_dtype):
    model, disc = _tiny_setup()
    params, rvq_state = model.init(jax.random.PRNGKey(0))
    disc_params = disc.init(jax.random.PRNGKey(1))
    opt_g = make_optimizer(lr=1e-3)
    opt_d = make_optimizer(lr=1e-3)
    step = jax.jit(
        make_gan_train_step(model, disc, opt_g, opt_d, compute_dtype=compute_dtype)
    )
    state = create_gan_train_state(params, disc_params, rvq_state, opt_g, opt_d)
    speech = jnp.asarray(
        np.random.RandomState(0).randn(2, 1024).astype(np.float32) * 0.1
    )
    rng = jax.random.PRNGKey(7)
    for _ in range(2):
        state, stats = step(state, {"speech": speech}, rng)
    # master params and optimizer moments never leave fp32
    for name, dt in _leaf_dtypes(state.params).items():
        assert dt == jnp.float32, (name, dt)
    for name, dt in _leaf_dtypes(state.opt_state_g).items():
        if dt in (jnp.float32, jnp.bfloat16):
            assert dt == jnp.float32, (name, dt)
    for v in stats.values():
        assert np.isfinite(float(v))


def test_gan_bf16_loss_close_to_fp32():
    losses = {}
    for dtype in (None, jnp.bfloat16):
        model, disc = _tiny_setup()
        params, rvq_state = model.init(jax.random.PRNGKey(0))
        disc_params = disc.init(jax.random.PRNGKey(1))
        opt_g, opt_d = make_optimizer(lr=1e-3), make_optimizer(lr=1e-3)
        step = jax.jit(
            make_gan_train_step(model, disc, opt_g, opt_d, compute_dtype=dtype)
        )
        state = create_gan_train_state(params, disc_params, rvq_state, opt_g, opt_d)
        speech = jnp.asarray(
            np.random.RandomState(0).randn(2, 1024).astype(np.float32) * 0.1
        )
        state, stats = step(state, {"speech": speech}, jax.random.PRNGKey(7))
        losses[dtype] = float(stats["generator_loss"])
    assert losses[jnp.bfloat16] == pytest.approx(losses[None], rel=0.05)


def test_laura_bf16_step():
    from funcodec_tpu.models.laura import LauraConfig, LauraGenModel
    from funcodec_tpu.models.transformer import TransformerConfig
    from funcodec_tpu.train.laura_trainer import LauraTrainer, LauraTrainerOptions

    cb_dim, att = 8, 16
    cfg = LauraConfig(
        input_size=12, vocab_size=20, num_quantizers=4, codebook_size=8,
        codebook_dim=cb_dim, predict_nq=2,
    )
    enc_cfg = TransformerConfig(
        input_size=12, attention_dim=att, attention_heads=2,
        linear_units=32, num_blocks=1, input_layer="linear",
        pos_enc_type="rel_pos", activation="swish",
    )
    codec_enc_cfg = TransformerConfig(
        input_size=cb_dim, attention_dim=att, attention_heads=2,
        linear_units=32, num_blocks=1, input_layer="linear",
        pos_enc_type="rel_pos", activation="swish",
    )
    lm_cfg = TransformerConfig(
        input_size=cb_dim, attention_dim=att, attention_heads=2,
        linear_units=32, num_blocks=1, input_layer="linear_relu",
        pos_enc_type="rel_pos",
    )
    model = LauraGenModel(cfg, enc_cfg, codec_enc_cfg, lm_cfg)
    opts = LauraTrainerOptions(
        output_dir="/tmp/laura_bf16_test", max_epoch=1, train_dtype="bfloat16",
        scheduler=None,
    )
    trainer = LauraTrainer(model, opts)
    state = trainer.init_state(jax.random.PRNGKey(0))
    rng = jax.random.PRNGKey(1)
    B, Tt, Tc = 2, 5, 12
    batch = {
        "text": jnp.asarray(np.random.RandomState(0).randint(2, 20, (B, Tt))),
        "text_lengths": jnp.asarray([5, 4], jnp.int32),
        "codec": jnp.asarray(
            np.random.RandomState(1).randint(0, 8, (B, Tc, 4))
        ),
        "codec_lengths": jnp.asarray([12, 10], jnp.int32),
    }
    step = trainer._step_fn()
    state, stats = step(state, batch, rng)
    assert np.isfinite(float(stats["loss"]))
    for name, dt in _leaf_dtypes(state.params).items():
        assert dt in (jnp.float32, jnp.int32), (name, dt)
