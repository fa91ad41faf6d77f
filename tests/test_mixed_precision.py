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


def _walk_dot_dtypes(jaxpr, counts):
    """Recursively count dot_general output dtypes through call/pjit/scan/
    cond sub-jaxprs."""
    for eqn in jaxpr.eqns:
        if eqn.primitive.name == "dot_general":
            counts[str(eqn.outvars[0].aval.dtype)] = (
                counts.get(str(eqn.outvars[0].aval.dtype), 0) + 1
            )
        for v in eqn.params.values():
            vals = v if isinstance(v, (list, tuple)) else [v]
            for sub in vals:
                if hasattr(sub, "jaxpr"):  # ClosedJaxpr
                    _walk_dot_dtypes(sub.jaxpr, counts)
                elif hasattr(sub, "eqns"):  # raw Jaxpr
                    _walk_dot_dtypes(sub, counts)
    return counts


def test_laura_bf16_dots_actually_bf16():
    """train_dtype=bfloat16 must put the MATMULS in bf16, not just the param
    cast: a fp32 input or fp32 positional-encoding table silently promotes
    every downstream dot back to fp32 (caught in round 4 when the bf16 and
    fp32 Laura train benches measured IDENTICAL steps/s). Only the loss
    softmax/reg islands may stay fp32."""
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
    B, Tt, Tc = 2, 5, 12
    batch = {
        "text": jnp.asarray(np.random.RandomState(0).randint(2, 20, (B, Tt))),
        "text_lengths": jnp.asarray([5, 4], jnp.int32),
        "codec": jnp.asarray(
            np.random.RandomState(1).randint(0, 8, (B, Tc, 4))
        ),
        "codec_lengths": jnp.asarray([12, 10], jnp.int32),
    }
    rng = jax.random.PRNGKey(1)

    def counts_for(train_dtype):
        opts = LauraTrainerOptions(
            output_dir="/tmp/laura_bf16_dots", max_epoch=1,
            train_dtype=train_dtype, scheduler=None,
        )
        trainer = LauraTrainer(model, opts)
        state = trainer.init_state(jax.random.PRNGKey(0))
        jaxpr = jax.make_jaxpr(trainer._step_fn())(state, batch, rng)
        return _walk_dot_dtypes(jaxpr.jaxpr, {})

    c_bf16 = counts_for("bfloat16")
    c_f32 = counts_for("float32")
    # fp32 mode: no bf16 dots at all
    assert c_f32.get("bfloat16", 0) == 0, c_f32
    # bf16 mode: the bulk of dots (fwd+bwd matmuls) run bf16; only the
    # fp32 loss/reg islands remain
    n_bf, n_f32 = c_bf16.get("bfloat16", 0), c_bf16.get("float32", 0)
    assert n_bf > 0, c_bf16
    assert n_bf >= 2 * n_f32, c_bf16
