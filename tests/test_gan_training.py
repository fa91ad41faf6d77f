"""Discriminator structure + end-to-end GAN train-step behavior (tiny model)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from funcodec_tpu.models.discriminators import MultiScaleSTFTDiscriminator
from funcodec_tpu.models.encodec import Encodec, EncodecConfig, linear_overlap_add
from funcodec_tpu.models.quantizer import Quantizer, QuantizerConfig
from funcodec_tpu.models.seanet import SEANetConfig, SEANetDecoder, SEANetEncoder
from funcodec_tpu.train.step import (
    create_gan_train_state,
    make_gan_train_step,
    make_optimizer,
)


def test_msstft_discriminator_structure():
    """Mirrors the reference's inline test (encodec_disc.py:136-202):
    3 scales, 5 feature maps each, 32-channel fmaps, 4D logits."""
    disc = MultiScaleSTFTDiscriminator(filters=32)
    params = disc.init(jax.random.PRNGKey(0))
    x = jnp.asarray(np.random.RandomState(0).randn(1, 8000).astype(np.float32))
    outs = disc(params, x)
    assert len(outs) == 3
    for logits, fmap in outs:
        assert len(fmap) == 5
        assert all(f.shape[0] == 1 and f.shape[-1] == 32 for f in fmap)
        assert logits.ndim == 4 and logits.shape[-1] == 1
        assert np.isfinite(np.asarray(logits)).all()


def _tiny_setup(seg_dur=None):
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
        odim=16,
        multi_spectral_window_powers_of_two=(5, 6),
        segment_dur=seg_dur,
        overlap_ratio=0.25 if seg_dur else None,
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


def test_gan_train_step_two_steps():
    model, disc = _tiny_setup()
    params, rvq_state = model.init(jax.random.PRNGKey(0))
    disc_params = disc.init(jax.random.PRNGKey(1))
    opt_g = make_optimizer(lr=1e-3)
    opt_d = make_optimizer(lr=1e-3)
    state = create_gan_train_state(params, disc_params, rvq_state, opt_g, opt_d)
    step = jax.jit(make_gan_train_step(model, disc, opt_g, opt_d))

    speech = jnp.asarray(
        np.random.RandomState(0).randn(4, 1024).astype(np.float32) * 0.3
    )
    rng = jax.random.PRNGKey(7)
    state1, stats1 = step(state, {"speech": speech}, rng)
    state2, stats2 = step(state1, {"speech": speech}, rng)

    assert int(state2.step) == 2
    for k, v in {**stats1, **stats2}.items():
        assert np.isfinite(float(v)), k
    # generator params actually moved
    moved = jax.tree_util.tree_map(
        lambda a, b: float(jnp.max(jnp.abs(a - b))), state.params, state2.params
    )
    assert max(jax.tree_util.tree_leaves(moved)) > 0
    # codebooks got kmeans-initialized on step 1 and EMA-updated after
    assert float(state2.rvq_state.inited.sum()) == 4.0
    # gen_loss carry is positive after a generator turn
    assert float(state2.gen_loss_carry) > 0

    # step-1 disc gating: carry starts at 0 so disc trains iff disc_loss > 0
    assert float(stats1["discriminator_loss"]) >= 0


def test_disc_gating_blocks_update():
    """When gen_loss_carry is huge, the disc loss gates to 0 → no disc update."""
    model, disc = _tiny_setup()
    params, rvq_state = model.init(jax.random.PRNGKey(0))
    disc_params = disc.init(jax.random.PRNGKey(1))
    speech = jnp.asarray(np.random.RandomState(0).randn(2, 2048).astype(np.float32))
    loss, out = model.forward_discriminator(
        params, disc_params, disc, rvq_state, speech, jax.random.PRNGKey(0),
        gen_loss_carry=jnp.float32(1e9),
    )
    assert float(loss) == 0.0
    assert float(out["stats"]["discriminator_loss"]) > 0  # raw loss still reported


def test_overlap_add_weights():
    """Triangular overlap-add is an exact partition of unity for constants."""
    frames = [jnp.ones((1, 100)) for _ in range(4)]
    out = linear_overlap_add(frames, stride=50)
    assert out.shape == (1, 50 * 3 + 100)
    np.testing.assert_allclose(np.asarray(out), 1.0, atol=1e-6)


def test_segmented_encode_decode():
    """segment_dur + overlap_ratio path reconstructs the right length."""
    model, _ = _tiny_setup(seg_dur=0.032)  # 512 samples/segment @16k
    params, rvq_state = model.init(jax.random.PRNGKey(0))
    speech = jnp.asarray(np.random.RandomState(0).randn(1, 1200).astype(np.float32))
    out = model.inference(params, rvq_state, speech)
    assert out["recon_speech"].shape == (1, 1200)
    assert len(out["code_indices"]) == len(model._segments(1200))


def _walk_conv_dtypes(jaxpr, counts):
    """Count conv_general_dilated output dtypes through sub-jaxprs."""
    for eqn in jaxpr.eqns:
        if eqn.primitive.name == "conv_general_dilated":
            dt = str(eqn.outvars[0].aval.dtype)
            counts[dt] = counts.get(dt, 0) + 1
        for v in eqn.params.values():
            vals = v if isinstance(v, (list, tuple)) else [v]
            for sub in vals:
                if hasattr(sub, "jaxpr"):
                    _walk_conv_dtypes(sub.jaxpr, counts)
                elif hasattr(sub, "eqns"):
                    _walk_conv_dtypes(sub, counts)
    return counts


def test_bf16_step_has_no_f32_convs():
    """Under compute_dtype=bf16 every conv in the shared GAN step — codec
    AND both discriminator branches in both turns — must be bf16. The real
    branch used to inherit fp32 from the loss-side upcast of `orig`
    (encodec.py), which cost 178 ms/step of f32 disc convs at B=64 and
    handed the discriminator a real-vs-fake dtype cue
    (artifacts/trace_train_b64_r5.json, disc_conv_dtype_split)."""
    model, disc = _tiny_setup()
    params, rvq_state = model.init(jax.random.PRNGKey(0))
    disc_params = disc.init(jax.random.PRNGKey(1))
    opt_g = make_optimizer(lr=1e-3)
    opt_d = make_optimizer(lr=1e-3)
    state = create_gan_train_state(params, disc_params, rvq_state, opt_g, opt_d)
    speech = jnp.asarray(
        np.random.RandomState(0).randn(2, 1024).astype(np.float32) * 0.3
    )
    rng = jax.random.PRNGKey(7)

    def counts_for(dtype):
        step = make_gan_train_step(
            model, disc, opt_g, opt_d, compute_dtype=dtype, shared_forward=True
        )
        jaxpr = jax.make_jaxpr(step)(state, {"speech": speech}, rng)
        return _walk_conv_dtypes(jaxpr.jaxpr, {})

    bf16_counts = counts_for(jnp.bfloat16)
    assert bf16_counts.get("bfloat16", 0) > 0
    assert bf16_counts.get("float32", 0) == 0, bf16_counts

    fp32_counts = counts_for(jnp.float32)
    assert fp32_counts.get("float32", 0) > 0
    assert fp32_counts.get("bfloat16", 0) == 0, fp32_counts
