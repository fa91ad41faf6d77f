"""Native PhaseAug (ops/stft.py:phase_aug) + FreqCodec phase-invariant training.

Stands in for the external `phaseaug` package the reference imports
(codec_freq.py:243-249); semantics per arXiv:2211.04610 — magnitude-
preserving per-bin phase rotation with a frequency-smoothed random component
plus a linear (fractional-delay) term.
"""

import numpy as np
import pytest
import yaml

import jax
import jax.numpy as jnp

from funcodec_tpu.ops.stft import phase_aug, stft


SR = 16000


def _tone(t_samples, freqs=(220.0, 850.0, 2333.0)):
    t = np.arange(t_samples) / SR
    x = sum(np.sin(2 * np.pi * f * t + 0.3 * i) for i, f in enumerate(freqs))
    return (0.2 * x).astype(np.float32)


def test_zero_phi_is_identity():
    x = jnp.asarray(_tone(8000))[None]
    phi = jnp.zeros((1, 257), jnp.float32)
    y = phase_aug(x, phi=phi)
    np.testing.assert_allclose(np.asarray(y), np.asarray(x), atol=1e-5)


def test_linear_phi_is_a_time_shift():
    """phi_k = -2*pi*k*s/n_fft rotates every frame's spectrum like a delay of
    s samples; away from the boundaries the resynthesis must match np.roll."""
    n_fft, hop, s = 512, 160, 40
    x_np = _tone(16000)
    x = jnp.asarray(x_np)[None]
    k = np.arange(n_fft // 2 + 1)
    phi = jnp.asarray((-2 * np.pi * k * s / n_fft)[None, :].astype(np.float32))
    y = np.asarray(phase_aug(x, phi=phi, n_fft=n_fft, hop_length=hop))[0]
    expected = np.roll(x_np, s)
    mid = slice(2 * n_fft, len(x_np) - 2 * n_fft)
    err = np.abs(y[mid] - expected[mid]).max()
    # the linear-phase rotation shifts the *windowed* frame circularly, so a
    # residual O(s/n_fft) window-misalignment error is intrinsic; require the
    # output to sit at the shifted signal, far from the unshifted one
    err_unshifted = np.abs(y[mid] - x_np[mid]).max()
    assert err < 0.05, err
    assert err * 5 < err_unshifted, (err, err_unshifted)


def test_random_phase_aug_preserves_magnitude():
    x = jnp.asarray(_tone(16000))[None].repeat(3, axis=0)
    y = phase_aug(x, key=jax.random.PRNGKey(0))
    assert y.shape == x.shape
    # different waveform...
    assert float(jnp.abs(y - x).max()) > 1e-3
    # ...same spectral magnitude on the analysis grid (up to OLA consistency)
    mag_x = jnp.abs(stft(x, 512, 160))
    mag_y = jnp.abs(stft(y, 512, 160))
    interior = (slice(None), slice(None), slice(8, -8))
    rel = jnp.abs(mag_y[interior] - mag_x[interior]) / (mag_x[interior] + 1e-2)
    assert float(jnp.mean(rel)) < 0.08, float(jnp.mean(rel))
    # energy preserved
    assert abs(float(jnp.sum(y**2) / jnp.sum(x**2)) - 1.0) < 0.05


def test_distinct_keys_give_distinct_augs():
    x = jnp.asarray(_tone(8000))[None]
    y0 = phase_aug(x, key=jax.random.PRNGKey(1))
    y1 = phase_aug(x, key=jax.random.PRNGKey(2))
    assert float(jnp.abs(y0 - y1).max()) > 1e-3


@pytest.fixture(scope="module")
def pit_model():
    """Tiny FreqCodec with phase_invariant_training on, via the task config
    path (field names per codec_freq.py:118-249)."""
    from funcodec_tpu.tasks.codec import build_codec_model

    config = yaml.safe_load(
        """
input_size: 3
encoder: encodec_seanet_encoder_2d
encoder_conf:
    n_filters: 4
    ratios: [[4, 1], [4, 1], [4, 2], [4, 1]]
    norm: time_group_norm
    causal: false
    dilation_base: 1
quantizer: costume_quantizer
quantizer_conf:
    codebook_size: 64
    num_quantizers: 4
    ema_decay: 0.99
    kmeans_init: true
    sampling_rate: 16000
    encoder_hop_length: 320
decoder: encodec_seanet_decoder_2d
decoder_conf:
    n_filters: 4
    ratios: [[4, 1], [4, 1], [4, 2], [4, 1]]
    norm: time_group_norm
    causal: false
    channels: 3
    dilation_base: 1
discriminator: multiple_disc
discriminator_conf:
    disc_conf_list:
        - name: encodec_multi_scale_stft_discriminator
          filters: 4
          n_ffts: [256, 512]
          hop_lengths: [64, 128]
          win_lengths: [256, 512]
model: freq_codec
model_conf:
    odim: 32
    target_sample_hz: 16000
    audio_normalize: true
    segment_dur: null
    overlap_ratio: null
    codec_domain: [mag_phase, mag_phase]
    phase_invariant_training: true
    pit_feat_loss_weight: 1.0
    pit_disc_loss_weight: 1000.0
"""
    )
    return build_codec_model(config)


def test_freqcodec_pit_disc_turn(pit_model):
    model, disc = pit_model
    assert model.cfg.phase_invariant_training
    params, rvq_state = model.init(jax.random.PRNGKey(0))
    disc_params = disc.init(jax.random.PRNGKey(1))
    speech = jnp.asarray(np.stack([_tone(3200), _tone(3200, (440.0,))]))

    loss, out = model.forward_discriminator(
        params, disc_params, disc, rvq_state, speech,
        jax.random.PRNGKey(3), jnp.float32(0.0),
    )
    assert "pit_disc_loss" in out["stats"]
    assert np.isfinite(float(loss))
    assert np.isfinite(float(out["stats"]["pit_disc_loss"]))
    # the hinge disc loss on an untrained model sits near 2.0 > gen_loss_carry
    # = 0, so the gate is open and pit contributes with weight 1000
    assert float(out["stats"]["pit_disc_loss"]) > 0.0


def test_freqcodec_pit_full_gan_step(pit_model):
    from funcodec_tpu.train.step import (
        create_gan_train_state,
        make_gan_train_step,
        make_optimizer,
    )

    model, disc = pit_model
    params, rvq_state = model.init(jax.random.PRNGKey(0))
    disc_params = disc.init(jax.random.PRNGKey(1))
    opt_g, opt_d = make_optimizer(lr=1e-4), make_optimizer(lr=1e-4)
    state = create_gan_train_state(params, disc_params, rvq_state, opt_g, opt_d)
    step = jax.jit(make_gan_train_step(model, disc, opt_g, opt_d))

    speech = jnp.asarray(np.stack([_tone(3200), _tone(3200, (440.0,))]))
    state, stats = step(state, {"speech": speech}, jax.random.PRNGKey(7))
    assert np.isfinite(float(stats["pit_disc_loss"]))
    assert float(stats["discriminator_nonfinite_skip"]) == 0.0
    assert int(state.step) == 1
