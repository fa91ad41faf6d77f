"""STFT/ISTFT parity vs torch.stft/istft and mel filterbank sanity."""

import numpy as np
import pytest

import jax.numpy as jnp

from funcodec_tpu.ops.stft import (
    audio_to_mel,
    hann_window,
    istft,
    mel_filterbank,
    stft,
)


@pytest.mark.parametrize(
    "n_fft,hop,win,center,normalized",
    [
        (1024, 256, 1024, False, False),
        (1024, 256, 1024, False, True),
        (1024, 8, 32, False, False),  # Audio2Mel short-window case
        (512, 160, 512, True, False),  # FreqCodec domain transform
        (2048, 512, 2048, False, True),  # discriminator scale
    ],
)
def test_stft_vs_torch(torch, n_fft, hop, win, center, normalized):
    x = torch.randn(2, 4096)
    w = torch.hann_window(win)
    ref = torch.stft(
        x, n_fft=n_fft, hop_length=hop, win_length=win, window=w,
        center=center, normalized=False, return_complex=True,
    ).numpy()
    if normalized:
        ref = ref / np.sqrt(float((w**2).sum()))
    ours = np.asarray(stft(jnp.asarray(x.numpy()), n_fft, hop, win, center=center, normalized=normalized))
    assert ours.shape == ref.shape
    np.testing.assert_allclose(ours.real, ref.real, atol=2e-4, rtol=1e-4)
    np.testing.assert_allclose(ours.imag, ref.imag, atol=2e-4, rtol=1e-4)


def test_istft_roundtrip_vs_torch(torch):
    n_fft, hop = 512, 160
    x = torch.randn(2, 4800)
    w = torch.hann_window(n_fft)
    spec = torch.stft(
        x, n_fft=n_fft, hop_length=hop, window=w, center=True, return_complex=True
    )
    ref = torch.istft(
        spec, n_fft=n_fft, hop_length=hop, window=w, center=True, length=4800
    ).numpy()
    ours = np.asarray(
        istft(jnp.asarray(spec.numpy()), n_fft, hop, center=True, length=4800)
    )
    np.testing.assert_allclose(ours, ref, atol=1e-4, rtol=1e-4)
    # and the round trip actually reconstructs the signal
    np.testing.assert_allclose(ours, x.numpy(), atol=1e-4, rtol=1e-4)


def test_hann_window_torch_parity(torch):
    for n in (32, 512, 1024):
        np.testing.assert_allclose(
            np.asarray(hann_window(n)), torch.hann_window(n).numpy(), atol=1e-6
        )


def test_mel_filterbank_properties():
    """Slaney mel filterbank invariants (librosa-compatible)."""
    fb = mel_filterbank(16000, 1024, 64)
    assert fb.shape == (64, 513)
    assert (fb >= 0).all()
    # each filter is a single triangle: unimodal, nonzero support
    nonzero = (fb > 0).sum(axis=1)
    assert (nonzero > 0).all()
    # slaney normalization: peak of each filter ~ 2/(bandwidth); area ~constant
    freqs = np.linspace(0, 8000, 513)
    areas = fb @ np.gradient(freqs)
    np.testing.assert_allclose(areas, areas.mean(), rtol=0.1)
    # known slaney anchors: filters are linear-spaced below 1 kHz
    peak_bins = fb.argmax(axis=1)
    peak_hz = freqs[peak_bins]
    low = peak_hz[peak_hz < 900]
    diffs = np.diff(low)
    np.testing.assert_allclose(diffs, diffs.mean(), atol=freqs[1] + 1e-6)


def test_audio_to_mel_shapes():
    x = jnp.asarray(np.random.RandomState(0).randn(2, 16000).astype(np.float32))
    for win in (32, 1024):
        mel, power = audio_to_mel(
            x, n_fft=1024, hop_length=win // 4, win_length=win,
            sampling_rate=16000, n_mel_channels=64, return_power_spec=True,
        )
        assert mel.shape[0] == 2 and mel.shape[1] == 64
        assert power.shape[1] == 513
        assert np.isfinite(np.asarray(mel)).all()
        assert np.asarray(mel).min() >= -5.0 - 1e-6  # log10 clamp at 1e-5
