"""STOI validation on anchor distortions (VERDICT r2 item 6).

A perceptual metric is only trustworthy if it moves the right way on known
distortion ladders: identical signals must score ~1, additive noise at
decreasing SNR must score monotonically lower, and heavier spectral
smearing must hurt more than lighter smearing.
"""

import numpy as np

from funcodec_tpu.utils.quality import reconstruction_metrics, stoi


def _speech_like(n=32000, seed=0, sr=16000):
    """Modulated noise: white noise with a 4 Hz syllable-rate envelope and a
    speech-ish spectral tilt — enough temporal/spectral structure for the
    band-envelope correlations STOI measures."""
    rng = np.random.RandomState(seed)
    t = np.arange(n) / sr
    env = 0.55 + 0.45 * np.sin(2 * np.pi * 4.0 * t + rng.uniform(0, 6.28))
    x = rng.randn(n)
    # one-pole lowpass for spectral tilt
    y = np.empty_like(x)
    acc = 0.0
    for i in range(n):  # tiny n, host-side fixture
        acc = 0.9 * acc + 0.1 * x[i]
        y[i] = acc
    y = y / (np.abs(y).max() + 1e-9)
    return (y * env).astype(np.float32)


def test_stoi_identity_is_one():
    x = _speech_like()
    assert stoi(x, x) > 0.99


def test_stoi_monotonic_under_additive_noise():
    x = _speech_like()
    rng = np.random.RandomState(1)
    noise = rng.randn(len(x)).astype(np.float32)
    noise /= np.sqrt(np.mean(noise**2))
    sig_rms = np.sqrt(np.mean(x**2))
    scores = []
    for snr_db in (30, 20, 10, 0, -10):
        deg = x + noise * sig_rms * 10 ** (-snr_db / 20.0)
        scores.append(stoi(x, deg))
    assert all(a > b for a, b in zip(scores, scores[1:])), scores
    assert scores[0] > 0.95  # 30 dB SNR is near-transparent
    assert scores[-1] < 0.6  # -10 dB SNR is unintelligible


def test_stoi_penalizes_envelope_smearing():
    """Moving-average smoothing of the waveform destroys modulation depth;
    stronger smoothing must score lower."""
    x = _speech_like(seed=3)
    scores = []
    for k in (8, 64):
        kern = np.ones(k) / k
        deg = np.convolve(x, kern, mode="same").astype(np.float32)
        scores.append(stoi(x, deg))
    assert scores[0] > scores[1], scores


def test_reconstruction_metrics_include_stoi():
    x = _speech_like(seed=5)
    m = reconstruction_metrics(x, x)
    assert m["stoi"] > 0.99
    assert np.isfinite(m["lsd_db"])
