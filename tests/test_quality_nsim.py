"""NSIM (ViSQOL v3 similarity core) validation on anchor distortions.

Same acceptance standard as test_quality_stoi.py: identity ~1, monotone
under an additive-noise ladder, and sensitive to spectral distortions that
waveform metrics under-weight (VERDICT r2 missing item 1 / next item 6).
"""

import numpy as np

from funcodec_tpu.utils.quality import nsim, reconstruction_metrics

from tests.test_quality_stoi import _speech_like


def test_nsim_identity_is_one():
    x = _speech_like()
    assert nsim(x, x) > 0.999


def test_nsim_monotonic_under_additive_noise():
    x = _speech_like()
    rng = np.random.RandomState(1)
    noise = rng.randn(len(x)).astype(np.float32)
    noise /= np.sqrt(np.mean(noise**2))
    sig_rms = np.sqrt(np.mean(x**2))
    scores = []
    for snr_db in (40, 25, 10, -5):
        deg = x + noise * sig_rms * 10 ** (-snr_db / 20.0)
        scores.append(nsim(x, deg))
    assert all(a > b for a, b in zip(scores, scores[1:])), scores
    assert scores[0] > 0.9  # 40 dB SNR near-transparent
    assert scores[-1] < 0.75  # -5 dB SNR clearly degraded


def test_nsim_monotonic_under_quantization():
    """Waveform bit-depth ladder: the coarse-quantization anchor family
    (the distortion a codec at shrinking bitrate resembles most)."""
    x = _speech_like(seed=7)
    scores = []
    for bits in (12, 8, 5, 3):
        q = 2.0 ** (bits - 1)
        deg = np.round(x * q) / q
        scores.append(nsim(x, deg.astype(np.float32)))
    assert all(a > b for a, b in zip(scores, scores[1:])), scores


def test_nsim_penalizes_spectral_smearing_more_when_stronger():
    x = _speech_like(seed=3)
    scores = []
    for k in (4, 64):
        kern = np.ones(k) / k
        deg = np.convolve(x, kern, mode="same").astype(np.float32)
        scores.append(nsim(x, deg))
    assert scores[0] > scores[1], scores


def test_reconstruction_metrics_include_nsim():
    x = _speech_like(seed=5)
    m = reconstruction_metrics(x, x)
    assert m["nsim"] > 0.999
