"""TTS objective proxies (utils/tts_quality.py — VERDICT r3 item 6).

The proxies must move in the right direction on constructed signals:
same-speaker material scores higher speaker cosine than cross-speaker,
MCD is 0 on identity and grows with distortion, and held-out token NLL is
a calibrated log-likelihood (~log V for an untrained LM).
"""

import numpy as np
import pytest

from funcodec_tpu.utils.tts_quality import (
    held_out_token_nll,
    mel_cepstral_distance,
    mfcc,
    speaker_similarity,
    tts_metrics,
)

SR = 16000


def _voice(f0: float, formants, seconds=1.0, seed=0, sr=SR):
    """Synthetic 'speaker': harmonic stack shaped by a fixed spectral
    envelope (formant peaks) + a little noise. Different (f0, formants)
    pairs = different long-term timbre."""
    rng = np.random.RandomState(seed)
    t = np.arange(int(seconds * sr)) / sr
    x = np.zeros_like(t)
    for k in range(1, 40):
        f = k * f0
        if f > sr / 2 - 200:
            break
        amp = sum(np.exp(-0.5 * ((f - fc) / bw) ** 2) for fc, bw in formants)
        x += amp * np.sin(2 * np.pi * f * t + rng.uniform(0, 2 * np.pi))
    x += 0.01 * rng.randn(len(t))
    return (x / np.max(np.abs(x))).astype(np.float32)


SPK_A = dict(f0=110.0, formants=[(500, 80), (1500, 120), (2500, 160)])
SPK_B = dict(f0=220.0, formants=[(800, 100), (1200, 150), (3200, 200)])


def test_speaker_similarity_same_vs_cross():
    a1 = _voice(**SPK_A, seed=1)
    a2 = _voice(**SPK_A, seed=2)  # same speaker, different phases/noise
    b1 = _voice(**SPK_B, seed=3)
    same = speaker_similarity(a1, a2)
    cross = speaker_similarity(a1, b1)
    assert same > cross + 0.1, (same, cross)
    assert same > 0.9, same


def test_speaker_similarity_loudness_invariant():
    a1 = _voice(**SPK_A, seed=1)
    assert speaker_similarity(a1, 0.1 * a1) > 0.99


def test_speaker_similarity_short_input_nan():
    a = _voice(**SPK_A, seed=1)
    assert np.isnan(speaker_similarity(a[:512], a))


def test_mcd_identity_and_monotone():
    x = _voice(**SPK_A, seed=5)
    assert mel_cepstral_distance(x, x) == pytest.approx(0.0, abs=1e-9)
    rng = np.random.RandomState(0)
    small = mel_cepstral_distance(x, x + 0.003 * rng.randn(len(x)))
    big = mel_cepstral_distance(x, x + 0.1 * rng.randn(len(x)))
    assert 0 < small < big


def test_mfcc_shape():
    x = _voice(**SPK_A, seed=1)
    c = mfcc(x, sr=SR)
    assert c.ndim == 2 and c.shape[1] == 20
    assert np.isfinite(c).all()


def test_tts_metrics_keys():
    gen = _voice(**SPK_A, seed=1)
    m = tts_metrics(gen, prompt=_voice(**SPK_A, seed=2), sr=SR)
    assert m["gen_seconds"] == pytest.approx(1.0, rel=1e-3)
    assert "speaker_cos" in m
    assert "speaker_cos" not in tts_metrics(gen, prompt=None)


def test_held_out_token_nll_untrained_is_log_v():
    """An untrained LM's per-token NLL must sit near log(V+1) (uniform over
    codebook_size+1 logits), and n_tokens must count (Lc+1) x nq valid
    positions."""
    from test_dp_exactness import _laura_tiny

    import jax

    model = _laura_tiny()
    params = model.init(jax.random.PRNGKey(0))
    rs = np.random.RandomState(0)
    batch = {
        "text": rs.randn(4, 6, 20).astype(np.float32),
        "text_lengths": np.array([6, 5, 4, 6], np.int32),
        "codec": rs.randint(0, 64, (4, 10, 8)).astype(np.int32),
        "codec_lengths": np.array([10, 8, 9, 7], np.int32),
    }
    rep = held_out_token_nll(model, params, [batch])
    v = model.cfg.codebook_size + 1
    assert abs(rep["token_nll"] - np.log(v)) < 1.5, rep
    want_tokens = int(np.sum(batch["codec_lengths"] + 1)) * model.cfg.predict_nq
    assert rep["n_tokens"] == want_tokens
    assert rep["token_ppl"] == pytest.approx(np.exp(rep["token_nll"]))
