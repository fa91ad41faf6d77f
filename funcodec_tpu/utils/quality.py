"""Objective reconstruction-quality metrics (the recipe's ViSQOL role).

The reference scores codec reconstructions with dockerized ViSQOL
(/root/reference/egs/LibriTTS/codec/run.sh:249-295); docker is absent here,
so these native metrics make the <=0.05-ViSQOL-delta north star trackable:

- log-spectral distance (LSD, dB): the standard codec-distortion measure,
  sqrt(mean_f (10 log10 Pref/Pdeg)^2) averaged over frames;
- multi-scale log-mel distortion: L1 over log10-mel at windows 2^6..2^10
  (same frontend family as the training loss, codec_basic.py:522-540);
- SI-SNR (dB): scale-invariant waveform fidelity.

All pure numpy/jax host-callable, no external wheels. Reported per-epoch on
the validation dump (train/gan_trainer.py:validate) and by
cli/codec_eval.py over arbitrary ref/deg wav pairs.
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence

import numpy as np


def _stft_mag(x: np.ndarray, n_fft: int, hop: int) -> np.ndarray:
    """|STFT|^2 via numpy (host metric path; no device round-trips)."""
    if len(x) < n_fft:
        x = np.pad(x, (0, n_fft - len(x)))
    n_frames = 1 + (len(x) - n_fft) // hop
    idx = np.arange(n_fft)[None, :] + hop * np.arange(n_frames)[:, None]
    frames = x[idx] * np.hanning(n_fft)[None, :]
    spec = np.fft.rfft(frames, axis=-1)
    return (spec.real**2 + spec.imag**2).astype(np.float64)  # (frames, F)


def _align(ref: np.ndarray, deg: np.ndarray):
    n = min(len(ref), len(deg))
    return ref[:n].astype(np.float64), deg[:n].astype(np.float64)


def log_spectral_distance(
    ref: np.ndarray, deg: np.ndarray, n_fft: int = 1024, hop: int = 256
) -> float:
    """LSD in dB (lower is better; transparent codecs sit < 1 dB)."""
    ref, deg = _align(ref, deg)
    p_ref = _stft_mag(ref, n_fft, hop)
    p_deg = _stft_mag(deg, n_fft, hop)
    # shared floor 80 dB below the signal peak: bins with no real energy in
    # either signal must not dominate the distance (pure tones would
    # otherwise score tens of dB from noise-floor-only bins)
    floor = max(p_ref.max(), p_deg.max(), 1e-10) * 1e-8
    p_ref = np.maximum(p_ref, floor)
    p_deg = np.maximum(p_deg, floor)
    d = 10.0 * (np.log10(p_ref) - np.log10(p_deg))
    return float(np.mean(np.sqrt(np.mean(d**2, axis=-1))))


def _mel_filter(sr: int, n_fft: int, n_mels: int) -> np.ndarray:
    from funcodec_tpu.ops.stft import mel_filterbank

    return np.asarray(mel_filterbank(sr, n_fft, n_mels), np.float64)


def mel_distortion(
    ref: np.ndarray,
    deg: np.ndarray,
    sr: int = 16000,
    window_powers: Sequence[int] = (6, 7, 8, 9, 10),
) -> float:
    """Multi-scale mean |log10-mel(ref) - log10-mel(deg)| (lower is better)."""
    ref, deg = _align(ref, deg)
    total = 0.0
    for p in window_powers:
        n_fft = 2**p
        hop = n_fft // 4
        n_mels = min(64, n_fft // 8)
        mel = _mel_filter(sr, n_fft, n_mels)
        m_ref = np.log10(np.maximum(_stft_mag(ref, n_fft, hop) @ mel.T, 1e-10))
        m_deg = np.log10(np.maximum(_stft_mag(deg, n_fft, hop) @ mel.T, 1e-10))
        total += float(np.mean(np.abs(m_ref - m_deg)))
    return total / len(window_powers)


def si_snr(ref: np.ndarray, deg: np.ndarray) -> float:
    """Scale-invariant SNR in dB (higher is better)."""
    ref, deg = _align(ref, deg)
    ref = ref - ref.mean()
    deg = deg - deg.mean()
    dot = float(np.dot(deg, ref))
    s_target = dot / (float(np.dot(ref, ref)) + 1e-12) * ref
    e = deg - s_target
    return float(
        10.0 * np.log10(
            (np.dot(s_target, s_target) + 1e-12) / (np.dot(e, e) + 1e-12)
        )
    )


def reconstruction_metrics(
    ref: np.ndarray, deg: np.ndarray, sr: int = 16000
) -> Dict[str, float]:
    """All metrics for one (reference, reconstruction) pair."""
    return {
        "lsd_db": log_spectral_distance(ref, deg),
        "mel_distortion": mel_distortion(ref, deg, sr=sr),
        "si_snr_db": si_snr(ref, deg),
    }
