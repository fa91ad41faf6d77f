"""Objective reconstruction-quality metrics (the recipe's ViSQOL role).

The reference scores codec reconstructions with dockerized ViSQOL
(/root/reference/egs/LibriTTS/codec/run.sh:249-295); docker is absent here,
so these native metrics make the <=0.05-ViSQOL-delta north star trackable:

- log-spectral distance (LSD, dB): the standard codec-distortion measure,
  sqrt(mean_f (10 log10 Pref/Pdeg)^2) averaged over frames;
- multi-scale log-mel distortion: L1 over log10-mel at windows 2^6..2^10
  (same frontend family as the training loss, codec_basic.py:522-540);
- SI-SNR (dB): scale-invariant waveform fidelity;
- STOI (Taal 2011): perceptual intelligibility over one-third-octave
  envelopes;
- NSIM over a gammatone spectrogram: ViSQOL v3's similarity core (see the
  NSIM section below) — the nearest native unit to the recipe's ViSQOL
  acceptance numbers.

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


# -- STOI: the native perceptual metric (ViSQOL's acceptance role) -----------
#
# Short-Time Objective Intelligibility (Taal, Hendriks, Heusdens, Jensen,
# "An Algorithm for Intelligibility Prediction of Time-Frequency Weighted
# Noisy Speech", IEEE TASLP 2011). Unlike LSD/mel-L1 above, STOI is a
# *perceptual* model — one-third-octave auditory bands, 384 ms temporal
# envelopes, clipped normalized correlation — and correlates monotonically
# with listening scores. This makes the BASELINE "<=0.05 ViSQOL delta" north
# star trackable in a perceptual unit: report stoi(ref, fp32_recon) vs
# stoi(ref, bf16_recon) and look at the delta. Validated in
# tests/test_quality_stoi.py for monotonicity on additive-noise and n_q
# (bitrate) anchor sweeps.

_STOI_FS = 10_000  # internal rate the 2011 paper fixes
_STOI_FRAME = 256  # 25.6 ms analysis window
_STOI_NFFT = 512
_STOI_NBANDS = 15  # one-third octave bands from 150 Hz
_STOI_MINFREQ = 150.0
_STOI_SEG = 30  # frames per intermediate-intelligibility segment (384 ms)
_STOI_BETA_DB = -15.0  # lower SDR clip bound
_STOI_DYN_RANGE = 40.0  # silent-frame energy threshold below peak, dB


def _third_octave_band_matrix() -> np.ndarray:
    """(15, 257) boolean band matrix over the 512-point rfft bins."""
    f = np.linspace(0, _STOI_FS / 2, _STOI_NFFT // 2 + 1)
    k = np.arange(_STOI_NBANDS, dtype=np.float64)
    cf = _STOI_MINFREQ * 2.0 ** (k / 3.0)
    lo = cf * 2.0 ** (-1.0 / 6.0)
    hi = cf * 2.0 ** (1.0 / 6.0)
    # each bin joins the band whose [lo, hi) interval contains it (paper uses
    # nearest-edge rounding; interval membership is equivalent on this grid)
    mat = (f[None, :] >= lo[:, None]) & (f[None, :] < hi[:, None])
    return mat.astype(np.float64)


def _stoi_frames(x: np.ndarray) -> np.ndarray:
    """50%-overlap hann frames, (n_frames, 256)."""
    hop = _STOI_FRAME // 2
    if len(x) < _STOI_FRAME:
        x = np.pad(x, (0, _STOI_FRAME - len(x)))
    n_frames = 1 + (len(x) - _STOI_FRAME) // hop
    idx = np.arange(_STOI_FRAME)[None, :] + hop * np.arange(n_frames)[:, None]
    return x[idx] * np.hanning(_STOI_FRAME)[None, :]


def stoi(ref: np.ndarray, deg: np.ndarray, sr: int = 16000) -> float:
    """STOI in [~0, 1] (higher is better; clean speech ~1.0).

    Mirrors the reference implementation's stages: resample to 10 kHz,
    remove frames >40 dB below the loudest frame (mask decided on the
    CLEAN signal, applied to both), 15-band one-third-octave envelopes,
    384 ms segments, normalization + (1+10^(-beta/20)) clipping, mean
    correlation.
    """
    from funcodec_tpu.data.wav_io import resample

    ref, deg = _align(ref, deg)
    if sr != _STOI_FS:
        ref = resample(ref.astype(np.float32), sr, _STOI_FS).astype(np.float64)
        deg = resample(deg.astype(np.float32), sr, _STOI_FS).astype(np.float64)

    xf = _stoi_frames(ref)
    yf = _stoi_frames(deg)
    energy_db = 20.0 * np.log10(np.linalg.norm(xf, axis=-1) + 1e-12)
    keep = energy_db > (energy_db.max() - _STOI_DYN_RANGE)
    xf, yf = xf[keep], yf[keep]
    if xf.shape[0] < _STOI_SEG:
        # too short for one 384 ms segment: fall back to one ragged segment
        seg_len = max(2, xf.shape[0])
    else:
        seg_len = _STOI_SEG

    spec_x = np.fft.rfft(xf, n=_STOI_NFFT, axis=-1)
    spec_y = np.fft.rfft(yf, n=_STOI_NFFT, axis=-1)
    band = _third_octave_band_matrix()  # (15, F)
    # band envelope: sqrt of band-summed power, (frames, 15)
    ex = np.sqrt((spec_x.real**2 + spec_x.imag**2) @ band.T)
    ey = np.sqrt((spec_y.real**2 + spec_y.imag**2) @ band.T)

    n_frames = ex.shape[0]
    if n_frames < 2:
        return float("nan")
    clip_fac = 10.0 ** (-_STOI_BETA_DB / 20.0)
    corrs = []
    for m in range(seg_len, n_frames + 1):
        xs = ex[m - seg_len : m]  # (N, 15)
        ys = ey[m - seg_len : m]
        # per-band normalization of the degraded segment to the clean energy
        alpha = np.linalg.norm(xs, axis=0, keepdims=True) / (
            np.linalg.norm(ys, axis=0, keepdims=True) + 1e-12
        )
        ys_n = np.minimum(ys * alpha, xs * (1.0 + clip_fac))
        xs_c = xs - xs.mean(axis=0, keepdims=True)
        ys_c = ys_n - ys_n.mean(axis=0, keepdims=True)
        denom = np.linalg.norm(xs_c, axis=0) * np.linalg.norm(ys_c, axis=0)
        corrs.append(np.sum(xs_c * ys_c, axis=0) / (denom + 1e-12))
    return float(np.mean(np.stack(corrs)))


# -- NSIM over a gammatone spectrogram: ViSQOL v3's similarity core ----------
#
# ViSQOL v3 (Chinen et al., "ViSQOL v3: An Open Source Production Ready
# Objective Speech and Audio Metric", QoMEX 2020) scores a degraded signal by
# (1) computing gammatone spectrograms of reference and degraded, (2)
# comparing aligned patches with NSIM — the Neurogram Similarity Index
# Measure (Hines & Harte, Speech Communication 2012), an SSIM adaptation
# with luminance+structure terms over a 3x3 Gaussian window — and (3)
# mapping mean NSIM to MOS with a fitted SVR. Codec reconstructions are
# already time-aligned, so (2) needs no patch search here, and we report the
# RAW mean NSIM in [~0, 1] rather than a MOS (the SVR weights are data, not
# algorithm). This is the closest in-environment stand-in for the recipe's
# ViSQOL acceptance harness (run.sh:249-295): deltas of this number play the
# role of the <=0.05-ViSQOL-delta north star (BASELINE.json).


def _hz_to_erbnum(f):
    return 21.4 * np.log10(1.0 + 4.37 * f / 1000.0)


def _erbnum_to_hz(e):
    return (10.0 ** (e / 21.4) - 1.0) * 1000.0 / 4.37


def _gammatone_power_weights(
    sr: int, n_fft: int, n_bands: int, fmin: float, fmax: float
) -> np.ndarray:
    """(n_bands, F) power-domain weights of a 4th-order gammatone bank.

    Magnitude response of an order-N gammatone centred at fc with bandwidth
    b = 1.019 ERB(fc) is |H(f)| ~ [1 + ((f-fc)/b)^2]^(-N/2); squared for
    power and peak-normalised per band. Centre frequencies are ERB-spaced
    (the same spacing ViSQOL's gammatone filterbank uses)."""
    f = np.linspace(0.0, sr / 2.0, n_fft // 2 + 1)
    cfs = _erbnum_to_hz(
        np.linspace(_hz_to_erbnum(fmin), _hz_to_erbnum(fmax), n_bands)
    )
    erb = 24.7 * (4.37 * cfs / 1000.0 + 1.0)
    b = 1.019 * erb
    u = (f[None, :] - cfs[:, None]) / b[:, None]
    w = (1.0 + u**2) ** -4.0  # |H|^2 of a 4th-order filter
    return w / w.max(axis=1, keepdims=True)


def _gammatonegram_db(
    x: np.ndarray, sr: int, n_fft: int, hop: int, n_bands: int,
    fmin: float, fmax: float,
) -> np.ndarray:
    p = _stft_mag(x, n_fft, hop)  # (frames, F) power
    w = _gammatone_power_weights(sr, n_fft, n_bands, fmin, fmax)
    g = p @ w.T  # (frames, bands)
    return 10.0 * np.log10(np.maximum(g, 1e-12))


def _gauss3_filter(img: np.ndarray) -> np.ndarray:
    """Separable 3x3 Gaussian (sigma=0.5, NSIM's window) with edge padding."""
    k = np.array([np.exp(-2.0), 1.0, np.exp(-2.0)])
    k = k / k.sum()
    pad = np.pad(img, ((1, 1), (0, 0)), mode="edge")
    img = k[0] * pad[:-2] + k[1] * pad[1:-1] + k[2] * pad[2:]
    pad = np.pad(img, ((0, 0), (1, 1)), mode="edge")
    return k[0] * pad[:, :-2] + k[1] * pad[:, 1:-1] + k[2] * pad[:, 2:]


def nsim(
    ref: np.ndarray,
    deg: np.ndarray,
    sr: int = 16000,
    n_fft: int = 512,
    hop: int = 256,
    n_bands: int = 32,
    fmin: float = 50.0,
) -> float:
    """Mean NSIM in [~0, 1] between gammatone spectrograms (higher = better).

    l(r,d) = (2 mu_r mu_d + C1) / (mu_r^2 + mu_d^2 + C1)
    s(r,d) = (cov + C2) / (sig_r sig_d + C2),  NSIM = mean(l * s)
    with local moments from a 3x3 Gaussian window and C1=(0.01 L)^2,
    C2=(0.03 L)^2 / 2 over the intensity range L (Hines & Harte 2012)."""
    ref, deg = _align(ref, deg)
    fmax = min(sr / 2.0, 12_000.0)
    r = _gammatonegram_db(ref, sr, n_fft, hop, n_bands, fmin, fmax)
    d = _gammatonegram_db(deg, sr, n_fft, hop, n_bands, fmin, fmax)
    # shared floor 60 dB below the reference peak, as silence-vs-silence
    # agreement should not be rewarded more than signal agreement
    lo = r.max() - 60.0
    r = np.maximum(r, lo) - lo
    d = np.maximum(d, lo) - lo
    L = max(float(r.max()), 1.0)
    c1 = (0.01 * L) ** 2
    c2 = (0.03 * L) ** 2 / 2.0

    mu_r = _gauss3_filter(r)
    mu_d = _gauss3_filter(d)
    var_r = np.maximum(_gauss3_filter(r * r) - mu_r**2, 0.0)
    var_d = np.maximum(_gauss3_filter(d * d) - mu_d**2, 0.0)
    cov = _gauss3_filter(r * d) - mu_r * mu_d
    lum = (2.0 * mu_r * mu_d + c1) / (mu_r**2 + mu_d**2 + c1)
    struct = (cov + c2) / (np.sqrt(var_r) * np.sqrt(var_d) + c2)
    return float(np.mean(lum * struct))


def reconstruction_metrics(
    ref: np.ndarray, deg: np.ndarray, sr: int = 16000
) -> Dict[str, float]:
    """All metrics for one (reference, reconstruction) pair."""
    return {
        "lsd_db": log_spectral_distance(ref, deg),
        "mel_distortion": mel_distortion(ref, deg, sr=sr),
        "si_snr_db": si_snr(ref, deg),
        "stoi": stoi(ref, deg, sr=sr),
        "nsim": nsim(ref, deg, sr=sr),
    }
