"""Kaldi-compatible log-mel fbank frontend + LFR + CMVN.

Behavioral reference: funcodec/models/frontend/wav_frontend.py:78
(torchaudio.compliance.kaldi.fbank -> apply_lfr -> apply_cmvn) and
funcodec/models/frontend/default.py:19 (STFT+mel default frontend).

Implements the Kaldi fbank pipeline (snip_edges, DC removal, pre-emphasis
0.97, povey window, HTK mel scale 1127*ln(1+f/700)) in pure JAX; dither
defaults to 0 for determinism.
"""

from __future__ import annotations

import functools
import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=8)
def _dft_basis_np(frame_len: int, n_fft: int) -> Tuple[np.ndarray, np.ndarray]:
    """Real-DFT basis (frame_len, n_fft//2+1) for right-zero-padded frames;
    numpy so the cache never holds traced/device arrays."""
    n = np.arange(frame_len, dtype=np.float64)
    k = np.arange(n_fft // 2 + 1, dtype=np.float64)
    ang = -2.0 * np.pi * np.outer(n, k) / n_fft
    return np.cos(ang).astype(np.float32), np.sin(ang).astype(np.float32)


def _next_pow2(n: int) -> int:
    return 1 << (n - 1).bit_length()


@functools.lru_cache(maxsize=8)
def _povey_window(length: int) -> np.ndarray:
    n = np.arange(length)
    hann = 0.5 - 0.5 * np.cos(2 * math.pi * n / (length - 1))
    return (hann**0.85).astype(np.float32)


@functools.lru_cache(maxsize=8)
def kaldi_mel_banks(
    num_bins: int, n_fft: int, sample_rate: int,
    low_freq: float = 20.0, high_freq: float = 0.0,
) -> np.ndarray:
    """Kaldi mel filterbank (HTK scale, no area normalization)."""
    if high_freq <= 0:
        high_freq = sample_rate / 2.0 + high_freq

    def mel(f):
        return 1127.0 * np.log(1.0 + np.asarray(f, np.float64) / 700.0)

    mel_low, mel_high = mel(low_freq), mel(high_freq)
    mel_points = np.linspace(mel_low, mel_high, num_bins + 2)
    fft_freqs = np.arange(n_fft // 2 + 1) * sample_rate / n_fft
    fft_mels = mel(fft_freqs)
    banks = np.zeros((num_bins, n_fft // 2 + 1), np.float32)
    for b in range(num_bins):
        left, center, right = mel_points[b], mel_points[b + 1], mel_points[b + 2]
        up = (fft_mels - left) / (center - left)
        down = (right - fft_mels) / (right - center)
        banks[b] = np.maximum(0.0, np.minimum(up, down))
    return banks


def fbank(
    wav: jnp.ndarray,  # (B, T) float in [-1, 1]
    sample_rate: int = 16000,
    num_mel_bins: int = 80,
    frame_length_ms: float = 25.0,
    frame_shift_ms: float = 10.0,
    preemphasis: float = 0.97,
    remove_dc_offset: bool = True,
    use_log_fbank: bool = True,
    input_scale: float = 32768.0,
) -> jnp.ndarray:
    """(B, T) -> (B, frames, num_mel_bins) Kaldi-style log-mel.

    `input_scale` matches wav_frontend.py (waveform * 2**15 before fbank).
    """
    x = wav.astype(jnp.float32) * input_scale
    frame_len = int(sample_rate * frame_length_ms / 1000)
    shift = int(sample_rate * frame_shift_ms / 1000)
    n_fft = _next_pow2(frame_len)
    T = x.shape[-1]
    n_frames = 1 + (T - frame_len) // shift  # snip_edges=True
    idx = jnp.arange(n_frames)[:, None] * shift + jnp.arange(frame_len)[None, :]
    frames = x[:, idx]  # (B, F, L)
    if remove_dc_offset:
        frames = frames - jnp.mean(frames, axis=-1, keepdims=True)
    if preemphasis > 0:
        first = frames[..., :1] - preemphasis * frames[..., :1]
        rest = frames[..., 1:] - preemphasis * frames[..., :-1]
        frames = jnp.concatenate([first, rest], axis=-1)
    frames = frames * jnp.asarray(_povey_window(frame_len))
    # right-zero-padded real DFT as two MXU matmuls instead of jnp.fft.rfft
    # (XLA lowers FFT poorly on TPU; see ops/stft.py:_windowed_dft_basis)
    cos_b, sin_b = _dft_basis_np(frame_len, n_fft)
    re = jnp.matmul(frames, jnp.asarray(cos_b),
                    precision=jax.lax.Precision.HIGHEST)
    im = jnp.matmul(frames, jnp.asarray(sin_b),
                    precision=jax.lax.Precision.HIGHEST)
    power = re**2 + im**2
    banks = jnp.asarray(kaldi_mel_banks(num_mel_bins, n_fft, sample_rate))
    mel = jnp.einsum("mf,btf->btm", banks, power)
    if use_log_fbank:
        mel = jnp.log(jnp.maximum(mel, 1.1920928955078125e-07))  # kaldi epsilon
    return mel


def apply_lfr(feats: jnp.ndarray, lfr_m: int = 7, lfr_n: int = 6) -> jnp.ndarray:
    """Low-frame-rate stacking (wav_frontend apply_lfr): left-pad with the
    first frame, stack lfr_m frames every lfr_n."""
    B, T, D = feats.shape
    left = (lfr_m - 1) // 2
    padded = jnp.concatenate(
        [jnp.repeat(feats[:, :1], left, axis=1), feats], axis=1
    )
    Tp = padded.shape[1]
    n_out = int(np.ceil(T / lfr_n))
    # pad right with the last frame so every window is full
    need = (n_out - 1) * lfr_n + lfr_m
    if need > Tp:
        padded = jnp.concatenate(
            [padded, jnp.repeat(padded[:, -1:], need - Tp, axis=1)], axis=1
        )
    idx = jnp.arange(n_out)[:, None] * lfr_n + jnp.arange(lfr_m)[None, :]
    return padded[:, idx].reshape(B, n_out, lfr_m * D)


def load_kaldi_cmvn(path: str) -> Tuple[np.ndarray, np.ndarray]:
    """Parse a kaldi text cmvn stats matrix -> (add_shift, rescale)."""
    with open(path) as f:
        text = f.read()
    nums = text.replace("[", " ").replace("]", " ").split()
    vals = [float(v) for v in nums if _is_float(v)]
    arr = np.asarray(vals, np.float64)
    dim = len(arr) // 2 - 1
    sums = arr[:dim]
    count = arr[dim]
    sq = arr[dim + 1 : 2 * dim + 1]
    mean = sums / count
    var = sq / count - mean**2
    return (-mean).astype(np.float32), (1.0 / np.sqrt(np.maximum(var, 1e-20))).astype(np.float32)


def _is_float(s: str) -> bool:
    try:
        float(s)
        return True
    except ValueError:
        return False


def apply_cmvn(feats: jnp.ndarray, shift: np.ndarray, scale: np.ndarray) -> jnp.ndarray:
    return (feats + jnp.asarray(shift)) * jnp.asarray(scale)


class WavFrontend:
    """fbank -> LFR -> CMVN (wav_frontend.py:78)."""

    def __init__(
        self,
        fs: int = 16000,
        n_mels: int = 80,
        frame_length: float = 25.0,
        frame_shift: float = 10.0,
        lfr_m: int = 1,
        lfr_n: int = 1,
        cmvn_file: Optional[str] = None,
    ):
        self.fs = fs
        self.n_mels = n_mels
        self.frame_length = frame_length
        self.frame_shift = frame_shift
        self.lfr_m = lfr_m
        self.lfr_n = lfr_n
        self.cmvn = load_kaldi_cmvn(cmvn_file) if cmvn_file else None

    def output_size(self) -> int:
        return self.n_mels * self.lfr_m

    def __call__(self, wav: jnp.ndarray) -> jnp.ndarray:
        feats = fbank(
            wav, self.fs, self.n_mels, self.frame_length, self.frame_shift
        )
        if self.lfr_m > 1 or self.lfr_n > 1:
            feats = apply_lfr(feats, self.lfr_m, self.lfr_n)
        if self.cmvn is not None:
            feats = apply_cmvn(feats, *self.cmvn)
        return feats
