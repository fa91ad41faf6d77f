"""STFT / inverse STFT / mel filterbanks, matching the reference's torch and
librosa semantics.

Behavioral references:
- Audio2Mel: funcodec/models/codec_basic.py:25-71 (reflect pad, torch.stft
  center=False, power spectrum, librosa slaney mel, log10 clamp 1e-5)
- Discriminator spectrogram: torchaudio Spectrogram(normalized=True,
  center=False, power=None) in funcodec/models/discriminator/encodec_disc.py:62-64
- FreqCodec domains: torchaudio Spectrogram/InverseSpectrogram(center=True)
  in funcodec/models/codec_freq.py:150-210

TPU notes: framing is a reshape-free gather + one batched matmul-like rfft
(XLA lowers FFTs natively); the mel projection is a single MXU matmul.
"""

from __future__ import annotations

import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


def hann_window(win_length: int, dtype=jnp.float32) -> jnp.ndarray:
    """torch.hann_window(periodic=True)."""
    n = jnp.arange(win_length, dtype=dtype)
    return 0.5 * (1.0 - jnp.cos(2.0 * math.pi * n / win_length))


def _padded_window(win_length: int, n_fft: int, dtype=jnp.float32) -> jnp.ndarray:
    """torch.stft zero-pads a short window symmetrically to n_fft."""
    w = hann_window(win_length, dtype)
    if win_length < n_fft:
        left = (n_fft - win_length) // 2
        w = jnp.pad(w, (left, n_fft - win_length - left))
    return w


def frame_signal(x: jnp.ndarray, frame_length: int, hop: int) -> jnp.ndarray:
    """(..., T) -> (..., n_frames, frame_length) via strided gather."""
    t = x.shape[-1]
    n_frames = 1 + (t - frame_length) // hop
    idx = (jnp.arange(n_frames)[:, None] * hop) + jnp.arange(frame_length)[None, :]
    return x[..., idx]


@functools.lru_cache(maxsize=32)
def _windowed_dft_basis(win_length: int, n_fft: int):
    """Real-DFT basis folded with the (zero-padded) hann window.

    torch.stft zero-pads a short window symmetrically to n_fft, so only
    `win_length` samples of each n_fft frame contribute:
      X[t, k] = sum_{m<win} x[t*hop + p0 + m] * w[m] * e^{-2pi i k (m+p0)/N}
    with p0 = (n_fft - win)//2. Expressing this as one (win, F) matmul per
    part keeps the FLOPs trivial (~8k/sample at hop=win/4) and avoids
    jnp.fft.rfft, which XLA lowers poorly on TPU (measured 194 ms for the
    6-scale mel loss grad at B=32x40960 vs ~2 GFLOP of actual math).
    Returns (cos_basis, sin_basis) as (win, n_fft//2+1) fp32 arrays.
    """
    p0 = (n_fft - win_length) // 2
    m = np.arange(win_length, dtype=np.float64)
    w = 0.5 * (1.0 - np.cos(2.0 * np.pi * m / win_length))
    k = np.arange(n_fft // 2 + 1, dtype=np.float64)
    ang = -2.0 * np.pi * np.outer(m + p0, k) / n_fft
    cos_b = (w[:, None] * np.cos(ang)).astype(np.float32)
    sin_b = (w[:, None] * np.sin(ang)).astype(np.float32)
    # return NUMPY arrays: caching device arrays would leak tracers/constants
    # across jit traces (the caller jnp.asarray's them per trace)
    return cos_b, sin_b


def stft(
    x: jnp.ndarray,
    n_fft: int,
    hop_length: int,
    win_length: Optional[int] = None,
    center: bool = True,
    normalized: bool = False,
    pad_mode: str = "reflect",
) -> jnp.ndarray:
    """Complex STFT of (..., T) -> (..., n_fft//2+1, n_frames).

    Matches torch.stft / torchaudio.transforms.Spectrogram(power=None):
    `normalized=True` divides by sqrt(sum(window^2)) (torchaudio
    'window' normalization). Computed as a windowed-DFT matmul on the MXU
    (see _windowed_dft_basis) rather than jnp.fft.rfft.
    """
    win_length = win_length or n_fft
    if center:
        pad = n_fft // 2
        widths = [(0, 0)] * (x.ndim - 1) + [(pad, pad)]
        x = jnp.pad(x, widths, mode=pad_mode)
    t = x.shape[-1]
    n_frames = 1 + (t - n_fft) // hop_length
    p0 = (n_fft - win_length) // 2
    # frame only the window's span of each n_fft frame (the rest is zeroed
    # by the padded window anyway)
    span = (n_frames - 1) * hop_length + win_length
    frames = frame_signal(
        x[..., p0 : p0 + span].astype(jnp.float32), win_length, hop_length
    )
    cos_np, sin_np = _windowed_dft_basis(win_length, n_fft)
    cos_b, sin_b = jnp.asarray(cos_np), jnp.asarray(sin_np)
    # fp32 accumulation: parity with torch.stft (TPU default matmul would
    # round inputs to bf16); the FLOPs are negligible either way
    re = jnp.matmul(frames, cos_b, precision=jax.lax.Precision.HIGHEST)
    im = jnp.matmul(frames, sin_b, precision=jax.lax.Precision.HIGHEST)
    spec = jax.lax.complex(re, im)  # (..., n_frames, F)
    if normalized:
        w = hann_window(win_length, jnp.float32)
        spec = spec / jnp.sqrt(jnp.sum(w**2))
    return jnp.swapaxes(spec, -1, -2)  # (..., F, n_frames)


def istft(
    spec: jnp.ndarray,
    n_fft: int,
    hop_length: int,
    win_length: Optional[int] = None,
    center: bool = True,
    length: Optional[int] = None,
) -> jnp.ndarray:
    """Inverse STFT of (..., F, n_frames) -> (..., T).

    Matches torch.istft / torchaudio InverseSpectrogram: windowed overlap-add
    normalized by the summed squared window envelope.
    """
    win_length = win_length or n_fft
    window = _padded_window(win_length, n_fft, jnp.float32)
    frames = jnp.fft.irfft(jnp.swapaxes(spec, -1, -2), n=n_fft, axis=-1)
    frames = frames * window  # (..., n_frames, n_fft)

    n_frames = frames.shape[-2]
    total = n_fft + hop_length * (n_frames - 1)
    batch_shape = frames.shape[:-2]

    flat = frames.reshape((-1, n_frames, n_fft))
    # parallel overlap-add: one scatter-add over precomputed frame positions
    positions = jnp.arange(n_frames)[:, None] * hop_length + jnp.arange(n_fft)[None, :]
    out = jnp.zeros((flat.shape[0], total), flat.dtype).at[:, positions].add(flat)
    env = (
        jnp.zeros((total,), jnp.float32)
        .at[positions]
        .add(jnp.broadcast_to(window**2, (n_frames, n_fft)))
    )

    if center:
        half = n_fft // 2
        out = out[:, half : total - half]
        env = env[half : total - half]
    out = out / jnp.maximum(env, 1e-11)
    out = out.reshape(batch_shape + (out.shape[-1],))
    if length is not None:
        out = out[..., :length]
    return out


@functools.lru_cache(maxsize=32)
def mel_filterbank(
    sr: int,
    n_fft: int,
    n_mels: int,
    fmin: float = 0.0,
    fmax: Optional[float] = None,
) -> np.ndarray:
    """librosa.filters.mel(htk=False, norm='slaney') reimplementation.

    Slaney mel scale: linear below 1 kHz, logarithmic above; triangular
    filters area-normalized by 2/(mel_f[i+2]-mel_f[i]).
    """
    fmax = fmax or sr / 2.0

    def hz_to_mel(f):
        f = np.asarray(f, dtype=np.float64)
        mel = f / (200.0 / 3.0)
        min_log_hz = 1000.0
        min_log_mel = min_log_hz / (200.0 / 3.0)
        logstep = math.log(6.4) / 27.0
        return np.where(f >= min_log_hz, min_log_mel + np.log(np.maximum(f, 1e-10) / min_log_hz) / logstep, mel)

    def mel_to_hz(m):
        m = np.asarray(m, dtype=np.float64)
        f = m * (200.0 / 3.0)
        min_log_hz = 1000.0
        min_log_mel = min_log_hz / (200.0 / 3.0)
        logstep = math.log(6.4) / 27.0
        return np.where(m >= min_log_mel, min_log_hz * np.exp(logstep * (m - min_log_mel)), f)

    fftfreqs = np.linspace(0.0, sr / 2.0, 1 + n_fft // 2)
    mel_pts = np.linspace(hz_to_mel(fmin), hz_to_mel(fmax), n_mels + 2)
    mel_f = mel_to_hz(mel_pts)

    fdiff = np.diff(mel_f)
    ramps = mel_f[:, None] - fftfreqs[None, :]
    lower = -ramps[:-2] / fdiff[:-1][:, None]
    upper = ramps[2:] / fdiff[1:][:, None]
    weights = np.maximum(0.0, np.minimum(lower, upper))
    enorm = 2.0 / (mel_f[2 : n_mels + 2] - mel_f[:n_mels])
    weights *= enorm[:, None]
    return weights.astype(np.float32)


def audio_to_mel(
    audio: jnp.ndarray,  # (B, T)
    n_fft: int,
    hop_length: int,
    win_length: int,
    sampling_rate: int,
    n_mel_channels: int,
    return_power_spec: bool = False,
):
    """Audio2Mel.forward (codec_basic.py:54-71): reflect-pad then center=False
    STFT, power spectrum, slaney mel matmul, log10 clamped at 1e-5."""
    p = (n_fft - hop_length) // 2
    x = jnp.pad(audio, [(0, 0), (p, p)], mode="reflect")
    spec = stft(x, n_fft, hop_length, win_length, center=False, normalized=False)
    power = jnp.real(spec) ** 2 + jnp.imag(spec) ** 2  # (B, F, frames)
    mel_basis = jnp.asarray(mel_filterbank(sampling_rate, n_fft, n_mel_channels))
    mel = jnp.einsum("mf,bft->bmt", mel_basis, power)
    log_mel = jnp.log10(jnp.maximum(mel, 1e-5))
    if return_power_spec:
        log_power = jnp.log10(jnp.maximum(power, 1e-5))
        return log_mel, log_power
    return log_mel


def phase_aug(
    x: jnp.ndarray,  # (B, T)
    key=None,
    n_fft: int = 512,
    hop_length: int = 160,
    var: float = 6.0,
    delta_max: float = 2.0,
    cutoff: float = 0.05,
    kernel_size: int = 128,
    phi: Optional[jnp.ndarray] = None,  # (B, n_fft//2+1) explicit rotation
) -> jnp.ndarray:
    """PhaseAug: magnitude-preserving random phase rotation (ICASSP'23,
    arXiv:2211.04610). Native stand-in for the external `phaseaug` package the
    reference imports for FreqCodec phase-invariant training
    (codec_freq.py:243-249 constructs PhaseAug(nfft=512, hop=160);
    :611-625 feeds phaseaug(real).detach() to the discriminator).

    Each batch element gets a per-frequency-bin rotation
        phi(k) = mu(k) + delta * pi * k / K
    where mu is Gaussian noise (variance `var`) low-pass filtered along the
    frequency axis (windowed-sinc, `cutoff`/`kernel_size` as in the official
    implementation's defaults) so neighbouring bins rotate coherently, and
    the linear term delta ~ U(-delta_max, delta_max) is a fractional time
    shift. |STFT| is exactly preserved on the analysis grid; the waveform is
    resynthesized with the standard ISTFT overlap-add.
    """
    B, T = x.shape
    K = n_fft // 2 + 1
    if phi is None:
        k_mu, k_delta = jax.random.split(key)
        mu = jnp.sqrt(var) * jax.random.normal(k_mu, (B, K), jnp.float32)
        # low-pass along frequency: Hann-windowed sinc kernel, 'same' conv
        n = jnp.arange(kernel_size, dtype=jnp.float32) - (kernel_size - 1) / 2.0
        kern = 2 * cutoff * jnp.sinc(2 * cutoff * n)
        kern = kern * hann_window(kernel_size)
        kern = kern / jnp.sum(kern)
        pad = (kernel_size - 1) // 2
        mu_p = jnp.pad(mu, [(0, 0), (pad, kernel_size - 1 - pad)], mode="edge")
        mu = jax.vmap(lambda row: jnp.convolve(row, kern, mode="valid"))(mu_p)

        delta = jax.random.uniform(
            k_delta, (B, 1), jnp.float32, minval=-delta_max, maxval=delta_max
        )
        phi = mu + delta * jnp.pi * (
            jnp.arange(K, dtype=jnp.float32)[None, :] / (K - 1)
        )
    # DC and Nyquist bins must stay real for a real-valued resynthesis
    phi = phi.at[:, 0].set(0.0).at[:, -1].set(0.0)

    spec = stft(x, n_fft, hop_length)  # (B, K, frames)
    rot = jnp.exp(1j * phi.astype(jnp.complex64))[:, :, None]
    return istft(spec * rot, n_fft, hop_length, length=T).astype(x.dtype)
