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


@functools.lru_cache(maxsize=64)
def _ola_envelope(
    win_length: int, n_fft: int, hop_length: int, n_frames: int
) -> np.ndarray:
    """Summed squared-window envelope for istft normalization (numpy — it
    depends only on shapes, so it's a compile-time constant)."""
    p0 = (n_fft - win_length) // 2
    m = np.arange(win_length, dtype=np.float64)
    w2 = (0.5 * (1.0 - np.cos(2.0 * np.pi * m / win_length))) ** 2
    total = n_fft + hop_length * (n_frames - 1)
    env = np.zeros((total,), np.float64)
    pos = np.arange(n_frames)[:, None] * hop_length + np.arange(win_length) + p0
    np.add.at(env, pos, np.broadcast_to(w2, (n_frames, win_length)))
    return env.astype(np.float32)


@functools.lru_cache(maxsize=32)
def _inverse_dft_basis(win_length: int, n_fft: int):
    """Inverse real-DFT basis (n_fft//2+1, win_length), window NOT folded in.

    irfft(X)[n] = (1/N) * sum_k c_k (Re X[k] cos(2pi k n/N) - Im X[k]
    sin(2pi k n/N)), c_k = 2 except 1 at k=0 and k=N/2. Only the window's
    span n in [p0, p0+win) survives the windowing, so the basis covers just
    those columns. Numpy (device caching would leak tracers).
    """
    p0 = (n_fft - win_length) // 2
    k = np.arange(n_fft // 2 + 1, dtype=np.float64)
    c = np.full_like(k, 2.0)
    c[0] = 1.0
    if n_fft % 2 == 0:
        c[-1] = 1.0
    n = np.arange(win_length, dtype=np.float64) + p0
    ang = 2.0 * np.pi * np.outer(k, n) / n_fft
    inv_cos = (c[:, None] * np.cos(ang) / n_fft).astype(np.float32)
    inv_sin = (-c[:, None] * np.sin(ang) / n_fft).astype(np.float32)
    return inv_cos, inv_sin


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
    normalized by the summed squared window envelope. The inverse DFT is two
    MXU matmuls over the window's span (see _inverse_dft_basis) instead of
    jnp.fft.irfft, which XLA lowers poorly on TPU and which crashed the
    remote compile helper at serving batch sizes.
    """
    win_length = win_length or n_fft
    p0 = (n_fft - win_length) // 2
    window = hann_window(win_length, jnp.float32)
    sp = jnp.swapaxes(spec, -1, -2)  # (..., n_frames, F)
    inv_cos_np, inv_sin_np = _inverse_dft_basis(win_length, n_fft)
    frames = (
        jnp.matmul(jnp.real(sp).astype(jnp.float32), jnp.asarray(inv_cos_np),
                   precision=jax.lax.Precision.HIGHEST)
        + jnp.matmul(jnp.imag(sp).astype(jnp.float32), jnp.asarray(inv_sin_np),
                     precision=jax.lax.Precision.HIGHEST)
    )
    frames = frames * window  # (..., n_frames, win_length)

    n_frames = frames.shape[-2]
    total = n_fft + hop_length * (n_frames - 1)
    batch_shape = frames.shape[:-2]

    flat = frames.reshape((-1, n_frames, win_length))
    # overlap-add without scatter: split each frame into ceil(win/hop)
    # hop-wide chunks; chunk j of all frames concatenates into ONE contiguous
    # segment starting at p0 + j*hop, so the whole OA is a handful of
    # static-slice adds (XLA pad+add, no serialized scatter — the scatter
    # form cost 42 ms alone at B=64 on v5e)
    n_chunks = -(-win_length // hop_length)
    total_pad = total + hop_length  # room for the zero-padded last chunk
    out = jnp.zeros((flat.shape[0], total_pad), flat.dtype)
    for j in range(n_chunks):
        w = min(hop_length, win_length - j * hop_length)
        chunk = flat[:, :, j * hop_length : j * hop_length + w]
        if w < hop_length:
            chunk = jnp.pad(chunk, ((0, 0), (0, 0), (0, hop_length - w)))
        seg = chunk.reshape(flat.shape[0], n_frames * hop_length)
        start = p0 + j * hop_length
        out = out.at[:, start : start + n_frames * hop_length].add(seg)
    out = out[:, :total]
    # the window-squared envelope depends only on shapes: numpy constant
    env = jnp.asarray(
        _ola_envelope(win_length, n_fft, hop_length, n_frames)
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
