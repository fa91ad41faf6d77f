"""HiFiGAN and SoundStream discriminator families.

Behavioral reference: funcodec/models/discriminator/hifigan.py
(HiFiGANPeriodDiscriminator :307-444, HiFiGANMultiPeriodDiscriminator
:444-503, HiFiGANScaleDiscriminator :503-672, HiFiGANMultiScaleDiscriminator
:672-756, HiFiGANMultiScaleMultiPeriodDiscriminator :756-845) and
funcodec/models/discriminator/sound_stream.py (ConvDiscriminator :12-58,
MultiScaleDiscriminator :60-98, ModReLU :100-112, ComplexConv2d :114-147,
ComplexSTFTDiscriminator :149-232).

Notes on reference quirks preserved:
- HiFiGANScaleDiscriminator.apply_weight_norm tests isinstance Conv2d on its
  Conv1d stack (hifigan.py:652-659), so scale discriminators effectively run
  WITHOUT weight norm; period discriminators (Conv2d) do get it.
- Complex convs are computed as real/imag decompositions (TPU has no complex
  conv primitive); logits use |z| (logits_abs=True default).

Waveforms are (B, T); every sub-discriminator returns (logits, [fmaps]).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from jax import lax

from funcodec_tpu.ops.activations import leaky_relu
from funcodec_tpu.ops.conv import fused_kernel
from funcodec_tpu.ops.stft import stft


@dataclasses.dataclass(frozen=True)
class Conv1dSpec:
    in_channels: int
    out_channels: int
    kernel_size: int
    stride: int = 1
    padding: int = 0
    groups: int = 1
    norm: str = "none"  # none | weight_norm


def init_conv1d(key, s: Conv1dSpec):
    fan_in = (s.in_channels // s.groups) * s.kernel_size
    bound = 1.0 / math.sqrt(fan_in)
    k1, k2 = jax.random.split(key)
    kernel = jax.random.uniform(
        k1, (s.kernel_size, s.in_channels // s.groups, s.out_channels),
        jnp.float32, -bound, bound,
    )
    p: Dict[str, Any] = {}
    if s.norm == "weight_norm":
        p["v"] = kernel
        p["g"] = jnp.sqrt(jnp.sum(kernel**2, axis=(0, 1)))
    else:
        p["kernel"] = kernel
    p["bias"] = jax.random.uniform(k2, (s.out_channels,), jnp.float32, -bound, bound)
    return p


def apply_conv1d(s: Conv1dSpec, p, x):
    """x: (B, T, C)."""
    kernel = fused_kernel(p).astype(x.dtype)
    y = lax.conv_general_dilated(
        x, kernel, (s.stride,), [(s.padding, s.padding)],
        dimension_numbers=("NWC", "WIO", "NWC"),
        feature_group_count=s.groups,
    )
    return y + p["bias"].astype(y.dtype)


@dataclasses.dataclass(frozen=True)
class Conv2dSpec:
    in_channels: int
    out_channels: int
    kernel_size: Tuple[int, int]
    stride: Tuple[int, int] = (1, 1)
    padding: Tuple[int, int] = (0, 0)
    norm: str = "none"


def init_conv2d(key, s: Conv2dSpec):
    kh, kw = s.kernel_size
    fan_in = s.in_channels * kh * kw
    bound = 1.0 / math.sqrt(fan_in)
    k1, k2 = jax.random.split(key)
    kernel = jax.random.uniform(
        k1, (kh, kw, s.in_channels, s.out_channels), jnp.float32, -bound, bound
    )
    p: Dict[str, Any] = {}
    if s.norm == "weight_norm":
        p["v"] = kernel
        p["g"] = jnp.sqrt(jnp.sum(kernel**2, axis=(0, 1, 2)))
    else:
        p["kernel"] = kernel
    p["bias"] = jax.random.uniform(k2, (s.out_channels,), jnp.float32, -bound, bound)
    return p


def apply_conv2d(s: Conv2dSpec, p, x):
    """x: (B, H, W, C)."""
    kernel = fused_kernel(p).astype(x.dtype)
    y = lax.conv_general_dilated(
        x, kernel, s.stride, [(s.padding[0], s.padding[0]), (s.padding[1], s.padding[1])],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return y + p["bias"].astype(y.dtype)


def avg_pool1d(x, kernel: int, stride: int, padding: int):
    """torch AvgPool1d (count_include_pad=True). x: (B, T, C)."""
    sums = lax.reduce_window(
        x, 0.0, lax.add, (1, kernel, 1), (1, stride, 1), [(0, 0), (padding, padding), (0, 0)]
    )
    return sums / kernel


# ---------------------------------------------------------------------------
# HiFiGAN period discriminator (hifigan.py:307-444)
# ---------------------------------------------------------------------------


class HiFiGANPeriodDiscriminator:
    def __init__(
        self,
        in_channels: int = 1,
        out_channels: int = 1,
        period: int = 3,
        kernel_sizes: Sequence[int] = (5, 3),
        channels: int = 32,
        downsample_scales: Sequence[int] = (3, 3, 3, 3, 1),
        max_downsample_channels: int = 1024,
        nonlinear_activation_params: Dict[str, Any] = None,
        use_weight_norm: bool = True,
        **_unused,
    ):
        self.period = period
        self.slope = (nonlinear_activation_params or {"negative_slope": 0.1})[
            "negative_slope"
        ]
        norm = "weight_norm" if use_weight_norm else "none"
        specs = []
        in_chs, out_chs = in_channels, channels
        for scale in downsample_scales:
            specs.append(
                Conv2dSpec(
                    in_chs, out_chs, (kernel_sizes[0], 1), (scale, 1),
                    ((kernel_sizes[0] - 1) // 2, 0), norm=norm,
                )
            )
            in_chs = out_chs
            out_chs = min(out_chs * 4, max_downsample_channels)
        self.conv_specs = specs
        self.out_spec = Conv2dSpec(
            in_chs, out_channels, (kernel_sizes[1] - 1, 1), (1, 1),
            ((kernel_sizes[1] - 1) // 2, 0), norm=norm,
        )

    def init(self, key):
        keys = jax.random.split(key, len(self.conv_specs) + 1)
        return {
            "convs": [init_conv2d(k, s) for k, s in zip(keys[:-1], self.conv_specs)],
            "out": init_conv2d(keys[-1], self.out_spec),
        }

    def __call__(self, params, x: jnp.ndarray, precision=None):
        b, t = x.shape
        if t % self.period != 0:
            n_pad = self.period - (t % self.period)
            x = jnp.pad(x[:, None], [(0, 0), (0, 0), (0, n_pad)], mode="reflect")[:, 0]
            t += n_pad
        z = x.reshape(b, t // self.period, self.period, 1)  # (B, T/P, P, C)
        fmap = []
        for s, p in zip(self.conv_specs, params["convs"]):
            z = leaky_relu(apply_conv2d(s, p, z), self.slope)
            fmap.append(z)
        logits = apply_conv2d(self.out_spec, params["out"], z)
        logits = logits.reshape(b, -1)
        return logits, fmap


class HiFiGANMultiPeriodDiscriminator:
    def __init__(
        self,
        in_channels: int = 1,
        periods: Sequence[int] = (2, 3, 5, 7, 11),
        discriminator_params: Optional[Dict[str, Any]] = None,
        **_unused,
    ):
        dp = dict(discriminator_params or {})
        dp["in_channels"] = in_channels
        self.discs = [
            HiFiGANPeriodDiscriminator(**{**dp, "period": p}) for p in periods
        ]

    def init(self, key):
        return [d.init(k) for d, k in zip(self.discs, jax.random.split(key, len(self.discs)))]

    def __call__(self, params, x, precision=None):
        return [d(p, x) for d, p in zip(self.discs, params)]


# ---------------------------------------------------------------------------
# HiFiGAN scale discriminator (hifigan.py:503-756)
# ---------------------------------------------------------------------------


class HiFiGANScaleDiscriminator:
    def __init__(
        self,
        in_channels: int = 1,
        out_channels: int = 1,
        kernel_sizes: Sequence[int] = (15, 41, 5, 3),
        channels: int = 128,
        max_downsample_channels: int = 1024,
        max_groups: int = 16,
        downsample_scales: Sequence[int] = (2, 2, 4, 4, 1),
        nonlinear_activation_params: Dict[str, Any] = None,
        **_unused,
    ):
        self.slope = (nonlinear_activation_params or {"negative_slope": 0.1})[
            "negative_slope"
        ]
        # weight norm is a no-op here (reference checks Conv2d on Conv1d layers)
        specs = [
            Conv1dSpec(in_channels, channels, kernel_sizes[0],
                       padding=(kernel_sizes[0] - 1) // 2)
        ]
        in_chs = out_chs = channels
        groups = 4
        for scale in downsample_scales:
            specs.append(
                Conv1dSpec(in_chs, out_chs, kernel_sizes[1], stride=scale,
                           padding=(kernel_sizes[1] - 1) // 2, groups=groups)
            )
            in_chs = out_chs
            out_chs = min(in_chs * 2, max_downsample_channels)
            groups = min(groups * 4, max_groups)
        out_chs = min(in_chs * 2, max_downsample_channels)
        specs.append(
            Conv1dSpec(in_chs, out_chs, kernel_sizes[2], padding=(kernel_sizes[2] - 1) // 2)
        )
        self.conv_specs = specs
        self.out_spec = Conv1dSpec(
            out_chs, out_channels, kernel_sizes[3], padding=(kernel_sizes[3] - 1) // 2
        )

    def init(self, key):
        keys = jax.random.split(key, len(self.conv_specs) + 1)
        return {
            "convs": [init_conv1d(k, s) for k, s in zip(keys[:-1], self.conv_specs)],
            "out": init_conv1d(keys[-1], self.out_spec),
        }

    def __call__(self, params, x: jnp.ndarray, precision=None):
        z = x[:, :, None]  # (B, T, 1)
        fmap = []
        for s, p in zip(self.conv_specs, params["convs"]):
            z = leaky_relu(apply_conv1d(s, p, z), self.slope)
            fmap.append(z)
        logits = apply_conv1d(self.out_spec, params["out"], z)
        return logits, fmap


class HiFiGANMultiScaleDiscriminator:
    def __init__(
        self,
        in_channels: int = 1,
        scales: int = 3,
        downsample_pooling_params: Optional[Dict[str, Any]] = None,
        discriminator_params: Optional[Dict[str, Any]] = None,
        **_unused,
    ):
        dp = dict(discriminator_params or {})
        dp["in_channels"] = in_channels
        self.discs = [HiFiGANScaleDiscriminator(**dp) for _ in range(scales)]
        pp = downsample_pooling_params or {"kernel_size": 4, "stride": 2, "padding": 2}
        self.pool = (pp["kernel_size"], pp["stride"], pp["padding"])

    def init(self, key):
        return [d.init(k) for d, k in zip(self.discs, jax.random.split(key, len(self.discs)))]

    def __call__(self, params, x, precision=None):
        outs = []
        for d, p in zip(self.discs, params):
            outs.append(d(p, x))
            x = avg_pool1d(x[:, :, None], *self.pool)[:, :, 0]
        return outs


class HiFiGANMultiScaleMultiPeriodDiscriminator:
    def __init__(self, in_channels: int = 1, scales: int = 3,
                 periods: Sequence[int] = (2, 3, 5, 7, 11),
                 scale_discriminator_params=None, period_discriminator_params=None,
                 scale_downsample_pooling_params=None, **_unused):
        self.msd = HiFiGANMultiScaleDiscriminator(
            in_channels=in_channels, scales=scales,
            downsample_pooling_params=scale_downsample_pooling_params,
            discriminator_params=scale_discriminator_params,
        )
        self.mpd = HiFiGANMultiPeriodDiscriminator(
            in_channels=in_channels, periods=periods,
            discriminator_params=period_discriminator_params,
        )

    def init(self, key):
        k1, k2 = jax.random.split(key)
        return {"msd": self.msd.init(k1), "mpd": self.mpd.init(k2)}

    def __call__(self, params, x, precision=None):
        return self.msd(params["msd"], x) + self.mpd(params["mpd"], x)


# ---------------------------------------------------------------------------
# SoundStream discriminators (sound_stream.py)
# ---------------------------------------------------------------------------


class ConvDiscriminator:
    """Waveform conv discriminator (sound_stream.py:12-58)."""

    def __init__(self, in_channels=1, channels=16, layers=4, groups=4, chan_max=1024):
        self.init_spec = Conv1dSpec(in_channels, channels, 7)
        specs = []
        curr = channels
        for _ in range(layers):
            out = min(curr * 4, chan_max)
            specs.append(Conv1dSpec(curr, out, 8, stride=4, padding=4, groups=groups))
            curr = out
        self.conv_specs = specs
        self.final_specs = [
            Conv1dSpec(curr, curr, 3),
            Conv1dSpec(curr, 1, 1),
        ]

    def init(self, key):
        keys = jax.random.split(key, len(self.conv_specs) + 3)
        return {
            "init": init_conv1d(keys[0], self.init_spec),
            "convs": [init_conv1d(k, s) for k, s in zip(keys[1:-2], self.conv_specs)],
            "final": [
                init_conv1d(keys[-2], self.final_specs[0]),
                init_conv1d(keys[-1], self.final_specs[1]),
            ],
        }

    def __call__(self, params, x, precision=None):
        z = apply_conv1d(self.init_spec, params["init"], x[:, :, None])
        fmap = []
        for s, p in zip(self.conv_specs, params["convs"]):
            z = leaky_relu(apply_conv1d(s, p, z), 0.1)
            fmap.append(z)
        z = leaky_relu(apply_conv1d(self.final_specs[0], params["final"][0], z), 0.1)
        logits = apply_conv1d(self.final_specs[1], params["final"][1], z)
        return logits, fmap


class MultiScaleDiscriminator:
    """SoundStream multi-scale waveform discriminator (sound_stream.py:60-98)."""

    def __init__(self, in_channels=1, disc_multi_scales=(1, 0.5, 0.25),
                 discriminator_params: Optional[Dict[str, Any]] = None, **_unused):
        dp = discriminator_params or dict(channels=16, layers=4, groups=4, chan_max=1024)
        self.discs = [
            ConvDiscriminator(in_channels=in_channels, **dp)
            for _ in disc_multi_scales
        ]
        factors = [
            int(s1 / s2)
            for s1, s2 in zip(disc_multi_scales[:-1], disc_multi_scales[1:])
        ]
        self.pools = [None] + [(2 * f, f, f) for f in factors]

    def init(self, key):
        return [d.init(k) for d, k in zip(self.discs, jax.random.split(key, len(self.discs)))]

    def __call__(self, params, x, precision=None):
        outs = []
        for d, p, pool in zip(self.discs, params, self.pools):
            # NOTE reference quirk (sound_stream.py:88-91): each scale pools
            # the ORIGINAL signal with its RELATIVE factor (non-cumulative),
            # so scales (1, .5, .25) actually see 1x, 2x, 2x downsampling.
            scaled = (
                x if pool is None else avg_pool1d(x[:, :, None], *pool)[:, :, 0]
            )
            outs.append(d(p, scaled))
        return outs


class ComplexSTFTDiscriminator:
    """Complex STFT discriminator (sound_stream.py:149-232).

    Complex convs run as real/imag decompositions; ModReLU activation;
    |logits| output (logits_abs=True).
    """

    def __init__(self, in_channels=1, channels=32,
                 strides=((1, 2), (2, 2), (1, 2), (2, 2), (1, 2), (2, 2)),
                 chan_mults=(1, 2, 4, 4, 8, 8),
                 n_fft=1024, hop_length=256, win_length=1024,
                 stft_normalized=False, **_unused):
        self.n_fft, self.hop, self.win = n_fft, hop_length, win_length
        self.normalized = stft_normalized
        self.init_spec = Conv2dSpec(in_channels, channels, (7, 7), padding=(3, 3))
        layer_channels = (channels,) + tuple(m * channels for m in chan_mults)
        units = []
        for stride, (cin, cout) in zip(strides, zip(layer_channels[:-1], layer_channels[1:])):
            ks = tuple(s + 2 for s in stride)
            units.append(
                (
                    Conv2dSpec(cin, cin, (3, 3), padding=(1, 1)),
                    Conv2dSpec(cin, cout, ks, stride=tuple(stride),
                               padding=tuple(k // 2 for k in ks)),
                )
            )
        self.units = units
        self.final_spec = Conv2dSpec(layer_channels[-1], 1, (16, 1))

    def _init_complex_conv(self, key, spec: Conv2dSpec):
        k1, k2 = jax.random.split(key)
        return {"re": init_conv2d(k1, spec), "im": init_conv2d(k2, spec)}

    def init(self, key):
        keys = jax.random.split(key, 2 * len(self.units) + 2)
        params = {"init": self._init_complex_conv(keys[0], self.init_spec), "units": []}
        ki = 1
        for u1, u2 in self.units:
            params["units"].append(
                {
                    "c1": self._init_complex_conv(keys[ki], u1),
                    "b": jnp.zeros(()),  # ModReLU bias
                    "c2": self._init_complex_conv(keys[ki + 1], u2),
                }
            )
            ki += 2
        params["final"] = self._init_complex_conv(keys[-1], self.final_spec)
        return params

    def _complex_conv(self, spec, p, re, im):
        rr = apply_conv2d(spec, p["re"], re)
        ii = apply_conv2d(spec, p["im"], im)
        ri = apply_conv2d(spec, p["im"], re)
        ir = apply_conv2d(spec, p["re"], im)
        # (re + i*im) * (wr + i*wi); biases are added inside apply_conv2d for
        # both parts, matching torch's complex bias (re bias + i*im bias)
        return rr - ii, ri + ir

    @staticmethod
    def _modrelu(b, re, im):
        mag = jnp.sqrt(re**2 + im**2 + 1e-12)
        scale = jax.nn.relu(mag + b) / mag
        return re * scale, im * scale

    def __call__(self, params, x, precision=None):
        spec = stft(x, self.n_fft, self.hop, self.win, center=True,
                    normalized=self.normalized)  # (B, F, T') complex
        re = jnp.real(spec)[..., None]  # (B, F, T', 1)
        im = jnp.imag(spec)[..., None]
        re, im = self._complex_conv(self.init_spec, params["init"], re, im)
        fmap = [jax.lax.complex(re, im)]
        for (u1, u2), p in zip(self.units, params["units"]):
            r1, i1 = self._complex_conv(u1, p["c1"], re, im)
            r1, i1 = self._modrelu(p["b"], r1, i1)
            re, im = self._complex_conv(u2, p["c2"], r1, i1)
            fmap.append(jax.lax.complex(re, im))
        lr, li = self._complex_conv(self.final_spec, params["final"], re, im)
        logits = jnp.sqrt(lr**2 + li**2 + 1e-12)
        return logits, fmap


EXTRA_DISC_REGISTRY = {
    "hifigan_period_discriminator": HiFiGANPeriodDiscriminator,
    "hifigan_scale_discriminator": HiFiGANScaleDiscriminator,
    "hifigan_multi_period_discriminator": HiFiGANMultiPeriodDiscriminator,
    "hifigan_multi_scale_discriminator": HiFiGANMultiScaleDiscriminator,
    "hifigan_multi_scale_multi_period_discriminator": HiFiGANMultiScaleMultiPeriodDiscriminator,
    "soundstream_multi_scale_discriminator": MultiScaleDiscriminator,
    "soundstream_complex_stft_discriminator": ComplexSTFTDiscriminator,
}
