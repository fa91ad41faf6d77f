"""Discriminators for GAN codec training.

MS-STFT discriminator — behavioral reference:
funcodec/models/discriminator/encodec_disc.py (DiscriminatorSTFT :28-96,
MultiScaleSTFTDiscriminator :99-133) and the multi-discriminator container
funcodec/models/discriminator/multiple_discriminator.py:13-57.

Layout: spectrogram features are (B, T', F, C) channels-last; kernels are
(kt, kf). Each sub-discriminator returns (logits, [feature maps]).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any, Dict, List, Sequence, Tuple

import jax
import jax.numpy as jnp
from jax import lax

from funcodec_tpu.ops.activations import leaky_relu
from funcodec_tpu.ops.conv import fused_kernel
from funcodec_tpu.ops.stft import stft


def _pair(x):
    return (x, x) if isinstance(x, int) else tuple(x)


@dataclasses.dataclass(frozen=True)
class PlainConv2dSpec:
    """torch nn.Conv2d with explicit symmetric padding (+ optional weight norm)."""

    in_channels: int
    out_channels: int
    kernel_size: Tuple[int, int]
    stride: Tuple[int, int] = (1, 1)
    dilation: Tuple[int, int] = (1, 1)
    padding: Tuple[int, int] = (0, 0)
    norm: str = "none"  # none | weight_norm


def init_plain_conv2d(key, spec: PlainConv2dSpec) -> Dict[str, jnp.ndarray]:
    kh, kw = spec.kernel_size
    fan_in = spec.in_channels * kh * kw
    bound = 1.0 / math.sqrt(fan_in)
    k1, k2 = jax.random.split(key)
    kernel = jax.random.uniform(
        k1, (kh, kw, spec.in_channels, spec.out_channels), jnp.float32,
        minval=-bound, maxval=bound,
    )
    params = {}
    if spec.norm == "weight_norm":
        g = jnp.sqrt(jnp.sum(kernel**2, axis=(0, 1, 2)))
        params["v"], params["g"] = kernel, g
    else:
        params["kernel"] = kernel
    params["bias"] = jax.random.uniform(
        k2, (spec.out_channels,), jnp.float32, minval=-bound, maxval=bound
    )
    return params


def apply_plain_conv2d(spec: PlainConv2dSpec, params, x: jnp.ndarray, precision=None):
    """x: (B, H, W, C)."""
    kernel = fused_kernel(params).astype(x.dtype)
    ph, pw = spec.padding
    y = lax.conv_general_dilated(
        x,
        kernel,
        window_strides=spec.stride,
        padding=[(ph, ph), (pw, pw)],
        rhs_dilation=spec.dilation,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        precision=precision,
    )
    return y + params["bias"].astype(y.dtype)


def avg_pool2d_4s2p1(x: jnp.ndarray) -> jnp.ndarray:
    """AvgPool2d(4, stride=2, padding=1, count_include_pad=False) on (B,H,W,C)."""
    sums = lax.reduce_window(
        x, 0.0, lax.add, (1, 4, 4, 1), (1, 2, 2, 1), [(0, 0), (1, 1), (1, 1), (0, 0)]
    )
    ones = jnp.ones(x.shape[1:3], x.dtype)[None, :, :, None]
    counts = lax.reduce_window(
        ones, 0.0, lax.add, (1, 4, 4, 1), (1, 2, 2, 1), [(0, 0), (1, 1), (1, 1), (0, 0)]
    )
    return sums / counts


def _get_2d_padding(kernel_size, dilation=(1, 1)):
    return (
        ((kernel_size[0] - 1) * dilation[0]) // 2,
        ((kernel_size[1] - 1) * dilation[1]) // 2,
    )


class DiscriminatorSTFT:
    """One STFT-scale sub-discriminator (encodec_disc.py:28-96)."""

    def __init__(
        self,
        filters: int,
        in_channels: int = 1,
        out_channels: int = 1,
        n_fft: int = 1024,
        hop_length: int = 256,
        win_length: int = 1024,
        max_filters: int = 1024,
        filters_scale: int = 1,
        kernel_size: Tuple[int, int] = (3, 9),
        dilations: Sequence[int] = (1, 2, 4),
        stride: Tuple[int, int] = (1, 2),
        normalized: bool = True,
        norm: str = "weight_norm",
        activation_slope: float = 0.2,
    ):
        self.n_fft = n_fft
        self.hop_length = hop_length
        self.win_length = win_length
        self.normalized = normalized
        self.slope = activation_slope

        specs: List[PlainConv2dSpec] = []
        spec_channels = 2 * in_channels
        # first conv: NO norm (reference omits the norm kwarg -> 'none')
        specs.append(
            PlainConv2dSpec(
                spec_channels, filters, kernel_size,
                padding=_get_2d_padding(kernel_size),
            )
        )
        in_chs = min(filters_scale * filters, max_filters)
        for i, dilation in enumerate(dilations):
            out_chs = min((filters_scale ** (i + 1)) * filters, max_filters)
            specs.append(
                PlainConv2dSpec(
                    in_chs, out_chs, kernel_size, stride=stride,
                    dilation=(dilation, 1),
                    padding=_get_2d_padding(kernel_size, (dilation, 1)),
                    norm=norm,
                )
            )
            in_chs = out_chs
        out_chs = min((filters_scale ** (len(dilations) + 1)) * filters, max_filters)
        specs.append(
            PlainConv2dSpec(
                in_chs, out_chs, (kernel_size[0], kernel_size[0]),
                padding=_get_2d_padding((kernel_size[0], kernel_size[0])),
                norm=norm,
            )
        )
        self.conv_specs = specs
        self.post_spec = PlainConv2dSpec(
            out_chs, out_channels, (kernel_size[0], kernel_size[0]),
            padding=_get_2d_padding((kernel_size[0], kernel_size[0])),
            norm=norm,
        )

    def init(self, key):
        keys = jax.random.split(key, len(self.conv_specs) + 1)
        return {
            "convs": [init_plain_conv2d(k, s) for k, s in zip(keys[:-1], self.conv_specs)],
            "conv_post": init_plain_conv2d(keys[-1], self.post_spec),
        }

    def __call__(self, params, x: jnp.ndarray, precision=None):
        """x: (B, T) waveform -> (logits (B,t,w,1), fmaps)."""
        z = stft(
            x, self.n_fft, self.hop_length, self.win_length,
            center=False, normalized=self.normalized,
        )  # (B, F, T') complex
        z = jnp.stack([jnp.real(z), jnp.imag(z)], axis=-1)  # (B, F, T', 2)
        # stft computes fp32 regardless of input dtype; return the conv
        # stack to the caller's compute dtype (no-op for fp32, keeps the
        # discriminator in bf16 under mixed-precision training)
        z = z.astype(x.dtype)
        z = jnp.swapaxes(z, 1, 2)  # (B, T', F, 2) — 'b c w t -> b c t w'
        fmap = []
        for spec, p in zip(self.conv_specs, params["convs"]):
            z = apply_plain_conv2d(spec, p, z, precision=precision)
            z = leaky_relu(z, self.slope)
            fmap.append(z)
        logits = apply_plain_conv2d(self.post_spec, params["conv_post"], z, precision=precision)
        return logits, fmap


class MultiScaleSTFTDiscriminator:
    """3-scale MS-STFT discriminator (encodec_disc.py:99-133)."""

    def __init__(
        self,
        filters: int = 32,
        in_channels: int = 1,
        out_channels: int = 1,
        n_ffts: Sequence[int] = (1024, 2048, 512),
        hop_lengths: Sequence[int] = (256, 512, 128),
        win_lengths: Sequence[int] = (1024, 2048, 512),
        **kwargs,
    ):
        assert len(n_ffts) == len(hop_lengths) == len(win_lengths)
        self.discriminators = [
            DiscriminatorSTFT(
                filters, in_channels=in_channels, out_channels=out_channels,
                n_fft=n_ffts[i], win_length=win_lengths[i], hop_length=hop_lengths[i],
                **kwargs,
            )
            for i in range(len(n_ffts))
        ]

    def init(self, key):
        keys = jax.random.split(key, len(self.discriminators))
        return [d.init(k) for d, k in zip(self.discriminators, keys)]

    def __call__(self, params, x: jnp.ndarray, precision=None):
        """x: (B, T) -> list of (downsampled logits, fmaps)."""
        outs = []
        for d, p in zip(self.discriminators, params):
            logits, fmap = d(p, x, precision=precision)
            outs.append((avg_pool2d_4s2p1(logits), fmap))
        return outs


class MultipleDiscriminator:
    """Name-registry container flattening all sub-discriminator outputs
    (multiple_discriminator.py:13-57)."""

    @staticmethod
    def registry():
        from funcodec_tpu.models.discriminators_extra import EXTRA_DISC_REGISTRY

        return {
            "encodec_multi_scale_stft_discriminator": MultiScaleSTFTDiscriminator,
            **EXTRA_DISC_REGISTRY,
        }

    def __init__(self, input_size: int = 1, disc_conf_list: Sequence[Dict[str, Any]] = ()):
        self.discs = []
        registry = self.registry()
        for conf in disc_conf_list:
            conf = dict(conf)
            name = conf.pop("name")
            conf.setdefault("in_channels", input_size)
            self.discs.append(registry[name](**conf))

    def init(self, key):
        keys = jax.random.split(key, max(len(self.discs), 1))
        return [d.init(k) for d, k in zip(self.discs, keys)]

    def __call__(self, params, x: jnp.ndarray, precision=None):
        outs = []
        for d, p in zip(self.discs, params):
            ret = d(p, x, precision=precision)
            if isinstance(ret, tuple):
                outs.append(ret)
            else:
                outs.extend(ret)
        return outs
