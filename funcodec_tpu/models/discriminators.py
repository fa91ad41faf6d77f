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


# Experiment flag (pattern: conv.PALLAS_STRIDE1, seanet.REMAT_RESBLOCKS):
# run the STFT-disc conv tower in a frequency space-to-depth layout — groups
# of BLOCK_F_N adjacent F bins folded into channels (C 32 -> 32*n) — so the
# convs contract over a denser channel dim on the 128-lane MXU. Numerics:
# logits match the plain path to fp tolerance; fmaps come back blocked but
# pre-scaled so that mean(|r-f|) over them equals the plain path exactly
# (see _call_blocked). Trace motivation: artifacts/trace_train_b64_r5.json
# (disc tower = 56% of the B=64 train step at 200 GB/s, <=21% MXU).
# Default ON after the chip A/B n-sweep (artifacts/blocked_disc_ab_r5.json):
# at B=64 bf16 the shared GAN step is 465.7 ms plain, 406.6 ms n=2 (1.14x),
# 310.9 ms n=4 (1.50x — 4*32 = 128-channel contractions fill the MXU lanes).
# Exactness across n is pinned in tests/test_disc_blocked.py.
BLOCKED_F = True
BLOCK_F_N = 4


def _pair(x):
    return (x, x) if isinstance(x, int) else tuple(x)


def _blockn_kernel(w: jnp.ndarray, stride_f: int, pf: int, n: int):
    """Rewrite a (kt,kf,ci,co) F-conv kernel for block-n space-to-depth.

    In blocked layout x_b[..., g, si*ci+c] = x[..., n*g+si, c]; output
    likewise (so*co+o at bin n*g'+so). Original: y[f] reads
    x[stride_f*f - pf + j]. With f = n*g'+so and input block
    b = stride_f*g' + (kb - pbl):
        j = n*(kb - pbl) + si - stride_f*so + pf
    Returns (w_b (kt, width, n*ci, n*co), pbl, kbp_max) where pbl is the
    left block-axis padding replacing the original (pf, pf) and kbp_max the
    largest relative block offset (the caller derives the right pad from it).
    """
    kt, kf, ci, co = w.shape
    # valid relative block offsets kbp = kb - pbl
    offs = []
    for kbp in range(-(pf + n), pf + n + 1):
        ok = any(
            0 <= n * kbp + si - stride_f * so + pf <= kf - 1
            for si in range(n)
            for so in range(n)
        )
        if ok:
            offs.append(kbp)
    pbl, kbp_max = -offs[0], offs[-1]
    width = kbp_max + pbl + 1
    w_b = jnp.zeros((kt, width, n * ci, n * co), w.dtype)
    for kb in range(width):
        kbp = kb - pbl
        for si in range(n):
            for so in range(n):
                j = n * kbp + si - stride_f * so + pf
                if 0 <= j <= kf - 1:
                    w_b = w_b.at[:, kb, si * ci:(si + 1) * ci,
                                 so * co:(so + 1) * co].set(w[:, j])
    return w_b, pbl, kbp_max


def _block2_kernel(w: jnp.ndarray, stride_f: int, pf: int):
    """Back-compat alias for the n=2 kernel rewrite."""
    return _blockn_kernel(w, stride_f, pf, 2)


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


def apply_plain_conv2d_blocked(
    spec: PlainConv2dSpec, params, xb: jnp.ndarray, f_in: int, n: int = 2,
    precision=None,
):
    """Blocked-F equivalent of apply_plain_conv2d.

    xb: (B, T, Nb, n*C_in) where bin n*g+si lives at channel si*C_in+c and
    logical bins >= f_in are zero. Returns (yb (B, T, Gb, n*C_out), f_out)
    with the same convention (caller masks the garbage sub-bins when
    f_out % n != 0).
    """
    assert spec.dilation[1] == 1, "blocked path assumes no F dilation"
    kernel = fused_kernel(params).astype(xb.dtype)
    kt, kf, ci, co = kernel.shape
    pt, pf = spec.padding
    st, sf = spec.stride
    w_b, pbl, kbp_max = _blockn_kernel(kernel, sf, pf, n)
    f_out = (f_in + 2 * pf - kf) // sf + 1
    gb = -(-f_out // n)
    nb_in = xb.shape[2]
    pbr = max(0, sf * (gb - 1) + kbp_max - (nb_in - 1))
    y = lax.conv_general_dilated(
        xb, w_b, window_strides=(st, sf),
        padding=[(pt, pt), (pbl, pbr)],
        rhs_dilation=(spec.dilation[0], 1),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        precision=precision,
    )
    y = y[:, :, :gb]
    bias = params["bias"]
    return y + jnp.tile(bias, n).astype(y.dtype), f_out


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
        if BLOCKED_F:
            return self._call_blocked(params, z, precision=precision)
        fmap = []
        for spec, p in zip(self.conv_specs, params["convs"]):
            z = apply_plain_conv2d(spec, p, z, precision=precision)
            z = leaky_relu(z, self.slope)
            fmap.append(z)
        logits = apply_plain_conv2d(self.post_spec, params["conv_post"], z, precision=precision)
        return logits, fmap

    def _call_blocked(self, params, z: jnp.ndarray, precision=None):
        """Blocked-F tower: the conv stack runs at n-times channel density
        (groups of BLOCK_F_N adjacent F bins folded into channels), the post
        conv runs on the unblocked tensor so logits match the plain path to
        fp tolerance.

        fmaps are returned IN BLOCKED LAYOUT, pre-scaled by
        padded_bins/valid_bins per layer: the losses only ever take
        mean(|r - f|) over fmap pairs (encodec.py feat-match, PIT), which is
        layout-invariant, and the scale corrects the mean's divisor for the
        zeroed garbage sub-bins — so loss values equal the plain path's.
        """
        n = BLOCK_F_N
        B, T, F, C = z.shape
        nb = -(-F // n)
        if n * nb > F:
            z = jnp.pad(z, ((0, 0), (0, 0), (0, n * nb - F), (0, 0)))
        zb = z.reshape(B, T, nb, n * C)
        f_log = F
        fmap = []
        for spec, p in zip(self.conv_specs, params["convs"]):
            zb, f_log = apply_plain_conv2d_blocked(
                spec, p, zb, f_log, n=n, precision=precision
            )
            zb = leaky_relu(zb, self.slope)
            gb, cb = zb.shape[2], zb.shape[3]
            valid = f_log - n * (gb - 1)  # valid sub-bins in the last block
            if valid < n:  # zero the garbage sub-bins (bins >= f_log)
                mask = jnp.ones((gb, cb), zb.dtype)
                mask = mask.at[-1, valid * (cb // n):].set(0)
                zb = zb * mask
                fmap.append(zb * jnp.asarray(n * gb / f_log, zb.dtype))
            else:
                fmap.append(zb)
        # unblock + slice for the post conv: channel si*co+c -> bin n*g+si
        gb, cb = zb.shape[2], zb.shape[3]
        z = zb.reshape(B, zb.shape[1], n * gb, cb // n)[:, :, :f_log]
        logits = apply_plain_conv2d(
            self.post_spec, params["conv_post"], z, precision=precision
        )
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
