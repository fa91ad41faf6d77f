"""HiFiGAN generator (vocoder), channels-last JAX.

Behavioral reference: funcodec/models/discriminator/hifigan.py:23-105
(ResidualBlock: LeakyReLU->dilated conv [-> LeakyReLU->conv] + skip) and
:108-247 (HiFiGANGenerator: input conv, per-stage LeakyReLU->ConvTranspose1d
upsampling, num_blocks residual stacks averaged per stage, LeakyReLU->conv->
tanh head, optional global conditioning 1x1 conv, weight norm everywhere,
N(0, 0.01) init). Unused by the shipped codec configs but part of the
reference inventory (SEANet is the production decoder).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax

from funcodec_tpu.ops.conv import fused_kernel


@dataclasses.dataclass(frozen=True)
class HiFiGANConfig:
    in_channels: int = 80
    out_channels: int = 1
    channels: int = 512
    global_channels: int = -1
    kernel_size: int = 7
    upsample_scales: Tuple[int, ...] = (8, 8, 2, 2)
    upsample_kernel_sizes: Tuple[int, ...] = (16, 16, 4, 4)
    resblock_kernel_sizes: Tuple[int, ...] = (3, 7, 11)
    resblock_dilations: Tuple[Tuple[int, ...], ...] = (
        (1, 3, 5), (1, 3, 5), (1, 3, 5),
    )
    use_additional_convs: bool = True
    bias: bool = True
    negative_slope: float = 0.1
    use_weight_norm: bool = True

    def __post_init__(self):
        assert self.kernel_size % 2 == 1
        assert len(self.upsample_scales) == len(self.upsample_kernel_sizes)
        for k, s in zip(self.upsample_kernel_sizes, self.upsample_scales):
            assert k == 2 * s, "HiFiGAN requires K == 2*scale (hifigan.py:172)"

    @property
    def upsample_factor(self) -> int:
        f = self.out_channels
        for s in self.upsample_scales:
            f *= s
        return f


def _lrelu(x, slope):
    return jnp.where(x >= 0, x, slope * x)


def _init_wn_conv(key, k_shape, bias_ch, use_wn, use_bias=True):
    """N(0, 0.01) weight init (hifigan.py:252-262) with optional weight norm
    stored as {g, v} (fused at apply time by ops.conv.fused_kernel)."""
    w = jax.random.normal(key, k_shape) * 0.01
    p: Dict[str, Any] = {}
    if use_wn:
        # torch weight_norm dim=0 is over the OUT-channel axis, which is the
        # LAST axis in our (K, Cin, Cout) layout
        axes = tuple(range(w.ndim - 1))
        g = jnp.sqrt(jnp.sum(w.astype(jnp.float32) ** 2, axis=axes, keepdims=True))
        p["g"], p["v"] = g, w
    else:
        p["kernel"] = w
    if use_bias:
        p["bias"] = jnp.zeros((bias_ch,))
    return p


def _conv_same(p, x, dilation=1):
    """Plain torch Conv1d with 'same' padding (K-1)//2*d, channels-last."""
    w = fused_kernel(p).astype(x.dtype)
    k = w.shape[0]
    pad = (k - 1) // 2 * dilation
    y = lax.conv_general_dilated(
        x, w, window_strides=(1,), padding=[(pad, pad)],
        rhs_dilation=(dilation,), dimension_numbers=("NWC", "WIO", "NWC"),
    )
    if "bias" in p:
        y = y + p["bias"].astype(y.dtype)
    return y


def _conv_transpose(p, x, stride):
    """torch ConvTranspose1d(K=2s, stride=s, padding=ceil(s/2),
    output_padding=s%2): exact T -> T*s upsampling (hifigan.py:177-185).
    Gather lowering: input-dilated conv with the flipped kernel."""
    stored = fused_kernel(p).astype(x.dtype)  # (K, Cin, Cout) torch-tap order
    k = stored.shape[0]
    kernel = jnp.flip(stored, axis=0)
    y = lax.conv_general_dilated(
        x, kernel, window_strides=(1,), padding=[(k - 1, k - 1)],
        lhs_dilation=(stride,), dimension_numbers=("NWC", "WIO", "NWC"),
    )  # length (T-1)*s + K
    p_t = stride // 2 + stride % 2
    op = stride % 2
    y = y[:, p_t : y.shape[1] - (p_t - op)]
    if "bias" in p:
        y = y + p["bias"].astype(y.dtype)
    return y


class HiFiGANGenerator:
    def __init__(self, cfg: HiFiGANConfig):
        self.cfg = cfg

    def init(self, key) -> Dict[str, Any]:
        cfg = self.cfg
        wn = cfg.use_weight_norm
        keys = iter(jax.random.split(key, 4 + 2 * len(cfg.upsample_scales) * (1 + len(cfg.resblock_kernel_sizes) * max(len(d) for d in cfg.resblock_dilations) * 2)))
        p: Dict[str, Any] = {
            "input_conv": _init_wn_conv(
                next(keys), (cfg.kernel_size, cfg.in_channels, cfg.channels),
                cfg.channels, wn,
            )
        }
        ups, blocks = [], []
        ch = cfg.channels
        for i, (s, k) in enumerate(zip(cfg.upsample_scales, cfg.upsample_kernel_sizes)):
            cin, cout = cfg.channels // (2**i), cfg.channels // (2 ** (i + 1))
            ups.append(_init_wn_conv(next(keys), (k, cin, cout), cout, wn))
            for kb, dils in zip(cfg.resblock_kernel_sizes, cfg.resblock_dilations):
                blk = {"convs1": [], "convs2": []}
                for _d in dils:
                    blk["convs1"].append(
                        _init_wn_conv(next(keys), (kb, cout, cout), cout, wn, cfg.bias)
                    )
                    if cfg.use_additional_convs:
                        blk["convs2"].append(
                            _init_wn_conv(next(keys), (kb, cout, cout), cout, wn, cfg.bias)
                        )
                blocks.append(blk)
        p["upsamples"] = ups
        p["blocks"] = blocks
        cout = cfg.channels // (2 ** len(cfg.upsample_scales))
        p["output_conv"] = _init_wn_conv(
            next(keys), (cfg.kernel_size, cout, cfg.out_channels), cfg.out_channels, wn
        )
        if cfg.global_channels > 0:
            p["global_conv"] = _init_wn_conv(
                next(keys), (1, cfg.global_channels, cfg.channels), cfg.channels, wn
            )
        return p

    def _resblock(self, blk, x, dils, slope):
        for j, d in enumerate(dils):
            xt = _conv_same(blk["convs1"][j], _lrelu(x, slope), dilation=d)
            if self.cfg.use_additional_convs:
                xt = _conv_same(blk["convs2"][j], _lrelu(xt, slope), dilation=1)
            x = xt + x
        return x

    def __call__(self, params, c: jnp.ndarray, g: Optional[jnp.ndarray] = None):
        """c (B, T, in_channels) [+ g (B, 1, global_channels)] -> (B, T*prod(s), out)."""
        cfg = self.cfg
        x = _conv_same(params["input_conv"], c)
        if g is not None:
            x = x + _conv_same(params["global_conv"], g)
        nb = len(cfg.resblock_kernel_sizes)
        for i, s in enumerate(cfg.upsample_scales):
            x = _conv_transpose(params["upsamples"][i], _lrelu(x, cfg.negative_slope), s)
            cs = 0.0
            for j, dils in enumerate(cfg.resblock_dilations):
                cs = cs + self._resblock(
                    params["blocks"][i * nb + j], x, dils, cfg.negative_slope
                )
            x = cs / nb
        # output head uses torch's default LeakyReLU slope 0.01 (hifigan.py:202)
        x = _conv_same(params["output_conv"], _lrelu(x, 0.01))
        return jnp.tanh(x)
