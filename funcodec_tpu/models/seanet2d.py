"""2D (frequency-time) SEANet encoder/decoder for FreqCodec.

Behavioral reference: funcodec/models/encoder/seanet_encoder.py
(SEANetEncoder2d :252-363, SEANetResnetBlock2d :188-237, ReshapeModule :240)
and funcodec/models/decoder/seanet_decoder.py (SEANetDecoder2d :244-360).

Layout: (B, F, T, C) channels-last; the encoder squeezes the fully-downsampled
frequency axis before the LSTM/final-1D-conv stage, the decoder mirrors it.
Grouped convolutions (conv_group_ratio) map directly onto
feature_group_count.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, List, Tuple

import numpy as np

from funcodec_tpu.models.seanet import (
    Layer,
    SEANetConfig,
    apply_layers,
    init_layers,
)
from funcodec_tpu.ops.conv import ConvSpec


def _freeze_ratios(ratios) -> Tuple[Tuple[int, int], ...]:
    return tuple((int(f), int(t)) for f, t in ratios)


@dataclasses.dataclass(frozen=True)
class SEANetConfig2d:
    input_size: int = 1
    dimension: int = 128
    n_filters: int = 32
    n_residual_layers: int = 1
    ratios: Tuple[Tuple[int, int], ...] = ((4, 1), (4, 1), (4, 2), (4, 1))
    activation: str = "ELU"
    activation_params: Tuple[Tuple[str, Any], ...] = (("alpha", 1.0),)
    norm: str = "weight_norm"
    kernel_size: int = 7
    last_kernel_size: int = 7
    residual_kernel_size: int = 3
    dilation_base: int = 2
    causal: bool = False
    pad_mode: str = "reflect"
    true_skip: bool = False
    compress: int = 2
    seq_model: str = "lstm"
    seq_layer_num: int = 2
    res_seq: bool = True
    trim_right_ratio: float = 1.0
    last_out_padding: Tuple[Tuple[int, int], Tuple[int, int]] = ((0, 1), (0, 0))
    conv_group_ratio: int = -1
    tr_conv_group_ratio: int = -1

    @property
    def act_kwargs(self) -> Dict[str, Any]:
        return dict(self.activation_params)

    @property
    def hop_length(self) -> int:
        return int(np.prod([t for _f, t in self.ratios]))

    @classmethod
    def from_conf(cls, conf: Dict[str, Any], **overrides) -> "SEANetConfig2d":
        names = {f.name for f in dataclasses.fields(cls)}
        kw = {}
        for k, v in conf.items():
            if k == "norm_params":
                continue  # num_groups=1 is our GroupNorm default already
            if k == "channels":
                k = "input_size"
            if k not in names:
                continue
            if k == "ratios":
                v = _freeze_ratios(v)
            elif k == "last_out_padding":
                v = tuple(tuple(p) for p in v)
            elif k == "activation_params" and isinstance(v, dict):
                v = tuple(sorted(v.items()))
            elif isinstance(v, list):
                v = tuple(v)
            kw[k] = v
        kw.update(overrides)
        return cls(**kw)


def _act2d(cfg: SEANetConfig2d, channels: int) -> Layer:
    if cfg.activation.lower() == "snake":
        return ("snake", channels)
    return ("act", (cfg.activation, cfg.act_kwargs))


def _groups(n: int, ratio: int) -> int:
    return n // 2 // ratio if ratio > 0 else 1


def _resblock2d(cfg: SEANetConfig2d, dim: int, time_dilation: int) -> Layer:
    """SEANetResnetBlock2d: kernels [(k,k),(1,1)], dilations [(1,d),(1,1)]."""
    hidden = dim // cfg.compress
    k = cfg.residual_kernel_size
    io = [
        (dim, hidden, (k, k), (1, time_dilation)),
        (hidden, dim, (1, 1), (1, 1)),
    ]
    block: List[Layer] = []
    for in_chs, out_chs, ks, dil in io:
        block.append(_act2d(cfg, in_chs))
        block.append(
            (
                "conv",
                ConvSpec(
                    in_chs, out_chs, ks, dilation=dil,
                    groups=_groups(min(in_chs, out_chs), cfg.conv_group_ratio),
                    causal=cfg.causal, norm=cfg.norm, pad_mode=cfg.pad_mode,
                ),
            )
        )
    shortcut = (
        None
        if cfg.true_skip
        else ConvSpec(
            dim, dim, (1, 1), groups=_groups(dim, cfg.conv_group_ratio),
            causal=cfg.causal, norm=cfg.norm, pad_mode=cfg.pad_mode,
        )
    )
    return ("resblock", (tuple(block), shortcut))


def build_encoder2d_layers(cfg: SEANetConfig2d) -> List[Layer]:
    """SEANetEncoder2d.__init__ (seanet_encoder.py:293-350)."""
    layers: List[Layer] = []
    ratios = list(reversed(cfg.ratios))
    mult = 1
    layers.append(
        (
            "conv",
            ConvSpec(
                cfg.input_size, mult * cfg.n_filters,
                (cfg.kernel_size, cfg.kernel_size),
                causal=cfg.causal, norm=cfg.norm, pad_mode=cfg.pad_mode,
            ),
        )
    )
    for freq_ratio, time_ratio in ratios:
        for j in range(cfg.n_residual_layers):
            layers.append(_resblock2d(cfg, mult * cfg.n_filters, cfg.dilation_base**j))
        layers.append(_act2d(cfg, mult * cfg.n_filters))
        layers.append(
            (
                "conv",
                ConvSpec(
                    mult * cfg.n_filters, mult * cfg.n_filters * 2,
                    (freq_ratio * 2, time_ratio * 2),
                    stride=(freq_ratio, time_ratio),
                    groups=_groups(mult * cfg.n_filters, cfg.conv_group_ratio),
                    causal=cfg.causal, norm=cfg.norm, pad_mode=cfg.pad_mode,
                ),
            )
        )
        mult *= 2

    layers.append(("squeeze", None))  # (B, 1, T, C) -> (B, T, C)

    if cfg.seq_model == "lstm":
        layers.append(("lstm", (mult * cfg.n_filters, cfg.seq_layer_num, cfg.res_seq)))
    elif cfg.seq_model == "transformer":
        # same bottleneck transformer as 1D, applied after the freq squeeze
        # (seanet_encoder.py:330-337: TransformerEncoder over (B, T, C))
        layers.append(("tfm", (mult * cfg.n_filters, cfg.seq_layer_num, cfg.causal, cfg.res_seq)))

    layers.append(_act2d(cfg, mult * cfg.n_filters))
    layers.append(
        (
            "conv",
            ConvSpec(
                mult * cfg.n_filters, cfg.dimension, cfg.last_kernel_size,
                causal=cfg.causal, norm=cfg.norm, pad_mode=cfg.pad_mode,
            ),
        )
    )
    return layers


def build_decoder2d_layers(cfg: SEANetConfig2d) -> List[Layer]:
    """SEANetDecoder2d.__init__ (seanet_decoder.py:290-352)."""
    layers: List[Layer] = []
    mult = int(2 ** len(cfg.ratios))
    layers.append(
        (
            "conv",
            ConvSpec(
                cfg.dimension, mult * cfg.n_filters, cfg.kernel_size,
                causal=cfg.causal, norm=cfg.norm, pad_mode=cfg.pad_mode,
            ),
        )
    )
    if cfg.seq_model == "lstm":
        layers.append(("lstm", (mult * cfg.n_filters, cfg.seq_layer_num, cfg.res_seq)))
    elif cfg.seq_model == "transformer":
        # seanet_decoder.py:300-307: transformer before the freq unsqueeze
        layers.append(("tfm", (mult * cfg.n_filters, cfg.seq_layer_num, cfg.causal, cfg.res_seq)))

    layers.append(("unsqueeze", None))  # (B, T, C) -> (B, 1, T, C)

    for i, (freq_ratio, time_ratio) in enumerate(cfg.ratios):
        layers.append(_act2d(cfg, mult * cfg.n_filters))
        layers.append(
            (
                "conv",
                ConvSpec(
                    mult * cfg.n_filters, mult * cfg.n_filters // 2,
                    (freq_ratio * 2, time_ratio * 2),
                    stride=(freq_ratio, time_ratio),
                    groups=_groups(mult * cfg.n_filters, cfg.tr_conv_group_ratio),
                    causal=cfg.causal, norm=cfg.norm, transposed=True,
                    trim_right_ratio=cfg.trim_right_ratio,
                    out_padding=cfg.last_out_padding if i == len(cfg.ratios) - 1 else ((0, 0), (0, 0)),
                ),
            )
        )
        for j in range(cfg.n_residual_layers):
            layers.append(_resblock2d(cfg, mult * cfg.n_filters // 2, cfg.dilation_base**j))
        mult //= 2

    layers.append(_act2d(cfg, cfg.n_filters))
    layers.append(
        (
            "conv",
            ConvSpec(
                cfg.n_filters, cfg.input_size,
                (cfg.last_kernel_size, cfg.last_kernel_size),
                causal=cfg.causal, norm=cfg.norm, pad_mode=cfg.pad_mode,
            ),
        )
    )
    return layers


class SEANetEncoder2d:
    """(B, F, T, C_in) spectrogram features -> (B, T', dimension)."""

    def __init__(self, cfg: SEANetConfig2d):
        self.cfg = cfg
        self.layers = build_encoder2d_layers(cfg)
        self.hop_length = cfg.hop_length
        self.input_size = cfg.input_size

    def init(self, key):
        return init_layers(key, self.layers)

    def output_size(self) -> int:
        return self.cfg.dimension

    def __call__(self, params, x, precision=None):
        return apply_layers(self.layers, params, x, precision=precision)


class SEANetDecoder2d:
    """(B, T', dimension) -> (B, F, T, C_out) spectrogram features."""

    def __init__(self, cfg: SEANetConfig2d):
        self.cfg = cfg
        self.layers = build_decoder2d_layers(cfg)
        self.hop_length = cfg.hop_length
        self.output_channels = cfg.input_size

    def init(self, key):
        return init_layers(key, self.layers)

    def output_size(self) -> int:
        return self.cfg.input_size

    def __call__(self, params, z, precision=None):
        return apply_layers(self.layers, params, z, precision=precision)
