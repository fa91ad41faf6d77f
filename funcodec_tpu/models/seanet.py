"""SEANet encoder/decoder stacks (1D time-domain and 2D freq-domain).

Ground-up JAX rebuild of the EnCodec SEANet topology. Behavioral reference:
funcodec/models/encoder/seanet_encoder.py (SEANetEncoder :66-185,
SEANetResnetBlock :16-61, SEANetEncoder2d :252-363) and
funcodec/models/decoder/seanet_decoder.py (SEANetDecoder :62-180,
SEANetDecoder2d :244-360).

Everything is channels-last: 1D activations are (B, T, C), 2D are
(B, F, T, C). The public encoder contract is waveform (B, T) -> (B, T', D);
the decoder is (B, T', D) -> (B, T, out_channels).

The layer stack is represented as a flat list of (kind, spec) descriptors in
the exact order of the reference's nn.Sequential, which makes the torch
checkpoint importer a positional walk.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from funcodec_tpu.ops import activations as act_ops
from funcodec_tpu.ops.conv import ConvSpec, apply_conv, init_conv
from funcodec_tpu.ops.rnn import apply_slstm, init_lstm

Layer = Tuple[str, Any]  # kind in {conv, act, snake, lstm, tfm, resblock, squeeze, unsqueeze}

# Rematerialize each resblock in the backward pass (jax.checkpoint): saves
# only the block INPUT instead of every intra-block intermediate (two conv
# outputs + activations + shortcut), trading ~one extra block forward per
# backward for the saved-activation HBM traffic the GAN train step is bound
# by (5-9% MFU vs 70%+ HBM utilization, artifacts/roofline_train_*.json).
# Module-level switch in the PALLAS_RVQ style: flip before tracing the train
# step (inference never runs a backward, so it is unaffected either way).
REMAT_RESBLOCKS = False


def _seq_tfm_cfg(spec):
    """TransformerConfig for the SEANet bottleneck transformer
    (normed_modules/transformer.py defaults: heads 4, ffn 2048, no pos enc)."""
    from funcodec_tpu.models.transformer import TransformerConfig

    dim, num_blocks = spec[0], spec[1]
    return TransformerConfig(
        input_size=dim, attention_dim=dim, attention_heads=4,
        linear_units=2048, num_blocks=num_blocks, input_layer="none",
        pos_enc_type="none",
    )


@dataclasses.dataclass(frozen=True)
class SEANetConfig:
    """Shared config for SEANet encoder/decoder (1D).

    Field semantics mirror seanet_encoder.py:91-97 / seanet_decoder.py:89-96.
    `ratios` are given decoder-order (coarse->fine), e.g. [8, 5, 4, 2];
    the encoder applies them reversed.
    """

    input_size: int = 1  # audio channels (encoder in / decoder out)
    dimension: int = 128  # latent dim
    n_filters: int = 32
    n_residual_layers: int = 1
    ratios: Tuple[int, ...] = (8, 5, 4, 2)
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
    seq_model: str = "lstm"  # lstm | transformer | none
    seq_layer_num: int = 2
    res_seq: bool = True
    double_filters: bool = True  # encoder: double channels per stage
    half_filters: bool = True  # decoder: halve channels per stage
    add_snake_activation: bool = False
    trim_right_ratio: float = 1.0  # decoder transposed convs
    final_activation: Optional[str] = None

    @property
    def act_kwargs(self) -> Dict[str, Any]:
        return dict(self.activation_params)

    @property
    def hop_length(self) -> int:
        return int(np.prod(self.ratios))


def _act_layer(cfg: SEANetConfig, channels: int, name: Optional[str] = None) -> Layer:
    name = name or cfg.activation
    if name.lower() == "snake":
        return ("snake", channels)
    return ("act", (name, cfg.act_kwargs))


def _resblock_layers(
    cfg: SEANetConfig, dim: int, dilation: int
) -> Layer:
    """SEANetResnetBlock: [act, conv(k,dil), act, conv(1)] + shortcut.

    Reference: seanet_encoder.py:16-61 (kernel_sizes=[k,1], dilations=[d,1],
    hidden = dim // compress, shortcut = 1x1 conv unless true_skip).
    """
    hidden = dim // cfg.compress
    block: List[Layer] = []
    io = [(dim, hidden, cfg.residual_kernel_size, dilation), (hidden, dim, 1, 1)]
    for in_chs, out_chs, k, d in io:
        block.append(_act_layer(cfg, in_chs))
        block.append(
            (
                "conv",
                ConvSpec(
                    in_chs,
                    out_chs,
                    k,
                    dilation=d,
                    causal=cfg.causal,
                    norm=cfg.norm,
                    pad_mode=cfg.pad_mode,
                ),
            )
        )
    shortcut = (
        None
        if cfg.true_skip
        else ConvSpec(
            dim, dim, 1, causal=cfg.causal, norm=cfg.norm, pad_mode=cfg.pad_mode
        )
    )
    return ("resblock", (tuple(block), shortcut))


def build_encoder_layers(cfg: SEANetConfig) -> List[Layer]:
    """Flat layer list for SEANetEncoder (seanet_encoder.py:107-162)."""
    layers: List[Layer] = []
    ratios = list(reversed(cfg.ratios))
    mult = 1
    layers.append(
        (
            "conv",
            ConvSpec(
                cfg.input_size,
                mult * cfg.n_filters,
                cfg.kernel_size,
                causal=cfg.causal,
                norm=cfg.norm,
                pad_mode=cfg.pad_mode,
            ),
        )
    )
    if cfg.add_snake_activation:
        layers.append(_act_layer(cfg, mult * cfg.n_filters, "snake"))
        layers.append(
            (
                "conv",
                ConvSpec(
                    mult * cfg.n_filters,
                    mult * cfg.n_filters,
                    cfg.kernel_size,
                    causal=cfg.causal,
                    norm=cfg.norm,
                    pad_mode=cfg.pad_mode,
                ),
            )
        )
    for ratio in ratios:
        for j in range(cfg.n_residual_layers):
            layers.append(
                _resblock_layers(cfg, mult * cfg.n_filters, cfg.dilation_base**j)
            )
        layers.append(_act_layer(cfg, mult * cfg.n_filters))
        out_ch = mult * cfg.n_filters * (2 if cfg.double_filters else 1)
        layers.append(
            (
                "conv",
                ConvSpec(
                    mult * cfg.n_filters,
                    out_ch,
                    kernel_size=ratio * 2,
                    stride=ratio,
                    causal=cfg.causal,
                    norm=cfg.norm,
                    pad_mode=cfg.pad_mode,
                ),
            )
        )
        if cfg.double_filters:
            mult *= 2

    if cfg.seq_model == "lstm":
        layers.append(("lstm", (mult * cfg.n_filters, cfg.seq_layer_num, cfg.res_seq)))
    elif cfg.seq_model == "transformer":
        layers.append(("tfm", (mult * cfg.n_filters, cfg.seq_layer_num, cfg.causal, cfg.res_seq)))

    layers.append(_act_layer(cfg, mult * cfg.n_filters))
    layers.append(
        (
            "conv",
            ConvSpec(
                mult * cfg.n_filters,
                cfg.dimension,
                cfg.last_kernel_size,
                causal=cfg.causal,
                norm=cfg.norm,
                pad_mode=cfg.pad_mode,
            ),
        )
    )
    return layers


def build_decoder_layers(cfg: SEANetConfig) -> List[Layer]:
    """Flat layer list for SEANetDecoder (seanet_decoder.py:106-172)."""
    layers: List[Layer] = []
    mult = int(2 ** len(cfg.ratios)) if cfg.half_filters else 1
    layers.append(
        (
            "conv",
            ConvSpec(
                cfg.dimension,
                mult * cfg.n_filters,
                cfg.kernel_size,
                causal=cfg.causal,
                norm=cfg.norm,
                pad_mode=cfg.pad_mode,
            ),
        )
    )
    if cfg.seq_model == "lstm":
        layers.append(("lstm", (mult * cfg.n_filters, cfg.seq_layer_num, cfg.res_seq)))
    elif cfg.seq_model == "transformer":
        layers.append(("tfm", (mult * cfg.n_filters, cfg.seq_layer_num, cfg.causal, cfg.res_seq)))

    for ratio in cfg.ratios:
        out_ch = mult * cfg.n_filters // 2 if cfg.half_filters else mult * cfg.n_filters
        layers.append(_act_layer(cfg, mult * cfg.n_filters))
        layers.append(
            (
                "conv",
                ConvSpec(
                    mult * cfg.n_filters,
                    out_ch,
                    kernel_size=ratio * 2,
                    stride=ratio,
                    causal=cfg.causal,
                    norm=cfg.norm,
                    transposed=True,
                    trim_right_ratio=cfg.trim_right_ratio,
                ),
            )
        )
        for j in range(cfg.n_residual_layers):
            layers.append(_resblock_layers(cfg, out_ch, cfg.dilation_base**j))
        if cfg.half_filters:
            mult //= 2

    layers.append(
        _act_layer(
            cfg, cfg.n_filters, "snake" if cfg.add_snake_activation else None
        )
    )
    layers.append(
        (
            "conv",
            ConvSpec(
                cfg.n_filters,
                cfg.input_size,
                cfg.last_kernel_size,
                causal=cfg.causal,
                norm=cfg.norm,
                pad_mode=cfg.pad_mode,
            ),
        )
    )
    if cfg.final_activation is not None:
        layers.append(("act", (cfg.final_activation, {})))
    return layers


# ---------------------------------------------------------------------------
# init / apply over a layer list
# ---------------------------------------------------------------------------


def init_layers(key, layers: Sequence[Layer]) -> List[Any]:
    params: List[Any] = []
    for kind, spec in layers:
        key, sub = jax.random.split(key)
        if kind == "conv":
            params.append(init_conv(sub, spec))
        elif kind == "snake":
            params.append(act_ops.init_snake(spec))
        elif kind == "lstm":
            dim, nlayers, _skip = spec
            params.append(init_lstm(sub, dim, dim, nlayers))
        elif kind == "tfm":
            from funcodec_tpu.models.transformer import init_encoder

            params.append(init_encoder(sub, _seq_tfm_cfg(spec)))
        elif kind == "resblock":
            block, shortcut = spec
            bp = init_layers(sub, block)
            sp = None
            if shortcut is not None:
                key, sub2 = jax.random.split(key)
                sp = init_conv(sub2, shortcut)
            params.append({"block": bp, "shortcut": sp})
        elif kind in ("act", "squeeze", "unsqueeze"):
            params.append(None)
        else:
            raise ValueError(kind)
    return params


def _try_fused_resblock(spec, p, x, packed_f=None):
    """Whole-resblock Pallas peephole (ops/resblock_pallas.fused_resblock_tgn).

    Qualifies when the block is the canonical [ELU, conv(k,d), ELU, conv(1)]
    with a 1x1 shortcut and time_group_norm everywhere (every shipped EnCodec
    config). Returns the fused output or None (caller keeps the XLA path).

    Channel gate (dispatch-amortized v5e A/B, scripts/pallas_stream_probe.py
    r2): at C>=128 lanes the fused kernel beats the XLA resblock ~1.11x
    ISOLATED (28.9 vs 32.2 ms at B=256,T=20k,C=128); at narrow stages
    (C=32/64, packed or not) XLA wins because the kernel's pack relayouts
    cost more than the saved passes (61.4/69.3 vs 52.7 ms at T=160k,C=32).
    So the peephole only fires on natively wide blocks: C>=128, no packing.
    Even so, e2e the flag is a net loss (scripts/encoder_variants_ab.py:
    448 vs 416 ms) — the custom call breaks XLA fusion with neighboring
    ops — hence PALLAS_RESBLOCK defaults off; see ops/conv.py.
    """
    from funcodec_tpu.ops import conv as conv_ops

    if not conv_ops.PALLAS_RESBLOCK or x.ndim != 3:
        return None
    if packed_f not in (None, 1) or x.shape[-1] < 128:
        return None
    block, shortcut = spec
    if shortcut is None or len(block) != 4:
        return None
    (k0, s0), (k1, s1), (k2, s2), (k3, s3) = block
    if k0 != "act" or k2 != "act" or k1 != "conv" or k3 != "conv":
        return None
    for name, kwargs in (s0, s2):
        if name.upper() != "ELU" or dict(kwargs).get("alpha", 1.0) != 1.0:
            return None
    from funcodec_tpu.ops.resblock_pallas import fused_resblock_tgn

    return fused_resblock_tgn(x, p["block"][1], p["block"][3], p["shortcut"],
                              s1, s3, shortcut, packed_f=packed_f)


def _packed_resblock_xla(spec, p, xp, T, f, precision=None):
    """Resblock on the packed view with pure XLA packed convs (used when the
    Pallas kernel is off or doesn't qualify). conv1 re-packs C/2 at 2f, conv2
    returns to f; stats/activations are packing-invariant."""
    from funcodec_tpu.ops.packed import apply_sconv1d_packed

    block, shortcut = spec
    if shortcut is None:
        return None
    y, Tc, fc = xp, T, f
    for (kind_b, spec_b), pb in zip(block, p["block"]):
        if kind_b == "act":
            name, kwargs = spec_b
            y = act_ops.get_activation_fn(name, **kwargs)(y)
        elif kind_b == "snake":
            y = act_ops.snake(y, jnp.tile(pb["alpha"], fc))
        elif kind_b == "conv":
            res = apply_sconv1d_packed(spec_b, pb, y, Tc, precision)
            if res is None:
                return None
            y, Tc, fc = res
        else:
            return None
    if Tc != T or fc != f:
        return None
    res = apply_sconv1d_packed(shortcut, p["shortcut"], xp, T, precision)
    if res is None:
        return None
    return res[0] + y


def apply_layers_packed(
    layers: Sequence[Layer], params: Sequence[Any], x: jnp.ndarray, precision=None
) -> jnp.ndarray:
    """apply_layers with packed narrow-stage execution (ops/packed.py).

    While channels are < 128, activations ride a (B, T/f, f*C = 128) view so
    XLA's lane padding never inflates HBM traffic; convs use block-Toeplitz
    packed weights and resblocks dispatch to the fused Pallas kernel (or the
    packed-XLA fallback). Any layer the packed plan can't express unpacks and
    continues on the normal path. Numerics match apply_layers to conv-
    accumulation-order tolerance.
    """
    from funcodec_tpu.ops.packed import apply_sconv1d_packed, pack_factor

    i = 0
    layers = list(layers)
    params = list(params)
    packed = None  # (T, f, C) while x is the packed view

    def unpack(xp, state):
        T, f, C = state
        return xp.reshape(xp.shape[0], T, C)

    while i < len(layers):
        (kind, spec), p = layers[i], params[i]
        if packed is None:
            if (
                x.ndim == 3
                and kind in ("act", "snake", "resblock", "conv")
                and pack_factor(x.shape[-1]) > 1
                and x.shape[1] % pack_factor(x.shape[-1]) == 0
            ):
                C = x.shape[-1]
                f = pack_factor(C)
                packed = (x.shape[1], f, C)
                x = x.reshape(x.shape[0], x.shape[1] // f, f * C)
                continue
            x = apply_layers(layers[i : i + 1], params[i : i + 1], x, precision)
            i += 1
            continue

        T, f, C = packed
        if kind == "act":
            name, kwargs = spec
            x = act_ops.get_activation_fn(name, **kwargs)(x)
            i += 1
        elif kind == "snake":
            x = act_ops.snake(x, jnp.tile(p["alpha"], f))
            i += 1
        elif kind == "resblock":
            y = _try_fused_resblock(spec, p, x, packed_f=f)
            if y is None:
                y = _packed_resblock_xla(spec, p, x, T, f, precision)
            if y is None:
                # Plan failure (e.g. true_skip resblock): run THIS layer on the
                # unpacked view and advance, else the top-of-loop repack
                # condition still holds and we'd retry the same layer forever.
                x, packed = unpack(x, packed), None
                x = apply_layers(layers[i : i + 1], params[i : i + 1], x, precision)
                i += 1
                continue
            x = y
            i += 1
        elif kind == "conv":
            res = apply_sconv1d_packed(spec, p, x, T, precision)
            if res is None:
                x, packed = unpack(x, packed), None
                x = apply_layers(layers[i : i + 1], params[i : i + 1], x, precision)
                i += 1
                continue
            yp, T_out, f_out = res
            if f_out == 1:
                x, packed = yp, None
            else:
                x, packed = yp, (T_out, f_out, spec.out_channels)
            i += 1
        else:
            x, packed = unpack(x, packed), None
    if packed is not None:
        x = unpack(x, packed)
    return x


def _elu_conv_fusible(kind, spec, nxt) -> bool:
    """act+conv peephole: standalone ELU(alpha=1) directly before a 1D
    stride-1 conv fuses into one Pallas kernel (ops/conv.apply_sconv1d_act),
    removing the activation's HBM round-trip."""
    from funcodec_tpu.ops import conv as conv_ops

    if not conv_ops.PALLAS_STRIDE1 or kind != "act" or nxt is None:
        return False
    name, kwargs = spec
    if name.upper() != "ELU" or dict(kwargs).get("alpha", 1.0) != 1.0:
        return False
    nkind, nspec = nxt
    return (
        nkind == "conv"
        and nspec.ndim == 1
        and not nspec.transposed
        and int(nspec.stride) == 1
        and nspec.groups == 1
        and int(nspec.kernel_size) > 1
    )


def apply_layers(
    layers: Sequence[Layer], params: Sequence[Any], x: jnp.ndarray, precision=None
) -> jnp.ndarray:
    i = 0
    layers = list(layers)
    params = list(params)
    while i < len(layers):
        (kind, spec), p = layers[i], params[i]
        if kind == "act" and _elu_conv_fusible(
            kind, spec, layers[i + 1] if i + 1 < len(layers) else None
        ):
            from funcodec_tpu.ops.conv import apply_sconv1d_act

            x = apply_sconv1d_act(
                layers[i + 1][1], params[i + 1], x, act="elu", precision=precision
            )
            i += 2
            continue
        if kind == "conv":
            x = apply_conv(spec, p, x, precision=precision)
        elif kind == "act":
            name, kwargs = spec
            x = act_ops.get_activation_fn(name, **kwargs)(x)
        elif kind == "snake":
            x = act_ops.snake(x, p["alpha"])
        elif kind == "lstm":
            _dim, _nlayers, skip = spec
            x = apply_slstm(p, x, skip=skip)
        elif kind == "tfm":
            # normed_modules/transformer.py TransformerEncoder: no positional
            # encoding (input_layer=None, in==out), optional causal mask and
            # residual skip (:150-208)
            from funcodec_tpu.models.transformer import (
                apply_encoder,
                causal_mask,
                make_pad_mask_bool,
            )

            _dim, _nb, causal, skip = spec
            B, T = x.shape[0], x.shape[1]
            lengths = jnp.full((B,), T, jnp.int32)
            mask = causal_mask(lengths, T) if causal else make_pad_mask_bool(lengths, T)[:, None, :]
            y = apply_encoder(_seq_tfm_cfg(spec), p, x, mask)
            x = (x + y) if skip else y
        elif kind == "resblock":

            def _resblock(x_, p_):
                fused = _try_fused_resblock(spec, p_, x_)
                if fused is not None:
                    return fused
                block, shortcut = spec
                y = apply_layers(block, p_["block"], x_, precision=precision)
                s = x_ if shortcut is None else apply_conv(
                    shortcut, p_["shortcut"], x_, precision=precision
                )
                return s + y

            x = (jax.checkpoint(_resblock) if REMAT_RESBLOCKS else _resblock)(x, p)
        elif kind == "squeeze":
            # (B, F, T, C) with F==1 -> (B, T, C); ReshapeModule (encoder :240-246)
            x = jnp.squeeze(x, axis=1)
        elif kind == "unsqueeze":
            # (B, T, C) -> (B, 1, T, C); ReshapeModule (decoder :235-241)
            x = jnp.expand_dims(x, axis=1)
        else:
            raise ValueError(kind)
        i += 1
    return x


class SEANetEncoder:
    """Waveform (B, T) or (B, T, channels) -> latents (B, T', dimension)."""

    def __init__(self, cfg: SEANetConfig):
        self.cfg = cfg
        self.layers = build_encoder_layers(cfg)
        self.hop_length = cfg.hop_length

    def init(self, key):
        return init_layers(key, self.layers)

    def output_size(self) -> int:
        return self.cfg.dimension

    def __call__(self, params, x: jnp.ndarray, precision=None) -> jnp.ndarray:
        if x.ndim == 2:
            x = x[:, :, None]  # (B, T, 1)
        from funcodec_tpu.ops import conv as conv_ops

        if conv_ops.PACKED_NARROW:
            return apply_layers_packed(self.layers, params, x, precision=precision)
        return apply_layers(self.layers, params, x, precision=precision)


class SEANetDecoder:
    """Latents (B, T', dimension) -> waveform (B, T, channels)."""

    def __init__(self, cfg: SEANetConfig):
        self.cfg = cfg
        self.layers = build_decoder_layers(cfg)
        self.hop_length = cfg.hop_length

    def init(self, key):
        return init_layers(key, self.layers)

    def output_size(self) -> int:
        return self.cfg.input_size

    def __call__(self, params, z: jnp.ndarray, precision=None) -> jnp.ndarray:
        return apply_layers(self.layers, params, z, precision=precision)
