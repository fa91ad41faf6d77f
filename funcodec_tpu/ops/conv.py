"""Streamable 1D/2D convolutions for SEANet stacks, TPU-first.

Pure functions over explicit parameter pytrees. Layout is channels-last —
(B, T, C) for 1D and (B, F, T, C) for 2D — so convs lower straight onto the
MXU via ``lax.conv_general_dilated`` without layout transposes.

Behavioral reference (padding semantics, norm registry, weight-norm
parametrization): funcodec/modules/normed_modules/conv.py
(SConv1d :223-261, SConvTranspose1d :264-305, SConv2d :317-378,
SConvTranspose2d :381-447, norm registry :21-54).

Transposed convolutions are implemented as input-dilated gather convolutions
(lhs_dilation) rather than scatter, which is the efficient TPU lowering.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Dict, Tuple, Union

import jax
import jax.numpy as jnp
from jax import lax

from funcodec_tpu.ops.pad import (
    conv_padding_total,
    extra_padding_for_conv1d,
    pad1d_time,
    pad2d_freq_time,
    split_padding,
    unpad1d_time,
    unpad2d_freq_time,
)

Params = Dict[str, jnp.ndarray]

CONV_NORMS = ("none", "weight_norm", "time_group_norm", "layer_norm")

# TPU lowering toggles. End-to-end ablation on v5e (EnCodec nq32ds320,
# B=32 x 10s, bf16): XLA's native conv lowering beats every matmul
# reformulation here — lax.conv 142.5ms vs strided-matmul 188ms,
# subpixel-transposed 175ms, all-matmul 195ms — because XLA fuses the
# pad+conv+norm+act chains while the matmul forms materialize concat
# intermediates. Kept (default off) as the starting point for a future
# fused Pallas kernel.
MATMUL_STRIDED = False
MATMUL_TRANSPOSED = False
MATMUL_STRIDE1 = False

# Fused Pallas stride-1 conv (pad spliced in VMEM, unfold matmul on the MXU;
# ops/conv_pallas.py). Saves the materialized pad copy per streamable conv.
PALLAS_STRIDE1 = False

# Whole-resblock fused Pallas kernel (ops/resblock_pallas.py): 3 streaming
# passes replace the ~15 HBM tensor passes of the unfused ELU/conv/tgn chain.
# Round-2 verdict (dispatch-amortized v5e A/B, scripts/pallas_stream_probe.py
# + scripts/encoder_variants_ab.py): the kernel wins ISOLATED at C>=128
# (28.9 vs 32.2 ms) and loses at narrow stages; but end-to-end even the
# C>=128-gated version is a net loss (448 vs 416 ms e2e) because the custom
# call breaks XLA's fusion across the resblock boundary (neighboring
# downsample convs / ELUs stop fusing). Default OFF; measured dead-end kept
# for the record.
PALLAS_RESBLOCK = False

# Packed narrow-stage execution (ops/packed.py): run C<128 encoder sections
# in a (B, T/f, f*C=128) view so XLA's lane padding never inflates traffic.
# Round-2 verdict: the premise was false — dispatch-amortized probes show
# narrow (T,32) elementwise already streams at 531 GB/s vs 544 packed (the
# earlier "4x traffic" reading was the ~38 ms axon dispatch floor, not lane
# padding), and the pack relayouts make every variant slower e2e
# (packed 436 ms / packed+pallas 492 ms vs 416 ms base). Default OFF.
PACKED_NARROW = False


def _as_pair(x) -> Tuple[int, int]:
    if isinstance(x, (tuple, list)):
        return (int(x[0]), int(x[1]))
    return (int(x), int(x))


@dataclasses.dataclass(frozen=True)
class ConvSpec:
    """Static configuration of one streamable conv layer."""

    in_channels: int
    out_channels: int
    kernel_size: Union[int, Tuple[int, int]]
    stride: Union[int, Tuple[int, int]] = 1
    dilation: Union[int, Tuple[int, int]] = 1
    groups: int = 1
    bias: bool = True
    causal: bool = False
    norm: str = "none"
    pad_mode: str = "reflect"
    # transposed-conv only:
    transposed: bool = False
    trim_right_ratio: float = 1.0
    # SConvTranspose2d only: ((freq_l, freq_r), (time_l, time_r)) output padding kept
    out_padding: Tuple[Tuple[int, int], Tuple[int, int]] = ((0, 0), (0, 0))

    def __post_init__(self):
        assert self.norm in CONV_NORMS, self.norm

    @property
    def ndim(self) -> int:
        return 2 if isinstance(self.kernel_size, (tuple, list)) else 1


# ---------------------------------------------------------------------------
# Initialization (matches torch Conv default: kaiming_uniform(a=sqrt(5)))
# ---------------------------------------------------------------------------


def _torch_conv_init(key, kernel_shape, fan_in, bias_shape, use_bias):
    k_key, b_key = jax.random.split(key)
    bound = 1.0 / math.sqrt(fan_in)
    kernel = jax.random.uniform(
        k_key, kernel_shape, jnp.float32, minval=-bound, maxval=bound
    )
    params = {"kernel": kernel}
    if use_bias:
        params["bias"] = jax.random.uniform(
            b_key, bias_shape, jnp.float32, minval=-bound, maxval=bound
        )
    return params


def init_conv(key, spec: ConvSpec) -> Params:
    """Initialize parameters for one conv layer.

    Kernel layouts (gather form):
      1D forward:    (K, Cin/g, Cout)
      1D transposed: (K, Cin/g, Cout)  — stored unflipped; flipped at apply
      2D forward:    (Kf, Kt, Cin/g, Cout)
      2D transposed: (Kf, Kt, Cin/g, Cout)
    Weight norm stores {"g": per-out-channel norm, "v": direction} with the
    norm taken over all non-output axes (torch weight_norm dim=0 semantics).
    """
    if spec.ndim == 1:
        k = int(spec.kernel_size)
        kernel_shape = (k, spec.in_channels // spec.groups, spec.out_channels)
        if spec.transposed:
            # torch ConvTranspose fan_in is per-input-channel: Cout/g * K
            fan_in = (spec.out_channels // spec.groups) * k
        else:
            fan_in = (spec.in_channels // spec.groups) * k
    else:
        kf, kt = _as_pair(spec.kernel_size)
        kernel_shape = (kf, kt, spec.in_channels // spec.groups, spec.out_channels)
        if spec.transposed:
            fan_in = (spec.out_channels // spec.groups) * kf * kt
        else:
            fan_in = (spec.in_channels // spec.groups) * kf * kt

    params = _torch_conv_init(
        key, kernel_shape, fan_in, (spec.out_channels,), spec.bias
    )

    if spec.norm == "weight_norm":
        kernel = params.pop("kernel")
        if spec.transposed:
            # torch weight_norm(dim=0) on ConvTranspose normalizes per INPUT
            # channel (weight (Cin, Cout, K)); Cin is axis -2 in our layout.
            axes = tuple(i for i in range(kernel.ndim) if i != kernel.ndim - 2)
        else:
            axes = tuple(range(kernel.ndim - 1))
        g = jnp.sqrt(jnp.sum(kernel**2, axis=axes, keepdims=True))
        params["v"] = kernel
        params["g"] = g
    elif spec.norm == "time_group_norm":
        params["norm_scale"] = jnp.ones((spec.out_channels,), jnp.float32)
        params["norm_bias"] = jnp.zeros((spec.out_channels,), jnp.float32)
    elif spec.norm == "layer_norm":
        params["norm_scale"] = jnp.ones((spec.out_channels,), jnp.float32)
        params["norm_bias"] = jnp.zeros((spec.out_channels,), jnp.float32)
    return params


def fused_kernel(params: Params) -> jnp.ndarray:
    """Return the effective kernel, reconstituting weight norm if present.

    `g`'s broadcast shape encodes the normalization axes (torch dim=0
    semantics: per-output-channel for forward convs, per-INPUT-channel for
    transposed ones); a 1-D `g` means the legacy per-last-axis layout.
    """
    if "kernel" in params:
        return params["kernel"]
    v, g = params["v"], params["g"]
    if g.ndim == v.ndim:
        axes = tuple(i for i in range(v.ndim) if g.shape[i] == 1)
    else:
        axes = tuple(range(v.ndim - 1))
    norm = jnp.sqrt(jnp.sum(v.astype(jnp.float32) ** 2, axis=axes, keepdims=True))
    return (v * (g / jnp.maximum(norm, 1e-12))).astype(v.dtype)


# ---------------------------------------------------------------------------
# Normalization after the conv
# ---------------------------------------------------------------------------


def _apply_post_norm(spec: ConvSpec, params: Params, y: jnp.ndarray) -> jnp.ndarray:
    if spec.norm == "time_group_norm":
        # GroupNorm(num_groups=1): normalize over channels AND spatial dims per
        # sample (conv.py:45-52 + torch.nn.GroupNorm semantics).
        axes = tuple(range(1, y.ndim))
        dt = y.dtype
        y32 = y.astype(jnp.float32)
        mean = jnp.mean(y32, axis=axes, keepdims=True)
        var = jnp.mean((y32 - mean) ** 2, axis=axes, keepdims=True)
        yn = (y32 - mean) * lax.rsqrt(var + 1e-5)
        return (yn * params["norm_scale"] + params["norm_bias"]).astype(dt)
    if spec.norm == "layer_norm":
        # ConvLayerNorm (norm.py:28): LayerNorm over the channel axis.
        dt = y.dtype
        y32 = y.astype(jnp.float32)
        mean = jnp.mean(y32, axis=-1, keepdims=True)
        var = jnp.mean((y32 - mean) ** 2, axis=-1, keepdims=True)
        yn = (y32 - mean) * lax.rsqrt(var + 1e-5)
        return (yn * params["norm_scale"] + params["norm_bias"]).astype(dt)
    return y


# ---------------------------------------------------------------------------
# Forward conv
# ---------------------------------------------------------------------------


def _conv1d_unfold_matmul(x, kernel, stride, dilation, precision):
    """Stride-1-friendly conv as K stacked shifted views + ONE matmul.

    x: (B, Tp, Cin) already padded; kernel (K, Cin, Cout). On TPU this feeds
    the MXU with an inner dimension of K*Cin instead of XLA's small-channel
    conv lowering, which is several times slower at SEANet's channel counts.
    """
    K, Cin, Cout = kernel.shape
    B, Tp, _ = x.shape
    Tout = (Tp - (K - 1) * dilation - 1) // stride + 1
    cols = [
        lax.slice(
            x,
            (0, k * dilation, 0),
            (B, k * dilation + (Tout - 1) * stride + 1, Cin),
            (1, stride, 1),
        )
        for k in range(K)
    ]
    xu = jnp.concatenate(cols, axis=-1)  # (B, Tout, K*Cin)
    return jnp.matmul(xu, kernel.reshape(K * Cin, Cout), precision=precision)


def _conv1d_strided_matmul(x, kernel, stride, precision):
    """Strided conv with s | K via time-to-channel reshape + unfold matmul.

    Folding the stride into channels makes the contraction dimension
    K*Cin >= 128 for every SEANet downsample conv, so the whole layer is one
    MXU matmul instead of XLA's strided-conv lowering.
    """
    K, Cin, Cout = kernel.shape
    s = stride
    assert K % s == 0
    B, Tp, _ = x.shape
    Tout = (Tp - K) // s + 1
    taps = K // s
    Tr = (Tout - 1 + taps) * s  # <= Tp by construction of the padding
    xr = x[:, :Tr].reshape(B, Tr // s, s * Cin)
    cols = [xr[:, j : j + Tout] for j in range(taps)]
    xu = jnp.concatenate(cols, axis=-1)  # (B, Tout, K*Cin)
    # tap ordering: y[t] = sum_{j,r} x[t*s + j*s + r] W[j*s + r]
    w = kernel.reshape(taps, s * Cin, Cout).reshape(K * Cin, Cout)
    return jnp.matmul(xu, w, precision=precision)


# Fold the streamable padding into the conv op (no materialized pad copy)
# and patch the few edge outputs that reflect/replicate padding changes.
# v5e A/B (EnCodec nq32, B=256 x 10s, bf16, best-of-6):
#   materialized pad (this default) 423ms | fold + exact edge fixups 438ms |
#   fold w/o fixups (zero-pad numerics) 348ms.
# The theoretical win is real (one memory pass per conv) but
# dynamic_update_slice edge splices are not lowered in place, eating the
# gain — an in-place-edged fused conv is the Pallas target for this.
FOLD_PADDING = False


def _conv1d_raw(x, kernel, s, d, groups, padding, precision):
    return lax.conv_general_dilated(
        x,
        kernel,
        window_strides=(s,),
        padding=[padding],
        rhs_dilation=(d,),
        dimension_numbers=("NWC", "WIO", "NWC"),
        feature_group_count=groups,
        precision=precision,
    )


def _sconv1d_folded(spec, kernel, x, left, right_total, precision):
    """Zero-pad folded into the conv + exact edge fixups for reflect/replicate.

    Implicit zero padding differs from the requested pad_mode only on outputs
    whose receptive field touches padded samples; those few frames are
    recomputed from explicitly padded slices and spliced back in.
    """
    k = int(spec.kernel_size)
    s = int(spec.stride)
    d = int(spec.dilation)
    T = x.shape[1]
    span_k = (k - 1) * d  # receptive span minus one

    y = _conv1d_raw(x, kernel, s, d, spec.groups, (left, right_total), precision)
    if spec.pad_mode in ("zero", "constant"):
        return y
    Tout = y.shape[1]

    def fallback():
        xp = pad1d_time(x, (left, right_total), mode=spec.pad_mode)
        return _conv1d_raw(xp, kernel, s, d, spec.groups, (0, 0), precision)

    # left edge: outputs t with t*s < left read padded samples
    n_left = min(-(-left // s), Tout) if left > 0 else 0
    if n_left > 0:
        # slice must cover both the receptive fields of the first n_left
        # outputs AND the samples the reflection mirrors (left + 1)
        span = max((n_left - 1) * s - left + span_k + 1, left + 1)
        if span > T:
            return fallback()
        xl = pad1d_time(x[:, :span], (left, 0), mode=spec.pad_mode)
        yl = _conv1d_raw(xl, kernel, s, d, spec.groups, (0, 0), precision)
        # every output of this slice conv is exact; splice them all
        n_l = min(yl.shape[1], Tout)
        y = lax.dynamic_update_slice(y, yl[:, :n_l], (0, 0, 0))

    # right edge: outputs whose window end t*s - left + span_k > T-1
    if right_total > 0:
        t0 = max((T - 1 + left - span_k) // s + 1, 0)
        t0 = min(t0, Tout)
        if Tout - t0 > 0:
            # move the slice start left (s-aligned) until the reflection's
            # mirror source (right_total samples before the edge) is covered
            t0 = min(t0, (T - right_total - 1 + left) // s)
            start = t0 * s - left
            if t0 < 0 or start < 0:
                return fallback()
            xr = pad1d_time(x[:, start:], (0, right_total), mode=spec.pad_mode)
            yr = _conv1d_raw(xr, kernel, s, d, spec.groups, (0, 0), precision)
            n_r = min(yr.shape[1], Tout - t0)
            y = lax.dynamic_update_slice(y, yr[:, :n_r], (0, t0, 0))
    return y


def apply_sconv1d(
    spec: ConvSpec,
    params: Params,
    x: jnp.ndarray,
    precision=None,
) -> jnp.ndarray:
    """SConv1d on (B, T, C). Reference: conv.py:243-261."""
    assert not spec.transposed
    k = int(spec.kernel_size)
    s = int(spec.stride)
    d = int(spec.dilation)
    padding_total = conv_padding_total(k, s, d)
    extra = extra_padding_for_conv1d(x.shape[1], k, s, padding_total)
    left, right = split_padding(padding_total, spec.causal)
    kernel = fused_kernel(params).astype(x.dtype)

    if PALLAS_STRIDE1 and s == 1 and spec.groups == 1 and k > 1:
        from funcodec_tpu.ops.conv_pallas import fused_conv1d_s1

        y = fused_conv1d_s1(
            x,
            kernel,
            params.get("bias", jnp.zeros((spec.out_channels,), x.dtype)),
            left,
            right + extra,  # extra == 0 for s == 1
            dilation=d,
            pad_mode=spec.pad_mode,
        )
        if y is not None:
            return _apply_post_norm(spec, params, y)

    max_pad = max(left, right + extra)
    foldable = (
        FOLD_PADDING
        and not (MATMUL_STRIDED or MATMUL_STRIDE1)
        and x.shape[1] > max_pad  # pad1d small-input fixup regime excluded
    )
    if foldable:
        y = _sconv1d_folded(spec, kernel, x, left, right + extra, precision)
    else:
        x = pad1d_time(x, (left, right + extra), mode=spec.pad_mode)
        if spec.groups == 1 and k > 1 and s > 1 and k % s == 0 and d == 1 and MATMUL_STRIDED:
            y = _conv1d_strided_matmul(x, kernel, s, precision)
        elif spec.groups == 1 and k > 1 and s == 1 and MATMUL_STRIDE1:
            y = _conv1d_unfold_matmul(x, kernel, s, d, precision)
        else:
            y = _conv1d_raw(x, kernel, s, d, spec.groups, (0, 0), precision)
    if "bias" in params:
        y = y + params["bias"].astype(y.dtype)
    return _apply_post_norm(spec, params, y)


def apply_sconv1d_act(spec: ConvSpec, params: Params, x: jnp.ndarray,
                      act: str = "elu", precision=None) -> jnp.ndarray:
    """act -> SConv1d, fused into one Pallas kernel when the layer qualifies
    (saves the full HBM round-trip of the standalone activation). Falls back
    to act-then-apply_sconv1d. Used by the SEANet act+conv peephole."""
    k, s, d = int(spec.kernel_size), int(spec.stride), int(spec.dilation)
    if PALLAS_STRIDE1 and not spec.transposed and s == 1 and spec.groups == 1 and k > 1:
        from funcodec_tpu.ops.conv_pallas import fused_conv1d_s1

        padding_total = conv_padding_total(k, s, d)
        left, right = split_padding(padding_total, spec.causal)
        kernel = fused_kernel(params).astype(x.dtype)
        y = fused_conv1d_s1(
            x, kernel,
            params.get("bias", jnp.zeros((spec.out_channels,), x.dtype)),
            left, right, dilation=d, pad_mode=spec.pad_mode, act=act,
        )
        if y is not None:
            return _apply_post_norm(spec, params, y)
    from funcodec_tpu.ops import activations as act_ops

    if act != "elu":
        raise ValueError(f"apply_sconv1d_act fallback only supports elu, got {act}")
    return apply_sconv1d(
        spec, params, act_ops.get_activation_fn("ELU", alpha=1.0)(x),
        precision=precision,
    )


def apply_sconv_transpose1d(
    spec: ConvSpec,
    params: Params,
    x: jnp.ndarray,
    precision=None,
) -> jnp.ndarray:
    """SConvTranspose1d on (B, T, C). Reference: conv.py:281-305.

    Computed as a gather conv with lhs_dilation = stride; output length
    (T-1)*s + K, then fixed padding K - s trimmed per causal/trim_right_ratio.
    """
    assert spec.transposed
    k = int(spec.kernel_size)
    s = int(spec.stride)
    padding_total = k - s

    stored = fused_kernel(params).astype(x.dtype)  # (K, Cin, Cout) torch-tap order
    if spec.groups == 1 and s > 1 and k % s == 0 and MATMUL_TRANSPOSED:
        # Subpixel formulation: y[n*s + r] = sum_j x[n - j] @ W[j*s + r]
        # (j in [0, K/s)) — one stride-1 unfold matmul producing s output
        # phases, then depth-to-space. Keeps the MXU contraction at K/s*Cin.
        K, Cin, Cout = stored.shape
        taps = k // s
        B, T, _ = x.shape
        # output positions t = n*s + r with n in [0, T+taps-1): total
        # (T+taps-1)*s = (T-1)*s + K, the full un-trimmed transposed length.
        N = T + taps - 1
        xp = jnp.pad(x, [(0, 0), (taps - 1, taps - 1), (0, 0)])
        cols = [xp[:, taps - 1 - j : taps - 1 - j + N] for j in range(taps)]
        xu = jnp.concatenate(cols, axis=-1)  # (B, N, taps*Cin), col j = x[n-j]
        # w[j*Cin + c, r*Cout + o] = stored[j*s + r, c, o]
        w = stored.reshape(taps, s, Cin, Cout)
        w = jnp.transpose(w, (0, 2, 1, 3)).reshape(taps * Cin, s * Cout)
        y = jnp.matmul(xu, w, precision=precision)  # (B, N, s*Cout)
        y = y.reshape(B, N * s, Cout)
    else:
        kernel = jnp.flip(stored, axis=0)
        y = lax.conv_general_dilated(
            x,
            kernel,
            window_strides=(1,),
            padding=[(k - 1, k - 1)],
            lhs_dilation=(s,),
            dimension_numbers=("NWC", "WIO", "NWC"),
            feature_group_count=spec.groups,
            precision=precision,
        )
    if "bias" in params:
        y = y + params["bias"].astype(y.dtype)
    y = _apply_post_norm(spec, params, y)

    if spec.causal:
        padding_right = math.ceil(padding_total * spec.trim_right_ratio)
        padding_left = padding_total - padding_right
    else:
        padding_right = padding_total // 2
        padding_left = padding_total - padding_right
    return unpad1d_time(y, (padding_left, padding_right))


def apply_sconv2d(
    spec: ConvSpec,
    params: Params,
    x: jnp.ndarray,
    precision=None,
) -> jnp.ndarray:
    """SConv2d on (B, F, T, C); freq axis always padded non-causally.

    Reference: conv.py:342-378 (time-axis extra padding from
    get_extra_padding_for_conv1d on the time length; freq extra = 0).
    """
    assert not spec.transposed
    kf, kt = _as_pair(spec.kernel_size)
    sf, st = _as_pair(spec.stride)
    df, dt_ = _as_pair(spec.dilation)

    pt_f = conv_padding_total(kf, sf, df)
    pt_t = conv_padding_total(kt, st, dt_)
    extra_t = extra_padding_for_conv1d(x.shape[2], kt, st, pt_t)

    freq_after = pt_f // 2
    freq_before = pt_f - freq_after
    if spec.causal:
        # causal time axis: all fixed padding left, extra right (conv.py:361-368)
        time_before, time_after = pt_t, extra_t
    else:
        # NOTE: unlike SConv1d, the reference adds the extra padding on the
        # LEFT of the time axis in the non-causal 2D case (conv.py:373-374).
        time_after = pt_t // 2
        time_before = pt_t - time_after + extra_t
    x = pad2d_freq_time(
        x, (time_before, time_after), (freq_before, freq_after), mode=spec.pad_mode
    )

    kernel = fused_kernel(params).astype(x.dtype)
    y = lax.conv_general_dilated(
        x,
        kernel,
        window_strides=(sf, st),
        padding=[(0, 0), (0, 0)],
        rhs_dilation=(df, dt_),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=spec.groups,
        precision=precision,
    )
    if "bias" in params:
        y = y + params["bias"].astype(y.dtype)
    return _apply_post_norm(spec, params, y)


def apply_sconv_transpose2d(
    spec: ConvSpec,
    params: Params,
    x: jnp.ndarray,
    precision=None,
) -> jnp.ndarray:
    """SConvTranspose2d on (B, F, T, C). Reference: conv.py:407-447."""
    assert spec.transposed
    kf, kt = _as_pair(spec.kernel_size)
    sf, st = _as_pair(spec.stride)
    pt_f = kf - sf
    pt_t = kt - st

    kernel = jnp.flip(fused_kernel(params), axis=(0, 1)).astype(x.dtype)
    y = lax.conv_general_dilated(
        x,
        kernel,
        window_strides=(1, 1),
        padding=[(kf - 1, kf - 1), (kt - 1, kt - 1)],
        lhs_dilation=(sf, st),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=spec.groups,
        precision=precision,
    )
    if "bias" in params:
        y = y + params["bias"].astype(y.dtype)
    y = _apply_post_norm(spec, params, y)

    (f_out_l, f_out_r), (t_out_l, t_out_r) = spec.out_padding
    pad_f_right = pt_f // 2
    pad_f_left = pt_f - pad_f_right
    if spec.causal:
        pad_t_right = math.ceil(pt_t * spec.trim_right_ratio)
        pad_t_left = pt_t - pad_t_right
    else:
        pad_t_right = pt_t // 2
        pad_t_left = pt_t - pad_t_right
    return unpad2d_freq_time(
        y,
        (max(pad_t_left - t_out_l, 0), max(pad_t_right - t_out_r, 0)),
        (max(pad_f_left - f_out_l, 0), max(pad_f_right - f_out_r, 0)),
    )


def apply_conv(spec: ConvSpec, params: Params, x: jnp.ndarray, precision=None):
    """Dispatch on spec (1D/2D, forward/transposed)."""
    if spec.ndim == 1:
        fn = apply_sconv_transpose1d if spec.transposed else apply_sconv1d
    else:
        fn = apply_sconv_transpose2d if spec.transposed else apply_sconv2d
    return fn(spec, params, x, precision=precision)
