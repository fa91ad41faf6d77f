"""Packed narrow-stage execution: run C<128 sections at full 128-lane width.

WHY: XLA's TPU layouts lane-pad the channel axis, so a (B, T, 32) bf16
activation physically occupies ~4x its logical bytes and every op on it moves
4x traffic (measured: scripts/layout_probe.py — 130 GB/s logical for an
elementwise pass). The early SEANet encoder stages (C=32/64 at T up to 160k)
dominate the HBM-bound serving path, so the fix is to keep those activations
in a packed (B, T/f, f*C = 128) view across the whole section and give every
conv block-Toeplitz packed weights (full-lane MXU contractions).

The view change is exact: packed row u holds timesteps [u*f, (u+1)*f); sums
over (T, C) equal sums over (T/f, f*C), so time_group_norm statistics and
losses are unchanged. Only the boundary reshape (pack after the first conv,
unpack when C reaches 128 — the latter is free at f=1) touches layout.

Used by models/seanet.py:apply_layers_packed when ops/conv.PACKED_NARROW is
on; the fused Pallas resblock (ops/resblock_pallas.py) consumes the packed
view directly.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax.numpy as jnp
from jax import lax

from funcodec_tpu.ops.conv import ConvSpec, Params, fused_kernel
from funcodec_tpu.ops.conv_pallas import pack_weights_strided
from funcodec_tpu.ops.pad import (
    conv_padding_total,
    extra_padding_for_conv1d,
    split_padding,
)


def pack_factor(C: int) -> int:
    """f such that f*C == 128, or 1 when C >= 128 (f=1 means 'not packed')."""
    if C < 128 and C >= 8 and 128 % C == 0:
        return 128 // C
    return 1


def unpack_rows(xp: jnp.ndarray, f: int, C: int, start: int, stop: int) -> jnp.ndarray:
    """Original-space rows x[:, start:stop] recovered from the packed view
    (small slices only — used for reflect/replicate edge values)."""
    B = xp.shape[0]
    r0, r1 = start // f, -(-stop // f)
    chunk = xp[:, r0:r1].reshape(B, (r1 - r0) * f, C)
    return chunk[:, start - r0 * f : stop - r0 * f]


def packed_edge_values(
    xp: jnp.ndarray, f: int, C: int, T: int, left: int, right: int, pad_mode: str
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Left/right pad VALUES in original space (pad1d_time semantics for
    T >> pad), computed from the packed view without unpacking the tensor."""
    B = xp.shape[0]
    if pad_mode == "reflect":
        l = (
            jnp.flip(unpack_rows(xp, f, C, 1, left + 1), axis=1)
            if left > 0
            else jnp.zeros((B, 0, C), xp.dtype)
        )
        r = (
            jnp.flip(unpack_rows(xp, f, C, T - right - 1, T - 1), axis=1)
            if right > 0
            else jnp.zeros((B, 0, C), xp.dtype)
        )
    elif pad_mode == "replicate":
        l = jnp.repeat(unpack_rows(xp, f, C, 0, 1), max(left, 0), axis=1)
        r = jnp.repeat(unpack_rows(xp, f, C, T - 1, T), max(right, 0), axis=1)
    elif pad_mode in ("constant", "zero"):
        l = jnp.zeros((B, max(left, 0), C), xp.dtype)
        r = jnp.zeros((B, max(right, 0), C), xp.dtype)
    else:
        raise ValueError(pad_mode)
    return l, r


def plan_packed_conv(spec: ConvSpec, T: int) -> Optional[dict]:
    """Static plan for running a forward 1D conv between packed views.
    Returns None when the shape doesn't qualify (caller unpacks)."""
    if spec.ndim != 1 or spec.transposed or spec.groups != 1:
        return None
    if spec.norm == "layer_norm":
        # layer_norm is per-timestep over channels; packed rows mix f
        # timesteps, so the lane-axis reduction would be wrong
        return None
    C_in, C_out = spec.in_channels, spec.out_channels
    f_in, f_out = pack_factor(C_in), pack_factor(C_out)
    if f_in * C_in != 128:
        return None
    if f_out * C_out % 128 != 0:
        return None
    k, s, d = int(spec.kernel_size), int(spec.stride), int(spec.dilation)
    # Two lowerings:
    #  - "strided": output packed directly at f_out; packed-row stride
    #    s_p = s*f_out/f_in must be a positive integer (down-channel convs,
    #    strided downsamples).
    #  - "square": s == 1 up-channel convs (f_out < f_in) pack the output at
    #    f_in (lanes f_in*C_out, a multiple of 128 when C_in | C_out) and a
    #    row-split reshape restores the f_out view afterwards.
    if (s * f_out) % f_in == 0 and (s * f_out) // f_in >= 1:
        mode = "strided"
        f_pack = f_out
        s_p = (s * f_out) // f_in
    elif (
        s == 1
        and f_out < f_in
        and f_in % max(f_out, 1) == 0
        and (f_in * C_out) % 128 == 0
    ):
        mode = "square"
        f_pack = f_in
        s_p = 1
    else:
        return None
    if T % f_in != 0:
        return None
    total = conv_padding_total(k, s, d)
    extra = extra_padding_for_conv1d(T, k, s, total)
    left, right = split_padding(total, spec.causal)
    right += extra
    if T <= max(left, right):  # pad1d small-input fixup regime
        return None
    T_out = (T + total + extra - ((k - 1) * d + 1)) // s + 1
    if T_out % max(f_out, 1) != 0 or T_out % f_pack != 0:
        return None
    af = (-left) % f_in
    J = (s * (f_pack - 1) + (k - 1) * d + af) // f_in + 1
    left_p = (left + af) // f_in
    rows_needed = (T_out // f_pack - 1) * s_p + J
    right_p = rows_needed - left_p - T // f_in
    if right_p < 0 or right_p * f_in < right:
        return None
    return dict(
        mode=mode, f_in=f_in, f_out=f_out, f_pack=f_pack, s_p=s_p, af=af, J=J,
        left=left, right=right, left_p=left_p, right_p=right_p,
        T_out=T_out, k=k, s=s, d=d,
    )


def apply_sconv1d_packed(
    spec: ConvSpec,
    params: Params,
    xp: jnp.ndarray,  # (B, T/f_in, 128)
    T: int,
    precision=None,
) -> Optional[Tuple[jnp.ndarray, int, int]]:
    """SConv1d on a packed view. Returns (yp, T_out, f_out) with yp shaped
    (B, T_out/f_out, f_out*C_out), or None when the plan doesn't qualify.

    Semantics match ops/conv.apply_sconv1d exactly (same padding math, bias,
    and time_group_norm post-norm — statistics are packing-invariant)."""
    plan = plan_packed_conv(spec, T)
    if plan is None:
        return None
    B = xp.shape[0]
    C_in, C_out = spec.in_channels, spec.out_channels
    f_in, f_out, f_pack = plan["f_in"], plan["f_out"], plan["f_pack"]
    af, J, s_p = plan["af"], plan["J"], plan["s_p"]
    left, right = plan["left"], plan["right"]
    left_p, right_p = plan["left_p"], plan["right_p"]
    T_out = plan["T_out"]

    kernel = fused_kernel(params).astype(xp.dtype)  # (K, C_in, C_out)
    wp = pack_weights_strided(
        kernel, f_in, f_pack, plan["s"], af, plan["d"], J
    )  # (J, 128, f_pack*C_out)

    lvals, rvals = packed_edge_values(
        xp, f_in, C_in, T, left, right, spec.pad_mode
    )
    pieces = [xp]
    if left_p > 0:
        lp = jnp.concatenate(
            [jnp.zeros((B, af, C_in), xp.dtype), lvals], axis=1
        ).reshape(B, left_p, f_in * C_in)
        pieces.insert(0, lp)
    if right_p > 0:
        fill = right_p * f_in - right
        rp = jnp.concatenate(
            [rvals, jnp.zeros((B, fill, C_in), xp.dtype)], axis=1
        ).reshape(B, right_p, f_in * C_in)
        pieces.append(rp)
    ep = jnp.concatenate(pieces, axis=1) if len(pieces) > 1 else xp

    yp = lax.conv_general_dilated(
        ep,
        wp,
        window_strides=(s_p,),
        padding=[(0, 0)],
        dimension_numbers=("NWC", "WIO", "NWC"),
        precision=precision,
    )  # (B, T_out/f_pack, f_pack*C_out)
    if "bias" in params:
        yp = yp + jnp.tile(params["bias"], f_pack).astype(yp.dtype)
    if spec.norm == "time_group_norm":
        # GroupNorm(1): per-sample stats over (T, C) == over the packed view
        dt = yp.dtype
        y32 = yp.astype(jnp.float32)
        mean = jnp.mean(y32, axis=(1, 2), keepdims=True)
        var = jnp.mean((y32 - mean) ** 2, axis=(1, 2), keepdims=True)
        yn = (y32 - mean) * lax.rsqrt(var + 1e-5)
        scale = jnp.tile(params["norm_scale"], f_pack)
        bias_n = jnp.tile(params["norm_bias"], f_pack)
        yp = (yn * scale + bias_n).astype(dt)
    if f_pack != f_out:
        # square lowering: split each f_pack-row into f_pack/f_out rows
        # (row-major contiguous — logical reshape only)
        yp = yp.reshape(B, T_out // f_out, f_out * C_out)
    return yp, T_out, f_out
