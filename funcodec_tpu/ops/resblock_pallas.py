"""Whole-resblock fused Pallas kernel for time_group_norm SEANet stacks.

WHY: the serving-path roofline (NOTES_ROUND2) shows EnCodec inference is
HBM-bandwidth-bound, and 2/3 of the conv-stack time is NOT the convs — it is
the reflect-pad materializations, the time_group_norm reduce/normalize passes
and the residual elementwise traffic around them. XLA cannot fuse across a
GroupNorm(num_groups=1) because its statistics are a *global* per-sample
reduction over (T, C) that sits between every conv and its consumer
(behavioral reference: funcodec/models/encoder/seanet_encoder.py:16-61
SEANetResnetBlock = [ELU, SConv1d(k,d), ELU, SConv1d(1)] + 1x1 shortcut,
each conv followed by nn.GroupNorm(1, C) per normed_modules/conv.py:45-52).
Worse, XLA lane-pads narrow channel dims (C=32 -> 128 lanes), so the wide
early stages move ~4x their logical bytes (measured: scripts/layout_probe.py,
130 GB/s logical for an elementwise pass over (B, T, 32) bf16).

DESIGN: the convs at the bandwidth-dominant stages are so cheap relative to
the traffic that RECOMPUTING them is free. The whole residual block runs as
three streaming passes over x, with no intermediate tensor ever written to
HBM:

  pass A: read x -> b = conv1(ELU(x)), s = shortcut(x)
          emit per-tile partial (sum, sumsq) of b and s   [stats only]
  pass B: read x -> recompute b -> c = conv2(ELU(tgn1(b)))
          emit partial (sum, sumsq) of c                  [stats only]
  pass C: read x -> recompute b, c, s -> out = tgn2(c) + tgn3(s)  [write out]

HBM traffic: 3 reads of x + 1 write of out (~4 tensor passes, all at full
128-lane packing) vs ~15 lane-padded passes for the unfused XLA chain.
Between passes, the tiny partials are finalized in XLA into per-(sample,
channel) affine rows A = rs*gamma, D = beta - mu*rs*gamma, so in-kernel
normalization is a single fused multiply-add.

Each pass is a (B, n_t) grid whose x tile is a regular blocked input —
Pallas's automatic pipeline double-buffers the HBM->VMEM streams (measured
much faster than hand-rolled DMA with per-step edge splices, the first
version of this kernel). The conv halo rows (J-1 per tile, including the
global reflect/replicate pad values) ride in a tiny precomputed side input,
so the steady-state step does zero conditional work. Narrow-channel stages
(C in {8,...,64}) use the channel-packed lowering from ops/conv_pallas.py:
x viewed as (B, T/f, f*C=128), convs become stride-1 J-tap block-Toeplitz
matmuls — full 128-lane MXU contractions.

Scope: 1D, stride-1, groups=1 convs, norm == time_group_norm on all three
convs (every shipped EnCodec/LibriTTS config); dilation/causality/pad modes
per conv_pallas's packing math; packed length Tp must have a mult-of-8
divisor in [256, 8192] to tile evenly (bucketed inference lengths do).
Other shapes return None and the caller keeps the XLA path.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from funcodec_tpu.ops.conv_pallas import _pack_weights
from funcodec_tpu.ops.pad import conv_padding_total, split_padding

# Global interpret-mode switch for CPU tests (mirrors conv_pallas.INTERPRET).
INTERPRET = False


def _elu(x):
    xf = x.astype(jnp.float32)
    return jnp.where(xf > 0, xf, jnp.exp(jnp.minimum(xf, 0.0)) - 1.0)


def _pick_even_tile(Tp: int, lo: int = 256, hi: int = 8192) -> Optional[int]:
    """Largest mult-of-8 divisor of Tp in [lo, hi] (even tiling, no raggedness)."""
    best = None
    for d in range(8, hi + 1, 8):
        if Tp % d == 0 and d >= lo:
            best = d
    if best is None and Tp % 8 == 0 and lo <= Tp <= hi:
        best = Tp
    if best is None and Tp <= hi and Tp % 8 == 0:
        best = Tp  # single tile
    return best


def _rb_kernel(
    tile_ref,  # (1, TILE, L) VMEM — x rows [t*TILE, (t+1)*TILE), auto-pipelined
    hal_ref,   # (1, 1, 8, L) VMEM — rows 0:Hl = left halo, Hl:Hl+Hr = right halo
    w1,        # (J, L, Lb) VMEM — packed conv1 taps
    w2,        # (Lb, L) VMEM — packed conv2 (k=1, block-diagonal)
    ws,        # (L, L) VMEM — packed shortcut (k=1, block-diagonal)
    bias,      # (8, L) f32 VMEM — row 0: b1 (lanes :Lb), 1: b2, 2: bs
    aff,       # (B, 8, L) f32 VMEM — rows (A1,D1,A2,D2,A3,D3) per sample
    o_ref,     # mode 0/1: (1,1,8,128) f32 partials; mode 2: (1,TILE,L) out
    *,
    mode, J, Hl, Hr, TILE, Lb, L,
):
    b_i = pl.program_id(0)
    xt = tile_ref[0]  # (TILE, L)
    dt = xt.dtype

    if Hl + Hr > 0:
        pieces = []
        if Hl > 0:
            pieces.append(hal_ref[0, 0, 0:Hl, :])
        pieces.append(xt)
        if Hr > 0:
            pieces.append(hal_ref[0, 0, Hl : Hl + Hr, :])
        xe = jnp.concatenate(pieces, axis=0)  # (Hl+TILE+Hr, L), one copy
    else:
        xe = xt

    affb = aff[b_i]  # (8, L) f32

    # conv1: b = ELU(x) (*) W1 — J offset-slice matmuls on the MXU
    ue = _elu(xe).astype(dt)
    acc = jnp.zeros((TILE, Lb), jnp.float32)
    for j in range(J):
        acc = acc + jnp.dot(
            ue[j : j + TILE, :], w1[j], preferred_element_type=jnp.float32
        )
    b_r = (acc + bias[0:1, :Lb]).astype(dt)  # round like the XLA conv output

    def srow(*vals):  # (8,128) partials block
        rows = [jnp.full((1, 128), v, jnp.float32) for v in vals]
        rows += [jnp.zeros((1, 128), jnp.float32)] * (8 - len(rows))
        return jnp.concatenate(rows, axis=0)

    def sums(v):  # f32 sum + sumsq (even tiling: no masking needed)
        vf = v.astype(jnp.float32)
        return jnp.sum(vf), jnp.sum(vf * vf)

    if mode == 0:
        s_r = (
            jnp.dot(xt, ws[...], preferred_element_type=jnp.float32) + bias[2:3, :]
        ).astype(dt)
        sb, sqb = sums(b_r)
        ss, sqs = sums(s_r)
        o_ref[0, 0] = srow(sb, sqb, ss, sqs)
        return

    # tgn1 as per-sample affine rows, then conv2
    bn = b_r.astype(jnp.float32) * affb[0:1, :Lb] + affb[1:2, :Lb]
    v = _elu(bn).astype(dt)
    c_r = (
        jnp.dot(v, w2[...], preferred_element_type=jnp.float32) + bias[1:2, :]
    ).astype(dt)

    if mode == 1:
        sc, sqc = sums(c_r)
        o_ref[0, 0] = srow(sc, sqc)
        return

    # mode 2: out = tgn2(c) + tgn3(s)
    s_r = (
        jnp.dot(xt, ws[...], preferred_element_type=jnp.float32) + bias[2:3, :]
    ).astype(dt)
    cn = (c_r.astype(jnp.float32) * affb[2:3, :] + affb[3:4, :]).astype(dt)
    sn = (s_r.astype(jnp.float32) * affb[4:5, :] + affb[5:6, :]).astype(dt)
    o_ref[0] = cn + sn


@functools.partial(
    jax.jit, static_argnames=("mode", "J", "Hl", "Hr", "tile", "Lb", "interpret")
)
def _rb_pass(xp, hal, w1, w2, ws, bias, aff, mode, J, Hl, Hr, tile, Lb, interpret):
    B, Tp, L = xp.shape
    n_t = Tp // tile

    if mode == 2:
        out_shape = jax.ShapeDtypeStruct((B, Tp, L), xp.dtype)
        out_spec = pl.BlockSpec(
            (1, tile, L), lambda b, t: (b, t, 0), memory_space=pltpu.VMEM
        )
    else:
        out_shape = jax.ShapeDtypeStruct((B, n_t, 8, 128), jnp.float32)
        out_spec = pl.BlockSpec(
            (1, 1, 8, 128), lambda b, t: (b, t, 0, 0), memory_space=pltpu.VMEM
        )

    return pl.pallas_call(
        functools.partial(
            _rb_kernel, mode=mode, J=J, Hl=Hl, Hr=Hr, TILE=tile, Lb=Lb, L=L
        ),
        grid=(B, n_t),
        in_specs=[
            pl.BlockSpec((1, tile, L), lambda b, t: (b, t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 8, L), lambda b, t: (b, t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=out_spec,
        out_shape=out_shape,
        interpret=interpret,
    )(xp, hal, w1, w2, ws, bias, aff)


def _build_halo(xp, lp, rp, tile, Hl, Hr):
    """(B, n_t, 8, L) side input: per tile, rows 0:Hl = x rows just before the
    tile (tile 0: the global left-pad values), rows Hl:Hl+Hr = x rows just
    after (last tile: the global right-pad values). Tiny gather in XLA."""
    B, Tp, L = xp.shape
    n_t = Tp // tile
    pieces = []
    if Hl > 0:
        idx = (
            jnp.arange(n_t)[:, None] * tile - Hl + jnp.arange(Hl)[None, :]
        )  # (n_t, Hl); negative only at t=0
        left = jnp.take(xp, jnp.clip(idx, 0, Tp - 1).reshape(-1), axis=1)
        left = left.reshape(B, n_t, Hl, L)
        left = left.at[:, 0].set(lp[:, :Hl])
        pieces.append(left)
    if Hr > 0:
        idx = (
            (jnp.arange(n_t)[:, None] + 1) * tile + jnp.arange(Hr)[None, :]
        )  # (n_t, Hr); out of range only at t=n_t-1
        rgt = jnp.take(xp, jnp.clip(idx, 0, Tp - 1).reshape(-1), axis=1)
        rgt = rgt.reshape(B, n_t, Hr, L)
        rgt = rgt.at[:, n_t - 1].set(rp[:, :Hr])
        pieces.append(rgt)
    pad = 8 - (Hl + Hr)
    if pad > 0 or not pieces:
        pieces.append(jnp.zeros((B, n_t, 8 - (Hl + Hr), L), xp.dtype))
    return jnp.concatenate(pieces, axis=2)


def _finalize_affine(s, sq, n_elems, gamma, beta, f, eps=1e-5):
    """(sum, sumsq) per sample -> per-(sample, lane) affine A, D with
    tgn semantics: y_n = (y - mu) * rsqrt(var + eps) * gamma + beta."""
    mu = s / n_elems
    var = jnp.maximum(sq / n_elems - mu * mu, 0.0)
    rs = lax.rsqrt(var + eps)
    g = jnp.tile(gamma.astype(jnp.float32), f)[None, :]  # (1, lanes)
    be = jnp.tile(beta.astype(jnp.float32), f)[None, :]
    A = rs[:, None] * g
    D = be - (mu * rs)[:, None] * g
    return A, D


def fused_resblock_tgn(
    x: jnp.ndarray,   # (B, T, C), or (B, T/f, 128) when packed_f=f is given
    p1, p2, ps,       # conv param dicts {kernel, bias, norm_scale, norm_bias}
    spec1, spec2, spec_s,  # ConvSpec for conv1 (k,d), conv2 (1x1), shortcut (1x1)
    tile: Optional[int] = None,
    interpret: Optional[bool] = None,
    packed_f: Optional[int] = None,
) -> Optional[jnp.ndarray]:
    """Fused [ELU->conv(k,d)->tgn->ELU->conv(1)->tgn] + [1x1 shortcut->tgn] add.

    Returns (B, T, C), or None when the shapes/specs don't qualify (caller
    falls back to the XLA path). Differentiable: backward replays the exact
    XLA composition via jax.vjp (the fused path is a forward optimization).

    With `packed_f`, x is ALREADY the packed (B, T/f, f*C=128) view
    (ops/packed.py narrow-stage execution) and the result stays packed — no
    boundary relayout is paid.
    """
    if packed_f is not None:
        B, Tp_in, L_in = x.shape
        C = spec1.in_channels
        if packed_f * C != L_in:
            return None
        T = Tp_in * packed_f
    else:
        B, T, C = x.shape
    if spec1.ndim != 1 or spec2.ndim != 1 or spec_s.ndim != 1:
        return None
    for sp in (spec1, spec2, spec_s):
        if sp.transposed or int(sp.stride) != 1 or sp.groups != 1:
            return None
        if sp.norm != "time_group_norm":
            return None
    if int(spec2.kernel_size) != 1 or int(spec_s.kernel_size) != 1:
        return None
    K, d = int(spec1.kernel_size), int(spec1.dilation)
    if K < 2:
        return None
    if spec1.pad_mode not in ("reflect", "replicate", "constant", "zero"):
        return None
    H = spec1.out_channels  # hidden dim (C // compress)
    if spec2.in_channels != H or spec2.out_channels != C or spec_s.out_channels != C:
        return None

    # packing plan (conv_pallas._plan semantics)
    if C % 128 == 0:
        f, L = 1, C
    elif 128 % C == 0 and C >= 8:
        f, L = 128 // C, 128
    else:
        return None
    if packed_f is not None and packed_f != f:
        return None
    if T % f != 0 or (H * f) % 8 != 0:
        return None
    Lb = H * f
    if Lb > L:
        return None
    Tp = T // f

    span = (K - 1) * d + 1
    total = conv_padding_total(K, 1, d)
    left_o, right_o = split_padding(total, spec1.causal)
    if T <= max(left_o, right_o):  # pad1d small-input fixup regime
        return None
    af = (-left_o) % f
    J = (af + span - 2 + f) // f + 1
    Hl = (left_o + af) // f
    Hr = (J - 1) - Hl
    if Hl + Hr > 8:  # halo block carries up to 8 rows
        return None

    tile_s = tile if tile is not None else _pick_even_tile(Tp)
    if tile_s is None or Tp % tile_s != 0 or tile_s < max(Hl, Hr, 8):
        return None
    if interpret is None:
        interpret = INTERPRET

    from funcodec_tpu.ops.conv import fused_kernel

    def xla_ref(x_, p1_, p2_, ps_):
        """Exact unfused composition — backward path and numerics oracle."""
        from funcodec_tpu.ops.conv import apply_sconv1d

        xo = x_.reshape(B, T, C) if packed_f is not None else x_
        h = apply_sconv1d(spec1, p1_, _elu(xo).astype(xo.dtype))
        c = apply_sconv1d(spec2, p2_, _elu(h).astype(h.dtype))
        s = apply_sconv1d(spec_s, ps_, xo)
        out = c + s
        return out.reshape(x_.shape) if packed_f is not None else out

    def forward(x_, p1_, p2_, ps_):
        w1 = fused_kernel(p1_).astype(x.dtype)   # (K, C, H)
        w2 = fused_kernel(p2_).astype(x.dtype)   # (1, H, C)
        wsk = fused_kernel(ps_).astype(x.dtype)  # (1, C, C)
        xp = x_.reshape(B, Tp, L)
        w1p = _pack_weights(w1, f, af, d, J)                # (J, L, Lb)
        w2p = _pack_weights(w2, f, 0, 1, 1)[0]              # (Lb, L)
        wsp = _pack_weights(wsk, f, 0, 1, 1)[0]             # (L, L)

        def brow(b, lanes):
            r = jnp.zeros((L,), jnp.float32)
            return r.at[:lanes].set(jnp.tile(b.astype(jnp.float32), f))

        bias = jnp.stack(
            [
                brow(p1_.get("bias", jnp.zeros((H,))), Lb),
                brow(p2_.get("bias", jnp.zeros((C,))), L),
                brow(ps_.get("bias", jnp.zeros((C,))), L),
            ]
            + [jnp.zeros((L,), jnp.float32)] * 5,
            axis=0,
        )  # (8, L)

        # packed global pad rows for conv1 (edge VALUES recovered from the
        # packed view itself — works for f == 1 too)
        from funcodec_tpu.ops.packed import packed_edge_values

        ledge_o, redge_o = packed_edge_values(
            xp, f, C, T, left_o, right_o, spec1.pad_mode
        )
        if Hl > 0:
            zl = jnp.zeros((B, af, C), x_.dtype)
            lp = jnp.concatenate([zl, ledge_o[:, :left_o]], axis=1)
            lp = lp.reshape(B, Hl, L)
        else:
            lp = xp[:, :1]
        if Hr > 0:
            zr = jnp.zeros((B, Hr * f - right_o, C), x_.dtype)
            rp = (
                jnp.concatenate([redge_o[:, :right_o], zr], axis=1)
                if right_o > 0
                else zr
            )
            rp = rp.reshape(B, Hr, L)
        else:
            rp = xp[:, :1]
        hal = _build_halo(xp, lp, rp, tile_s, Hl, Hr)

        zaff = jnp.zeros((B, 8, L), jnp.float32)
        run = functools.partial(
            _rb_pass,
            xp, hal, w1p, w2p, wsp, bias,
            J=J, Hl=Hl, Hr=Hr, tile=tile_s, Lb=Lb, interpret=interpret,
        )

        pA = run(zaff, mode=0)  # (B, n_t, 8, 128)
        sums = jnp.sum(pA[..., 0], axis=1)  # (B, 8)
        A1, D1 = _finalize_affine(
            sums[:, 0], sums[:, 1], T * H, p1_["norm_scale"], p1_["norm_bias"], f
        )
        A3, D3 = _finalize_affine(
            sums[:, 2], sums[:, 3], T * C, ps_["norm_scale"], ps_["norm_bias"], f
        )
        aff = zaff.at[:, 0, :Lb].set(A1).at[:, 1, :Lb].set(D1)
        aff = aff.at[:, 4, :].set(A3).at[:, 5, :].set(D3)

        pB = run(aff, mode=1)
        sumsB = jnp.sum(pB[..., 0], axis=1)
        A2, D2 = _finalize_affine(
            sumsB[:, 0], sumsB[:, 1], T * C, p2_["norm_scale"], p2_["norm_bias"], f
        )
        aff = aff.at[:, 2, :].set(A2).at[:, 3, :].set(D2)

        out = run(aff, mode=2)  # (B, Tp, L)
        return out if packed_f is not None else out.reshape(B, T, C)

    @jax.custom_vjp
    def fused_fn(x_, p1_, p2_, ps_):
        return forward(x_, p1_, p2_, ps_)

    def fused_fwd(x_, p1_, p2_, ps_):
        return fused_fn(x_, p1_, p2_, ps_), (x_, p1_, p2_, ps_)

    def fused_bwd(res, g):
        # backward replays the exact XLA composition: gradients flow to x AND
        # all conv/norm params, so the fused path is safe under training
        _, vjp = jax.vjp(xla_ref, *res)
        return vjp(g)

    fused_fn.defvjp(fused_fwd, fused_bwd)
    return fused_fn(x, p1, p2, ps)
