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

DESIGN: the convs at the bandwidth-dominant stages are so cheap relative to
the traffic that RECOMPUTING them is free. The whole residual block runs as
three streaming passes over x, with no intermediate tensor ever written to
HBM:

  pass A: read x -> b = conv1(ELU(x)), s = shortcut(x)
          emit per-tile partial (sum, sumsq) of b and s   [stats only]
  pass B: read x -> recompute b -> c = conv2(ELU(tgn1(b)))
          emit partial (sum, sumsq) of c                  [stats only]
  pass C: read x -> recompute b, c, s -> out = tgn2(c) + tgn3(s)  [write out]

HBM traffic: 3 reads of x + 1 write of out (~4 tensor passes) vs ~15 for the
unfused XLA chain. Between passes, the tiny partials are finalized in XLA
into per-(sample, channel) affine rows A = rs*gamma, D = beta - mu*rs*gamma,
so in-kernel normalization is a single fused multiply-add.

Narrow-channel stages (C in {8,...,64}) use the channel-packed lowering from
ops/conv_pallas.py: x viewed as (B, T/f, f*C=128), convs become stride-1
J-tap block-Toeplitz matmuls — full 128-lane MXU contractions. The window
DMA is double-buffered across the (B, n_t) grid (sequential on TPU) so HBM
transfer overlaps compute.

Scope: 1D, stride-1, groups=1 convs, norm == time_group_norm on all three
convs (every shipped EnCodec/LibriTTS config); any dilation/causality/pad
mode supported by conv_pallas's packing math. Other shapes return None and
the caller keeps the XLA path.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from funcodec_tpu.ops.conv_pallas import _edge_buffers, _pack_weights, pick_tile
from funcodec_tpu.ops.pad import conv_padding_total, split_padding

# Global interpret-mode switch for CPU tests (mirrors conv_pallas.INTERPRET).
INTERPRET = False


def _elu(x):
    xf = x.astype(jnp.float32)
    return jnp.where(xf > 0, xf, jnp.exp(jnp.minimum(xf, 0.0)) - 1.0)


def _rb_kernel(
    x_hbm,     # (B, Tp, L) ANY/HBM — packed input
    ledge,     # (B, max(left,1), L) VMEM — left pad rows (packed)
    tailbuf,   # (B, >= m+right, L) VMEM — x[Tp-m:Tp] ++ right pad rows
    w1,        # (J, L, Lb) VMEM — packed conv1 taps
    w2,        # (Lb, L) VMEM — packed conv2 (k=1, block-diagonal)
    ws,        # (L, L) VMEM — packed shortcut (k=1, block-diagonal)
    bias,      # (8, L) f32 VMEM — row 0: b1 (lanes :Lb), 1: b2, 2: bs
    aff,       # (B, 8, L) f32 VMEM — rows (A1,D1,A2,D2,A3,D3), A/D per sample
    o_ref,     # mode 0/1: (1,1,8,128) f32 partials; mode 2: (1,TILE,L) out
    scratch,   # (2, Wd, L) VMEM window slots
    sems,      # DMA semaphores (2,)
    *,
    mode, J, left, right, Tp, TILE, Lb, L, a, n_t, n_b,
):
    b_i = pl.program_id(0)
    t = pl.program_id(1)
    n = b_i * n_t + t
    Wd = scratch.shape[1]

    def dma(bb, tt, slot):
        # aligned fetch: window start u0 = tt*TILE - left is congruent to
        # -left mod 8 for every tile (TILE % 8 == 0), so fetching from
        # u0 - a with a = (-left) % 8 is always 8-aligned (conv_pallas._kernel)
        s8 = jnp.clip(tt * (TILE // 8) - (left + a) // 8, 0, (Tp - Wd) // 8)
        return pltpu.make_async_copy(
            x_hbm.at[bb, pl.ds(s8 * 8, Wd), :], scratch.at[slot], sems.at[slot]
        )

    # double buffering: warm-up fetch at step 0, prefetch next each step
    @pl.when(n == 0)
    def _():
        dma(b_i, t, 0).start()

    nxt_t = jnp.where(t + 1 < n_t, t + 1, 0)
    nxt_b = jnp.where(t + 1 < n_t, b_i, jnp.minimum(b_i + 1, n_b - 1))

    @pl.when(n + 1 < n_b * n_t)
    def _():
        dma(nxt_b, nxt_t, (n + 1) % 2).start()

    dma(b_i, t, n % 2).wait()
    data = scratch[n % 2]

    # --- edge splices (value-level; logic mirrors conv_pallas._kernel) ------
    if left > 0:
        def lsplice():
            r = a + left
            d2 = jnp.concatenate([data[Wd - r:, :], data[: Wd - r, :]], axis=0)
            return jnp.concatenate(
                [d2[:a, :], ledge[b_i, 0:left, :], d2[a + left:, :]], axis=0
            )
        data = jnp.where(t == 0, lsplice(), data)

    t_right = n_t - 1
    m = (Tp - Wd) % 8
    tail_len = m + right
    shift = (t_right * TILE - left - a) - ((Tp - Wd) // 8 * 8)
    if shift > 0 or tail_len > 0:
        def rsplice():
            d2 = data
            if shift > 0:
                d2 = jnp.concatenate([d2[shift:, :], d2[:shift, :]], axis=0)
            if tail_len > 0:
                pos = Tp - m - (t_right * TILE - left)
                p = a + pos
                d2 = jnp.concatenate(
                    [d2[:p, :], tailbuf[b_i, 0:tail_len, :], d2[p + tail_len:, :]],
                    axis=0,
                )
            return d2
        data = jnp.where(t == t_right, rsplice(), data)

    dt = data.dtype
    affb = aff[b_i]  # (8, L) f32

    # rows of this tile that are real output rows (last tile is ragged)
    valid = Tp - t * TILE
    rmask = lax.broadcasted_iota(jnp.int32, (TILE, 1), 0) < valid

    def msum(v):  # masked sum + sumsq of an f32 (TILE, lanes) value
        vm = jnp.where(rmask, v, 0.0)
        return jnp.sum(vm), jnp.sum(vm * vm)

    # --- conv1: b = ELU(x) (*) W1, J packed taps on the MXU -----------------
    u = _elu(data).astype(dt)
    b_acc = jnp.zeros((TILE, Lb), jnp.float32)
    for j in range(J):
        b_acc = b_acc + jnp.dot(
            u[a + j : a + j + TILE, :], w1[j], preferred_element_type=jnp.float32
        )
    b_acc = b_acc + bias[0:1, :Lb]
    b_r = b_acc.astype(dt)  # round like the XLA path (conv output dtype)

    def srow(*vals):  # (8,128) partials row block
        rows = [jnp.full((1, 128), v, jnp.float32) for v in vals]
        rows += [jnp.zeros((1, 128), jnp.float32)] * (8 - len(rows))
        return jnp.concatenate(rows, axis=0)

    if mode == 0:
        xt = data[a + left : a + left + TILE, :]
        s_r = (
            jnp.dot(xt, ws[...], preferred_element_type=jnp.float32) + bias[2:3, :]
        ).astype(dt)
        sb, sqb = msum(b_r.astype(jnp.float32))
        ss, sqs = msum(s_r.astype(jnp.float32))
        o_ref[0, 0] = srow(sb, sqb, ss, sqs)
        return

    # tgn1 as affine rows, then conv2
    bn = b_r.astype(jnp.float32) * affb[0:1, :Lb] + affb[1:2, :Lb]
    v = _elu(bn).astype(dt)
    c_r = (
        jnp.dot(v, w2[...], preferred_element_type=jnp.float32) + bias[1:2, :]
    ).astype(dt)

    if mode == 1:
        sc, sqc = msum(c_r.astype(jnp.float32))
        o_ref[0, 0] = srow(sc, sqc)
        return

    # mode 2: out = tgn2(c) + tgn3(s)
    xt = data[a + left : a + left + TILE, :]
    s_r = (
        jnp.dot(xt, ws[...], preferred_element_type=jnp.float32) + bias[2:3, :]
    ).astype(dt)
    cn = (c_r.astype(jnp.float32) * affb[2:3, :] + affb[3:4, :]).astype(dt)
    sn = (s_r.astype(jnp.float32) * affb[4:5, :] + affb[5:6, :]).astype(dt)
    o_ref[0] = cn + sn


@functools.partial(
    jax.jit,
    static_argnames=("mode", "J", "left", "right", "tile", "Lb", "interpret"),
)
def _rb_pass(xp, ledge, tailbuf, w1, w2, ws, bias, aff,
             mode, J, left, right, tile, Lb, interpret):
    B, Tp, L = xp.shape
    n_t = -(-Tp // tile)
    a = (-left) % 8
    Wd = tile + -(-(J - 1 + a) // 8) * 8

    # tail rows the aligned DMA misses (conv_pallas._fused_conv1d_s1_impl)
    m = (Tp - Wd) % 8
    pieces = []
    if m > 0:
        pieces.append(xp[:, Tp - m : Tp])
    if right > 0:
        pieces.append(tailbuf[:, :right])
    tb = jnp.concatenate(pieces, axis=1) if pieces else tailbuf[:, :1]

    if mode == 2:
        out_shape = jax.ShapeDtypeStruct((B, n_t * tile, L), xp.dtype)
        out_spec = pl.BlockSpec(
            (1, tile, L), lambda b, t: (b, t, 0), memory_space=pltpu.VMEM
        )
    else:
        out_shape = jax.ShapeDtypeStruct((B, n_t, 8, 128), jnp.float32)
        out_spec = pl.BlockSpec(
            (1, 1, 8, 128), lambda b, t: (b, t, 0, 0), memory_space=pltpu.VMEM
        )

    out = pl.pallas_call(
        functools.partial(
            _rb_kernel,
            mode=mode, J=J, left=left, right=right, Tp=Tp, TILE=tile,
            Lb=Lb, L=L, a=a, n_t=n_t, n_b=B,
        ),
        grid=(B, n_t),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=out_spec,
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((2, Wd, L), xp.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(xp, ledge, tb, w1, w2, ws, bias, aff)
    return out


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
    x: jnp.ndarray,   # (B, T, C)
    p1, p2, ps,       # conv param dicts {kernel, bias, norm_scale, norm_bias}
    spec1, spec2, spec_s,  # ConvSpec for conv1 (k,d), conv2 (1x1), shortcut (1x1)
    tile: Optional[int] = None,
    interpret: Optional[bool] = None,
) -> Optional[jnp.ndarray]:
    """Fused [ELU->conv(k,d)->tgn->ELU->conv(1)->tgn] + [1x1 shortcut->tgn] add.

    Returns (B, T, C), or None when the shapes/specs don't qualify (caller
    falls back to the XLA path). Differentiable: backward replays the exact
    XLA composition via jax.vjp (the fused path is a forward optimization).
    """
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
    left = (left_o + af) // f
    right = (J - 1) - left

    want = tile if tile is not None else max(512, (1 << 20) // (L * x.dtype.itemsize) // 8 * 8)
    tile_s = pick_tile(Tp, J, 1, right, want)
    if tile_s is None:
        return None
    if interpret is None:
        interpret = INTERPRET

    from funcodec_tpu.ops.conv import fused_kernel

    def xla_ref(x_, p1_, p2_, ps_):
        """Exact unfused composition — backward path and numerics oracle."""
        from funcodec_tpu.ops.conv import apply_sconv1d

        h = apply_sconv1d(spec1, p1_, _elu(x_).astype(x_.dtype))
        c = apply_sconv1d(spec2, p2_, _elu(h).astype(h.dtype))
        s = apply_sconv1d(spec_s, ps_, x_)
        return c + s

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

        # packed edge rows for conv1 (conv_pallas.fused_conv1d_s1 packed branch)
        ledge_o, redge_o = _edge_buffers(x_, left_o, right_o, spec1.pad_mode)
        if left_o > 0:
            zl = jnp.zeros((B, af, C), x_.dtype)
            lp = jnp.concatenate([zl, ledge_o[:, :left_o]], axis=1)
            lp = lp.reshape(B, max(left, 1), L) if left > 0 else xp[:, :1]
        else:
            lp = xp[:, :1]
        if right > 0:
            zr = jnp.zeros((B, right * f - right_o, C), x_.dtype)
            rp = (
                jnp.concatenate([redge_o[:, :right_o], zr], axis=1)
                if right_o > 0
                else zr
            )
            rp = rp.reshape(B, right, L)
        else:
            rp = xp[:, :1]

        zaff = jnp.zeros((B, 8, L), jnp.float32)
        run = functools.partial(
            _rb_pass,
            xp, lp, rp, w1p, w2p, wsp, bias,
            J=J, left=left, right=right, tile=tile_s, Lb=Lb,
            interpret=interpret,
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

        out = run(aff, mode=2)  # (B, n_t*tile, L)
        return out[:, :Tp].reshape(B, T, C)

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
