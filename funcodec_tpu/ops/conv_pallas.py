"""Fused stride-1 conv1d Pallas kernel with in-kernel padding edges.

Motivation: XLA materializes a padded copy of the activation per streamable
conv (reflect/replicate padding cannot fold into the conv op) — a fold-
padding probe suggested ~18% of EnCodec end-to-end inference recoverable.
This kernel streams x straight from HBM in tiles, splices the pad values in
VMEM (tiny edge buffers computed in XLA), optionally fuses the preceding
elementwise activation, and runs the conv as one multi-tap matmul per tile
on the MXU — one HBM read and one HBM write per layer.

STATUS (measured on v5e, EnCodec nq32ds320 B=32x10s bf16, full inference,
best-of-7, scripts/bench_pallas_conv.py): the XLA path WINS end to end —
XLA 141ms vs Pallas 150ms (C%128==0 layers only), 187ms (all layers via the
channel-packed lowering + act-fusion peephole, ~1MB tiles). XLA's conv
pipeline overlaps HBM traffic with compute (this kernel's per-tile DMA is
serial: start+wait, no double-buffering) and fuses the surrounding
elementwise chain anyway, while the packed lowering pays a ~f*J/K nominal
FLOP multiplier. Kept default-OFF (ops/conv.PALLAS_STRIDE1) as a correct,
parity-tested base for a future double-buffered / whole-resblock-fusing
variant; numerics differ from XLA only by bf16 accumulation order.

Scope: stride=1, groups=1, any dilation, output length == input length
(padding_total = (K-1)*dilation — the streamable case; every SEANet
residual-block and head conv qualifies). Strided/transposed convs keep the
XLA path (they run at reduced T and are a small share of the bandwidth).

Behavioral reference for the padding semantics:
funcodec/modules/normed_modules/conv.py:30-72 (pad1d + extra asymmetric
split); parity is tested against ops/conv.apply_sconv1d.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _apply_act(x, act):
    if act is None:
        return x
    xf = x.astype(jnp.float32)
    if act == "elu":
        # expm1 has no Mosaic lowering; exp-1 is equivalent in f32 here
        y = jnp.where(xf > 0, xf, jnp.exp(jnp.minimum(xf, 0.0)) - 1.0)
    elif act == "relu":
        y = jax.nn.relu(xf)
    elif act == "gelu":
        y = jax.nn.gelu(xf)
    else:
        raise ValueError(f"unsupported fused act: {act}")
    return y.astype(x.dtype)


def _kernel(
    x_hbm,      # (B, T, C) ANY/HBM
    ledge_ref,  # (B, max(left,1), C) VMEM
    redge_ref,  # (B, >= m+right, C) VMEM tail buffer: x[T-m:T] ++ right pad
    w_ref,      # (K, C, O) VMEM
    b_ref,      # (1, O) VMEM
    o_ref,      # (1, TILE, O) VMEM block
    scratch,    # (W, C) VMEM
    sem,
    *,
    K, dil, left, right, T, TILE, act,
):
    b = pl.program_id(0)
    t = pl.program_id(1)
    n_t = pl.num_programs(1)
    span = (K - 1) * dil + 1
    W = TILE + span - 1  # rows the conv actually reads
    # Mosaic requires HBM slice starts AND lengths 8-aligned. The window
    # start u0 = t*TILE - left is congruent to -left mod 8 for every tile
    # (TILE % 8 == 0), so fetching from u0 - a with a = (-left) % 8 is
    # always aligned, and the window sits at static scratch offset `a`.
    a = (-left) % 8
    Wd = scratch.shape[0]  # = TILE + ceil((span - 1 + a) / 8) * 8

    u0 = t * TILE - left
    # start in units of 8 rows so Mosaic can PROVE the slice start is
    # tiling-aligned: left + a is a multiple of 8 by construction of a.
    s8 = jnp.clip(t * (TILE // 8) - (left + a) // 8, 0, (T - Wd) // 8)
    start_c = s8 * 8
    dma = pltpu.make_async_copy(x_hbm.at[b, pl.ds(start_c, Wd), :], scratch, sem)
    dma.start()
    dma.wait()

    if left > 0:
        @pl.when(t == 0)
        def _():
            # scratch holds x[0:Wd]; window row w (at scratch[a+w]) wants
            # x[w-left] -> roll right by a+left, splice pad rows at [a, a+left).
            data = scratch[:]
            r = a + left
            data = jnp.concatenate([data[Wd - r :, :], data[: Wd - r, :]], axis=0)
            data = jnp.concatenate(
                [data[:a, :], ledge_ref[b, 0:left, :], data[a + left :, :]], axis=0
            )
            scratch[:] = data

    t_right = n_t - 1  # host wrapper guarantees only the last tile clamps
    # The last tile's DMA start clamps to ub8; its data sits `shift` rows too
    # early relative to the window. The aligned fetch also misses the last
    # m = (T - Wd) % 8 real rows — the tail buffer carries x[T-m:T] plus the
    # right padding, spliced as one block. All offsets are static.
    m = (T - Wd) % 8
    tail_len = m + right
    shift = (t_right * TILE - left - a) - ((T - Wd) // 8 * 8)
    pos = T - m - (t_right * TILE - left)  # window row where the tail begins
    if shift > 0 or tail_len > 0:
        @pl.when(t == t_right)
        def _():
            data = scratch[:]
            if shift > 0:
                data = jnp.concatenate([data[shift:, :], data[:shift, :]], axis=0)
            if tail_len > 0:
                p = a + pos
                data = jnp.concatenate(
                    [data[:p, :], redge_ref[b, 0:tail_len, :], data[p + tail_len :, :]],
                    axis=0,
                )
            scratch[:] = data

    # Per-tap matmul accumulation (rather than an unfold+concat into one
    # (TILE, K*C) operand): Mosaic cannot lane-concat slices with distinct
    # sublane offsets for narrow C, and K accumulated MXU calls carry the
    # same total contraction depth.
    xin = _apply_act(scratch[:], act)
    y = b_ref[0, :][None, :].astype(jnp.float32)
    for k in range(K):
        y = y + jnp.dot(
            xin[a + k * dil : a + k * dil + TILE, :],
            w_ref[k],
            preferred_element_type=jnp.float32,
        )
    o_ref[0] = y.astype(o_ref.dtype)


def _edge_buffers(x, left, right, pad_mode):
    """Tiny pad-value buffers, XLA-side (semantics of ops/pad.pad1d_time on
    a signal with T >> pad; the wrapper rejects shorter signals)."""
    B, T, C = x.shape
    if pad_mode == "reflect":
        l = jnp.flip(x[:, 1 : left + 1, :], axis=1) if left > 0 else x[:, :1]
        r = jnp.flip(x[:, T - right - 1 : T - 1, :], axis=1) if right > 0 else x[:, :1]
    elif pad_mode == "replicate":
        l = jnp.repeat(x[:, :1, :], max(left, 1), axis=1)
        r = jnp.repeat(x[:, -1:, :], max(right, 1), axis=1)
    elif pad_mode in ("constant", "zero"):
        l = jnp.zeros((B, max(left, 1), C), x.dtype)
        r = jnp.zeros((B, max(right, 1), C), x.dtype)
    else:
        raise ValueError(f"unsupported pad mode: {pad_mode}")
    return l, r


# Global interpret-mode switch so CPU tests can exercise the wired-in path
# (ops/conv.PALLAS_STRIDE1) without threading a flag through every caller.
INTERPRET = False

# Minimum channel count for the Pallas path (see fused_conv1d_s1 gate).
MIN_C = 8


def pick_tile(T: int, K: int, dil: int, right: int, want: int) -> Optional[int]:
    """Choose a tile size such that
      - Wd = round8(tile + span - 1) <= T  (clamped DMA start stays >= 0)
      - only the LAST tile's DMA window crosses T:
        (T-1) % tile + 1 >= right + (Wd - W)
      - tile >= left (only tile 0 needs left-pad values)
      - tile % 8 == 0 (sublane alignment), tile >= 8
    Returns None if no valid tile exists (caller falls back to XLA)."""
    span = (K - 1) * dil + 1
    left = span - 1 - right
    a = (-left) % 8
    E = -(-(span - 1 + a) // 8) * 8  # Wd - tile (DMA overhang)
    tile = min(want, (T - E) // 8 * 8)
    while tile >= max(8, left):
        # only the last tile's aligned DMA window may cross T:
        # worst non-last tile needs (n_t-1)*tile - left - a + Wd <= T,
        # i.e. remainder r = T - (n_t-1)*tile >= E - left - a.
        if T - (-(-T // tile) - 1) * tile >= E - left - a and -(-T // tile) >= 2:
            return tile
        tile -= 8
    return None


@functools.partial(
    jax.jit,
    static_argnames=("K", "dil", "left", "right", "act", "tile", "interpret"),
)
def _fused_conv1d_s1_impl(
    x, kernel, bias, ledge, redge, K, dil, left, right, act, tile, interpret
):
    """Core pallas_call. ledge (B, >=max(left,1), C): pad values before x[0];
    redge (B, >=max(right,1), C): pad values after x[T-1] — both precomputed
    (for the channel-packed path they are built in original time space)."""
    B, T, C = x.shape
    O = kernel.shape[-1]
    n_t = -(-T // tile)
    span = (K - 1) * dil + 1
    a = (-left) % 8
    W = tile + -(-(span - 1 + a) // 8) * 8  # scratch rows (8-aligned DMA width)

    # (no activation on the edges here: the kernel applies `act` to the whole
    # spliced window, and reflect/replicate pads commute with pointwise acts)
    # Tail buffer: the m rows the aligned DMA misses, then the right padding.
    m = (T - W) % 8
    pieces = []
    if m > 0:
        pieces.append(x[:, T - m : T])
    if right > 0:
        pieces.append(redge[:, :right])
    tailbuf = jnp.concatenate(pieces, axis=1) if pieces else redge[:, :1]
    w2 = kernel.astype(x.dtype)  # (K, C, O)
    b2 = bias.reshape(1, O).astype(jnp.float32)

    out = pl.pallas_call(
        functools.partial(
            _kernel, K=K, dil=dil, left=left, right=right, T=T, TILE=tile, act=act
        ),
        grid=(B, n_t),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, tile, O), lambda b, t: (b, t, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((B, n_t * tile, O), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((W, C), x.dtype),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(x, ledge, tailbuf, w2, b2)
    return out[:, :T]


def _pack_weights(kernel, f, af, dil, J):
    """Block-Toeplitz packed weights: Wp[j][r*C+c, ri*O+o] = w[k,c,o] with
    j = (af + ri + k*dil) // f, r = (af + ri + k*dil) % f."""
    K, C, O = kernel.shape
    Wp = jnp.zeros((J, f * C, f * O), kernel.dtype)
    for k in range(K):
        for ri in range(f):
            idx = af + ri + k * dil
            j, r = idx // f, idx % f
            Wp = Wp.at[j, r * C : (r + 1) * C, ri * O : (ri + 1) * O].set(kernel[k])
    return Wp


def pack_weights_strided(kernel, f_in, f_out, stride, af, dil, J):
    """Generalized block-Toeplitz packing for a strided conv between packed
    views with different packing factors.

    Input view rows hold f_in timesteps x C_in channels; output rows hold
    f_out x C_out. With e the input left-extended by (left + af) pad samples,
      y[t_out] = sum_k x[stride*t_out + k*dil - left] @ W[k]
               = sum_k e[stride*t_out + k*dil + af] @ W[k]
    and t_out = u'*f_out + r_o, the packed conv is
      yp[u'] = sum_j ep[u' * s_p + j] @ Wp[j],  s_p = stride*f_out/f_in
    with Wp[j][r_i*C_in + c, r_o*C_out + o] = W[k, c, o] where
      idx = stride*r_o + k*dil + af,  j = idx // f_in,  r_i = idx % f_in.
    `_pack_weights` is the (stride=1, f_out=f_in) special case."""
    K, C, O = kernel.shape
    Wp = jnp.zeros((J, f_in * C, f_out * O), kernel.dtype)
    for k in range(K):
        for ro in range(f_out):
            idx = stride * ro + k * dil + af
            j, ri = idx // f_in, idx % f_in
            Wp = Wp.at[j, ri * C : (ri + 1) * C, ro * O : (ro + 1) * O].set(kernel[k])
    return Wp


def _plan(x, kernel, left, right, dilation, pad_mode, tile):
    """Resolve the lowering plan: ('direct', tile) for C % 128 == 0, or
    ('packed', tile_s, f, af, J, left_p, right_p) for C dividing 128.
    Returns None when the shape doesn't qualify."""
    B, T, C = x.shape
    K = kernel.shape[0]
    span = (K - 1) * dilation + 1
    # Aim for ~1MB bf16 scratch windows when the caller doesn't pin a tile:
    # per-tile DMA issue latency is ~µs, so small tiles (thousands of grid
    # steps) drown in it.
    want = tile if tile is not None else max(512, (1 << 19) // C // 8 * 8)
    if C % 128 == 0:
        tile_sel = pick_tile(T, K, dilation, right, want)
        if tile_sel is None:
            return None
        return ("direct", tile_sel)
    if 128 % C == 0 and C >= MIN_C:
        f = 128 // C
        if T % f != 0:
            return None
        af = (-left) % f
        J = (af + span - 2 + f) // f + 1  # packed tap count
        left_p = (left + af) // f
        right_p = (J - 1) - left_p
        tile_s = pick_tile(T // f, J, 1, right_p, max(want // f, 8))
        if tile_s is None:
            return None
        return ("packed", tile_s, f, af, J, left_p, right_p)
    return None


def fused_conv1d_s1(
    x: jnp.ndarray,       # (B, T, C)
    kernel: jnp.ndarray,  # (K, C, O)
    bias: jnp.ndarray,    # (O,)
    left: int,
    right: int,
    dilation: int = 1,
    pad_mode: str = "reflect",
    act: Optional[str] = None,
    tile: Optional[int] = None,  # None = auto (~1MB scratch)
    interpret: Optional[bool] = None,
) -> Optional[jnp.ndarray]:
    """Fused [act ->] pad -> conv (stride 1). Returns (B, T, O), or None when
    the shape doesn't qualify (caller must fall back to the XLA path).

    Two lowerings, both one HBM read + one HBM write per layer:
    - direct (C % 128 == 0): taps are (TILE, C) @ (C, O) MXU calls.
    - channel-packed (C divides 128): x reshaped (free bitcast) to
      (B, T/f, f*C) with f = 128/C; the conv becomes a stride-1 J-tap conv
      with block-Toeplitz (f*C, f*O) weights — full 128-lane contractions,
      which also satisfies Mosaic's 128-aligned HBM slice rule. Nominal
      FLOPs grow ~f*J/K, but these narrow stages are bandwidth-bound and
      the MXU lanes were idle at C < 128 anyway.
    """
    B, T, C = x.shape
    K = kernel.shape[0]
    O = kernel.shape[-1]
    if K < 2 or left + right != (K - 1) * dilation:
        return None
    if C < MIN_C:
        return None
    if pad_mode not in ("reflect", "replicate", "constant", "zero"):
        return None
    plan = _plan(x, kernel, left, right, dilation, pad_mode, tile)
    if plan is None:
        return None
    if interpret is None:
        interpret = INTERPRET

    def _forward(x_, w_, b_, act_):
        ledge, redge = _edge_buffers(x_, left, right, pad_mode)
        if plan[0] == "direct":
            return _fused_conv1d_s1_impl(
                x_, w_, b_, ledge, redge,
                K, dilation, left, right, act_, plan[1], interpret,
            )
        _, tile_s, f, af, J, left_p, right_p = plan
        Ts = T // f
        xp = x_.reshape(B, Ts, f * C)
        wp = _pack_weights(w_, f, af, dilation, J)
        bp = jnp.tile(b_, f)
        if left > 0:
            zl = jnp.zeros((B, af, C), x_.dtype)
            lp = jnp.concatenate([zl, ledge[:, :left]], axis=1)
            lp = lp.reshape(B, left_p, f * C)
        else:
            lp = xp[:, :1]
        if right_p > 0:
            zr = jnp.zeros((B, right_p * f - right, C), x_.dtype)
            rp = (
                jnp.concatenate([redge[:, :right], zr], axis=1)
                if right > 0
                else zr
            )
            rp = rp.reshape(B, right_p, f * C)
        else:
            rp = xp[:, :1]
        yp = _fused_conv1d_s1_impl(
            xp, wp, bp, lp, rp,
            J, 1, left_p, right_p, act_, tile_s, interpret,
        )
        return yp.reshape(B, Ts * f, O)[:, :T]

    # Differentiable wrapper: Pallas forward, exact XLA transposes backward.
    # With u = act(x), f = conv(pad(u), w) + b is linear in u and in w, so
    # jax.linear_transpose builds the conv/pad cotangents without replaying
    # the primal; the act cotangent chains through jax.vjp of the (cheap,
    # elementwise) activation.
    def _xla_linear(u_, w_):
        from funcodec_tpu.ops.pad import pad1d_time
        from jax import lax

        up = pad1d_time(u_, (left, right), mode=pad_mode)
        return lax.conv_general_dilated(
            up, w_, window_strides=(1,), padding=[(0, 0)],
            rhs_dilation=(dilation,), dimension_numbers=("NWC", "WIO", "NWC"),
        )

    @jax.custom_vjp
    def f(x_, w_, b_):
        return _forward(x_, w_, b_, act)

    def f_fwd(x_, w_, b_):
        return f(x_, w_, b_), (x_, w_)

    def f_bwd(res, g):
        x_, w_ = res
        g = g.astype(jnp.float32)
        x32, w32 = x_.astype(jnp.float32), w_.astype(jnp.float32)
        u, act_vjp = jax.vjp(lambda v: _apply_act(v, act), x32)
        (du,) = jax.linear_transpose(lambda v: _xla_linear(v, w32), u)(g)
        (dx,) = act_vjp(du)
        (dw,) = jax.linear_transpose(lambda v: _xla_linear(u, v), w32)(g)
        db = jnp.sum(g, axis=(0, 1))
        return dx.astype(x_.dtype), dw.astype(w_.dtype), db.astype(g.dtype)

    f.defvjp(f_fwd, f_bwd)
    return f(x, kernel, bias)
