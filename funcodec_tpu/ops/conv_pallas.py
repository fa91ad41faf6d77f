"""Fused stride-1 conv1d Pallas kernel with in-kernel padding edges.

Motivation (measured, ops/conv.py): XLA materializes a padded copy of the
activation per streamable conv (reflect/replicate padding cannot fold into
the conv op), worth ~18% of EnCodec end-to-end inference time. This kernel
streams x straight from HBM in tiles, splices the pad values in VMEM (tiny
edge buffers computed in XLA), optionally fuses the preceding elementwise
activation, and runs the conv as one unfold-matmul per tile on the MXU —
one HBM read and one HBM write per layer.

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
        y = jax.nn.elu(xf)
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
    ub8 = (T - Wd) // 8 * 8  # top clamp, kept 8-aligned
    start_c = jnp.clip(u0 - a, 0, ub8)
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
    static_argnames=("K", "dil", "left", "right", "pad_mode", "act", "tile", "interpret"),
)
def _fused_conv1d_s1_impl(x, kernel, bias, K, dil, left, right, pad_mode, act, tile, interpret):
    B, T, C = x.shape
    O = kernel.shape[-1]
    n_t = -(-T // tile)
    span = (K - 1) * dil + 1
    a = (-left) % 8
    W = tile + -(-(span - 1 + a) // 8) * 8  # scratch rows (8-aligned DMA width)

    ledge, redge = _edge_buffers(x, left, right, pad_mode)
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


def fused_conv1d_s1(
    x: jnp.ndarray,       # (B, T, C)
    kernel: jnp.ndarray,  # (K, C, O)
    bias: jnp.ndarray,    # (O,)
    left: int,
    right: int,
    dilation: int = 1,
    pad_mode: str = "reflect",
    act: Optional[str] = None,
    tile: int = 1024,
    interpret: Optional[bool] = None,
) -> Optional[jnp.ndarray]:
    """Fused [act ->] pad -> conv (stride 1). Returns (B, T, O), or None when
    the shape doesn't qualify (caller must fall back to the XLA path)."""
    B, T, C = x.shape
    K = kernel.shape[0]
    if K < 2 or left + right != (K - 1) * dilation:
        return None
    if C < 8:
        # degenerate MXU contraction + Mosaic narrow-vector layout limits;
        # only the first encoder conv (C=1) lands here — XLA handles it well
        return None
    if pad_mode not in ("reflect", "replicate", "constant", "zero"):
        return None
    tile_sel = pick_tile(T, K, dilation, right, tile)
    if tile_sel is None:
        return None
    if interpret is None:
        interpret = INTERPRET
    return _fused_conv1d_s1_impl(
        x, kernel, bias, K, dilation, left, right, pad_mode, act, tile_sel, interpret
    )
