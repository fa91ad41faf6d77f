"""Fused RVQ encode as a Pallas TPU kernel.

One kernel computes the full greedy residual quantization: for each token
tile, all `n_q` codebook searches (distance matmul on the MXU, first-max
argmax, one-hot dequantization, residual update) run back-to-back with the
residual held in VMEM — the XLA `lax.scan` version round-trips the (N, D)
residual carry through HBM between quantizers.

The codebooks live in VMEM in bfloat16 (32x1024x128 = 8 MB); distances
accumulate in fp32. This matches the production bf16 inference path; the
fp32 `rvq.rvq_encode` scan remains the bit-exact reference path.

v5e measurements (128k tokens, nq=32, incl. ~26ms tunnel dispatch overhead):
scan 50.7ms, pallas tile=512 46.8ms (net ~25 vs ~21ms — the op is
MXU-FLOP-bound at ~100 TF/s, so fusion buys modestly); tile=1024 exceeds the
16 MB VMEM budget with the resident codebooks.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _rvq_encode_kernel(x_ref, embed_ref, embed_sq_ref, idx_ref, quant_ref, *, n_q):
    """x: (TILE, D), embed: (n_q, bins, D) bf16, embed_sq: (n_q, bins) f32.

    Outputs: idx (n_q, TILE) int32, quant (TILE, D) f32 (sum of codewords).
    """
    residual = x_ref[:].astype(jnp.float32)  # (TILE, D) fp32 accumulator
    quant_acc = jnp.zeros_like(residual)
    tile, d = residual.shape
    bins = embed_ref.shape[1]

    for q in range(n_q):
        e = embed_ref[q]  # (bins, D) bf16 — matmuls run bf16 on the MXU with
        # fp32 accumulation; codeword reconstruction is exact in bf16 values
        scores = 2.0 * jnp.dot(
            residual.astype(jnp.bfloat16), e.T, preferred_element_type=jnp.float32
        ) - embed_sq_ref[q][None, :]
        idx = jnp.argmax(scores, axis=-1).astype(jnp.int32)  # (TILE,)
        onehot = (
            jax.lax.broadcasted_iota(jnp.int32, (tile, bins), 1) == idx[:, None]
        ).astype(jnp.bfloat16)
        codeword = jnp.dot(onehot, e, preferred_element_type=jnp.float32)
        residual = residual - codeword
        quant_acc = quant_acc + codeword
        idx_ref[q, :] = idx

    quant_ref[:] = quant_acc


# CPU-test switch: when rvq.PALLAS_RVQ routes through this kernel on the
# CPU backend, tests set INTERPRET = True.
INTERPRET = False


@functools.partial(jax.jit, static_argnames=("n_q", "tile", "interpret"))
def _rvq_encode_pallas_jit(x, embed, n_q, tile, interpret):
    B, T, D = x.shape
    N = B * T
    flat = x.reshape(N, D)
    pad = (-N) % tile
    if pad:
        flat = jnp.pad(flat, [(0, pad), (0, 0)])
    Np = flat.shape[0]

    embed_bf = embed[:n_q].astype(jnp.bfloat16)
    embed_sq = jnp.sum(embed[:n_q].astype(jnp.float32) ** 2, axis=-1)  # (n_q, bins)

    bins = embed.shape[1]
    grid = (Np // tile,)
    idx_out, quant_out = pl.pallas_call(
        functools.partial(_rvq_encode_kernel, n_q=n_q),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile, D), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((n_q, bins, D), lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((n_q, bins), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((n_q, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, D), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n_q, Np), jnp.int32),
            jax.ShapeDtypeStruct((Np, D), jnp.float32),
        ],
        interpret=interpret,
    )(flat.astype(jnp.bfloat16), embed_bf, embed_sq)

    indices = idx_out[:, :N].reshape(n_q, B, T)
    quantized = quant_out[:N].reshape(B, T, D)
    return indices, quantized


def rvq_encode_pallas(x, embed, n_q, tile=512, interpret=None):
    """Fused greedy RVQ encode. Returns (indices (n_q,B,T), quantized (B,T,D))."""
    if interpret is None:
        interpret = INTERPRET
    return _rvq_encode_pallas_jit(x, embed, n_q, tile, interpret)
