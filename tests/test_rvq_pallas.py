"""Fused Pallas RVQ encode kernel (interpret mode on the CPU backend)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from funcodec_tpu.quant.rvq import RVQConfig, init_rvq_state, rvq_decode, rvq_encode
from funcodec_tpu.quant.rvq_pallas import rvq_encode_pallas


def test_pallas_rvq_encode_interpret():
    cfg = RVQConfig(dim=128, codebook_size=256, num_quantizers=4, kmeans_init=False)
    state = init_rvq_state(cfg, jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 300, 128)) * 0.5

    idx, quant = rvq_encode_pallas(x, state.embed, n_q=4, tile=128, interpret=True)
    assert idx.shape == (4, 2, 300)
    assert quant.shape == (2, 300, 128)

    # tokens: near-total agreement with the fp32 scan (bf16 codebooks flip
    # only near-ties)
    idx_ref = np.asarray(rvq_encode(cfg, state, x))
    agree = (np.asarray(idx) == idx_ref).mean()
    assert agree > 0.98, agree

    # self-consistency: quantized == decode(indices) with bf16 codebooks
    state_bf = state.replace(embed=state.embed.astype(jnp.bfloat16).astype(jnp.float32))
    dec = np.asarray(rvq_decode(cfg, state_bf, idx))
    np.testing.assert_allclose(np.asarray(quant), dec, atol=1e-3, rtol=1e-2)


def test_pallas_rvq_partial_nq_and_padding():
    cfg = RVQConfig(dim=128, codebook_size=256, num_quantizers=8, kmeans_init=False)
    state = init_rvq_state(cfg, jax.random.PRNGKey(0))
    # N not a multiple of tile exercises the pad path
    x = jax.random.normal(jax.random.PRNGKey(2), (1, 137, 128))
    idx, quant = rvq_encode_pallas(x, state.embed, n_q=3, tile=128, interpret=True)
    assert idx.shape == (3, 1, 137)
    assert int(idx.min()) >= 0 and int(idx.max()) < 256
