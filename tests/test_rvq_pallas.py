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


def test_pallas_rvq_flag_wiring(monkeypatch):
    """rvq.PALLAS_RVQ routes rvq_inference through the fused kernel with the
    same outputs (fp32 inputs -> tie-free agreement at small scale)."""
    import funcodec_tpu.quant.rvq as rvq_mod
    import funcodec_tpu.quant.rvq_pallas as rp
    from funcodec_tpu.quant.rvq import RVQConfig, RVQState, rvq_inference

    n_q, bins, D = 4, 32, 128
    key = jax.random.PRNGKey(0)
    embed = jax.random.normal(key, (n_q, bins, D))
    state = RVQState(
        inited=jnp.ones((n_q,)), cluster_size=jnp.ones((n_q, bins)),
        embed=embed, embed_avg=embed,
    )
    cfg = RVQConfig(dim=D, codebook_size=bins, num_quantizers=n_q, kmeans_init=False)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 40, D))

    q0, i0, s0 = rvq_inference(cfg, state, x)
    monkeypatch.setattr(rvq_mod, "PALLAS_RVQ", True)
    monkeypatch.setattr(rp, "INTERPRET", True)
    q1, i1, s1 = rvq_inference(cfg, state, x)
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(i0))
    np.testing.assert_allclose(np.asarray(q1), np.asarray(q0), atol=2e-2, rtol=2e-2)
    np.testing.assert_allclose(np.asarray(s1), np.asarray(s0), atol=2e-2, rtol=2e-2)
