"""Fast (vectorized-EMA) vs slow (per-layer scan) RVQ training paths.

rvq_train_forward dispatches to a 4-kernel search scan + batched EMA once
every codebook is initialized (quant/rvq.py Phase A/B/C). These tests pin
that the fast path is numerically identical to the kmeans-capable slow
scan — outputs, new state, AND gradients — including under quantizer
dropout and dead-code expiry.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import funcodec_tpu.quant.rvq as rvq_mod
from funcodec_tpu.quant.rvq import RVQConfig, RVQState, rvq_train_forward


def _setup(expiry_mode="effective", q0_ds_ratio=1, rand_num_quant=None):
    n_q, bins, D = 8, 64, 16
    cfg = RVQConfig(
        num_quantizers=n_q, codebook_size=bins, dim=D, kmeans_init=True,
        kmeans_iters=5, decay=0.9, expiry_mode=expiry_mode,
        threshold_ema_dead_code=2.0, q0_ds_ratio=q0_ds_ratio,
        quantize_dropout=rand_num_quant is not None,
        rand_num_quant=rand_num_quant,
    )
    rng = np.random.RandomState(0)
    st = RVQState(
        inited=jnp.ones((n_q,), jnp.float32),
        cluster_size=jnp.asarray(
            np.abs(rng.randn(n_q, bins)) * 5 + 1, jnp.float32
        ),
        embed=jnp.asarray(rng.randn(n_q, bins, D), jnp.float32),
        embed_avg=jnp.asarray(rng.randn(n_q, bins, D), jnp.float32),
    )
    x = jnp.asarray(rng.randn(3, 20, D), jnp.float32)
    return cfg, st, x


def _run(cfg, st, x, slow):
    old = rvq_mod.FORCE_SLOW_SCAN
    rvq_mod.FORCE_SLOW_SCAN = slow
    try:
        def f(x, st):
            q, idx, commits, subq, ns = rvq_train_forward(
                cfg, st, x, jax.random.PRNGKey(3)
            )
            return q, idx, commits, subq, ns

        out = jax.jit(f)(x, st)

        def loss(x):
            q, idx, commits, subq, ns = rvq_train_forward(
                cfg, st, x, jax.random.PRNGKey(3)
            )
            return jnp.sum(q * q) + jnp.sum(commits)

        g = jax.grad(loss)(x)
    finally:
        rvq_mod.FORCE_SLOW_SCAN = old
    return out, g


@pytest.mark.parametrize(
    "expiry_mode,q0,rand",
    [
        ("effective", 1, None),
        ("reference", 1, None),
        ("effective", 2, None),
        ("effective", 1, (2, 4, 8)),
    ],
)
def test_fast_matches_slow(expiry_mode, q0, rand):
    cfg, st, x = _setup(expiry_mode, q0, rand)
    (qf, idxf, cf, sqf, nsf), gf = _run(cfg, st, x, slow=False)
    (qs, idxs, cs, sqs, nss), gs = _run(cfg, st, x, slow=True)
    np.testing.assert_allclose(np.asarray(qf), np.asarray(qs), atol=1e-5)
    np.testing.assert_array_equal(np.asarray(idxf), np.asarray(idxs))
    np.testing.assert_allclose(np.asarray(cf), np.asarray(cs), atol=1e-5)
    np.testing.assert_allclose(np.asarray(sqf), np.asarray(sqs), atol=1e-5)
    for a, b in zip(
        jax.tree_util.tree_leaves(nsf), jax.tree_util.tree_leaves(nss)
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)
    np.testing.assert_allclose(np.asarray(gf), np.asarray(gs), atol=1e-5)


def test_nq1_with_q0_downsample():
    """n_q=1 + q0_ds_ratio>1 leaves zero scan layers: the q0-only early
    return must produce a (1, B, T) index tensor and finite outputs (the
    reachable case is train_forward with a bandwidth mapping to n_q=1)."""
    rng = np.random.RandomState(0)
    n_q, bins, D = 4, 32, 8
    cfg = RVQConfig(
        num_quantizers=n_q, codebook_size=bins, dim=D, kmeans_init=True,
        kmeans_iters=3, decay=0.9, q0_ds_ratio=2,
    )
    st = RVQState(
        inited=jnp.ones((n_q,), jnp.float32),
        cluster_size=jnp.ones((n_q, bins), jnp.float32),
        embed=jnp.asarray(rng.randn(n_q, bins, D), jnp.float32),
        embed_avg=jnp.asarray(rng.randn(n_q, bins, D), jnp.float32),
    )
    x = jnp.asarray(rng.randn(2, 12, D), jnp.float32)
    q, idx, commits, subq, ns = rvq_train_forward(
        cfg, st, x, jax.random.PRNGKey(0), n_q=1
    )
    assert idx.shape == (1, 2, 12)
    assert commits.shape == (1,)
    assert np.isfinite(np.asarray(q)).all()
    # gradient flows via q0's STE
    g = jax.grad(
        lambda x: jnp.sum(
            rvq_train_forward(cfg, st, x, jax.random.PRNGKey(0), n_q=1)[0] ** 2
        )
    )(x)
    assert np.abs(np.asarray(g)).sum() > 0


def test_uninited_state_takes_slow_branch_and_inits():
    """With kmeans pending, the runtime cond must run the kmeans scan."""
    cfg, st, x = _setup()
    st = st.replace(inited=jnp.zeros_like(st.inited))
    q, idx, commits, subq, ns = jax.jit(
        lambda x, st: rvq_train_forward(cfg, st, x, jax.random.PRNGKey(3))
    )(x, st)
    assert np.asarray(ns.inited).min() == 1.0
    assert np.isfinite(np.asarray(q)).all()
