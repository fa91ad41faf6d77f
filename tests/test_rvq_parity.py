"""RVQ parity vs the reference DistributedResidualVectorQuantization."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from funcodec_tpu.quant.rvq import (
    RVQConfig,
    RVQState,
    rvq_decode,
    rvq_encode,
    rvq_inference,
    rvq_train_forward,
)


def _make_ref(torch, n_q=4, bins=64, dim=16, decay=0.9, dropout=False, rand_num_quant=None):
    from funcodec.modules.quantization.ddp_core_vq import (
        DistributedResidualVectorQuantization,
    )

    m = DistributedResidualVectorQuantization(
        num_quantizers=n_q,
        dim=dim,
        codebook_size=bins,
        decay=decay,
        kmeans_init=False,
        kmeans_iters=5,
        threshold_ema_dead_code=2,
        quantize_dropout=dropout,
        rand_num_quant=rand_num_quant,
    )
    return m


def _state_from_ref(m) -> RVQState:
    # np.array(..., copy=True): on the CPU backend jnp.asarray is zero-copy,
    # and the reference forward mutates these buffers in place.
    return RVQState(
        inited=jnp.asarray(np.array(m.inited.detach().numpy().reshape(-1), copy=True)),
        cluster_size=jnp.asarray(np.array(m.cluster_size.detach().numpy(), copy=True)),
        embed=jnp.asarray(np.array(m.embed.detach().numpy(), copy=True)),
        embed_avg=jnp.asarray(np.array(m.embed_avg.detach().numpy(), copy=True)),
    )


def test_encode_decode_parity(torch):
    n_q, bins, dim = 4, 64, 16
    m = _make_ref(torch, n_q, bins, dim).eval()
    cfg = RVQConfig(dim=dim, codebook_size=bins, num_quantizers=n_q, kmeans_init=False)
    state = _state_from_ref(m)

    x = torch.randn(2, dim, 50)  # torch layout (B, D, T)
    with torch.no_grad():
        idx_ref = m.encode(x).numpy()  # (n_q, B, T)
        dec_ref = m.decode(torch.from_numpy(idx_ref)).numpy()  # (B, D, T)

    x_j = jnp.asarray(x.numpy().transpose(0, 2, 1))  # (B, T, D)
    idx = np.asarray(rvq_encode(cfg, state, x_j))
    np.testing.assert_array_equal(idx, idx_ref)

    dec = np.asarray(rvq_decode(cfg, state, jnp.asarray(idx)))
    np.testing.assert_allclose(dec.transpose(0, 2, 1), dec_ref, atol=1e-5, rtol=1e-5)


def test_partial_nq_encode(torch):
    n_q, bins, dim = 8, 32, 8
    m = _make_ref(torch, n_q, bins, dim).eval()
    cfg = RVQConfig(dim=dim, codebook_size=bins, num_quantizers=n_q, kmeans_init=False)
    state = _state_from_ref(m)
    x = torch.randn(3, dim, 17)
    with torch.no_grad():
        idx_ref = m.encode(x, n_q=3).numpy()
    x_j = jnp.asarray(x.numpy().transpose(0, 2, 1))
    idx = np.asarray(rvq_encode(cfg, state, x_j, n_q=3))
    np.testing.assert_array_equal(idx, idx_ref)


def test_eval_forward_parity(torch):
    """Eval-mode forward (no EMA/no dropout) matches rvq_inference."""
    n_q, bins, dim = 4, 64, 16
    m = _make_ref(torch, n_q, bins, dim).eval()
    cfg = RVQConfig(dim=dim, codebook_size=bins, num_quantizers=n_q, kmeans_init=False)
    state = _state_from_ref(m)
    x = torch.randn(2, dim, 23)
    with torch.no_grad():
        q_ref, idx_ref, losses_ref, subq_ref = m(x)
    x_j = jnp.asarray(x.numpy().transpose(0, 2, 1))
    q, idx, subq = rvq_inference(cfg, state, x_j)
    np.testing.assert_array_equal(np.asarray(idx), idx_ref.numpy())
    np.testing.assert_allclose(
        np.asarray(q).transpose(0, 2, 1), q_ref.numpy(), atol=1e-5, rtol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(subq).transpose(0, 1, 3, 2), subq_ref.numpy(), atol=1e-5, rtol=1e-5
    )


def test_train_forward_ema_parity(torch):
    """One training step: EMA buffer updates + outputs match the reference."""
    n_q, bins, dim, decay = 3, 32, 8, 0.9
    m = _make_ref(torch, n_q, bins, dim, decay=decay)
    m.train()
    # give cluster stats a warm start so laplace smoothing is exercised
    with torch.no_grad():
        m.cluster_size.uniform_(0, 5)
        m.embed_avg.copy_(m.embed * m.cluster_size.unsqueeze(-1).clamp(min=0.5))

    cfg = RVQConfig(
        dim=dim, codebook_size=bins, num_quantizers=n_q, decay=decay,
        kmeans_init=False, expiry_mode="reference",
    )
    state = _state_from_ref(m)

    x = torch.randn(2, dim, 40)
    q_ref, idx_ref, losses_ref, subq_ref = m(x)

    x_j = jnp.asarray(x.numpy().transpose(0, 2, 1))
    key = jax.random.PRNGKey(0)
    q, idx, commits, subq, new_state = rvq_train_forward(cfg, state, x_j, key)

    np.testing.assert_array_equal(np.asarray(idx), idx_ref.numpy())
    np.testing.assert_allclose(
        np.asarray(q).transpose(0, 2, 1), q_ref.detach().numpy(), atol=1e-5, rtol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(commits), losses_ref.detach().numpy().reshape(-1), atol=1e-6, rtol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(new_state.cluster_size), m.cluster_size.numpy(), atol=1e-5, rtol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(new_state.embed_avg), m.embed_avg.numpy(), atol=1e-5, rtol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(new_state.embed), m.embed.numpy(), atol=1e-5, rtol=1e-5
    )


def test_train_forward_gradients_match(torch):
    """d loss / d x matches torch autograd through STE + commit losses."""
    n_q, bins, dim = 3, 16, 8
    m = _make_ref(torch, n_q, bins, dim)
    m.train()
    cfg = RVQConfig(
        dim=dim, codebook_size=bins, num_quantizers=n_q, decay=0.9,
        kmeans_init=False, expiry_mode="reference",
    )
    state = _state_from_ref(m)

    x = torch.randn(2, dim, 10, requires_grad=True)
    q_ref, idx_ref, losses_ref, _ = m(x)
    loss_ref = q_ref.sum() + losses_ref.mean()
    loss_ref.backward()
    gx_ref = x.grad.numpy()

    def loss_fn(x_j):
        q, _, commits, _, _ = rvq_train_forward(
            cfg, state, x_j, jax.random.PRNGKey(0)
        )
        return jnp.sum(q) + jnp.mean(commits)

    x_j = jnp.asarray(x.detach().numpy().transpose(0, 2, 1))
    gx = np.asarray(jax.grad(loss_fn)(x_j)).transpose(0, 2, 1)
    np.testing.assert_allclose(gx, gx_ref, atol=1e-5, rtol=1e-5)


def test_quantizer_dropout_cutoff(torch):
    """Forced single-choice dropout matches the reference's null outputs."""
    n_q, bins, dim = 4, 16, 8
    m = _make_ref(torch, n_q, bins, dim, decay=0.9, dropout=True, rand_num_quant=[2])
    m.train()
    cfg = RVQConfig(
        dim=dim, codebook_size=bins, num_quantizers=n_q, decay=0.9,
        kmeans_init=False, quantize_dropout=True, rand_num_quant=(2,),
        expiry_mode="reference",
    )
    state = _state_from_ref(m)
    x = torch.randn(2, dim, 9)
    q_ref, idx_ref, losses_ref, subq_ref = m(x)

    x_j = jnp.asarray(x.numpy().transpose(0, 2, 1))
    q, idx, commits, subq, new_state = rvq_train_forward(
        cfg, state, x_j, jax.random.PRNGKey(1)
    )
    idx = np.asarray(idx)
    np.testing.assert_array_equal(idx, idx_ref.numpy())
    assert (idx[2:] == -1).all()
    np.testing.assert_allclose(
        np.asarray(q).transpose(0, 2, 1), q_ref.detach().numpy(), atol=1e-5, rtol=1e-5
    )
    # dropped layers keep buffers untouched
    np.testing.assert_array_equal(
        np.asarray(new_state.embed[2:]), np.asarray(state.embed[2:])
    )
    np.testing.assert_allclose(
        np.asarray(new_state.embed[:2]), m.embed.detach().numpy()[:2], atol=1e-5, rtol=1e-5
    )
    # sub_quants null value is -1.0 (ddp_core_vq.py:385)
    assert np.allclose(np.asarray(subq)[2:], -1.0)


def test_kmeans_init_runs_once():
    """kmeans-init path: first call initializes, second call leaves init stable."""
    cfg = RVQConfig(
        dim=8, codebook_size=16, num_quantizers=2, decay=0.9,
        kmeans_init=True, kmeans_iters=10, expiry_mode="reference",
    )
    from funcodec_tpu.quant.rvq import init_rvq_state

    state = init_rvq_state(cfg)
    assert float(state.inited.sum()) == 0.0
    x = jax.random.normal(jax.random.PRNGKey(0), (4, 32, 8))
    q, idx, commits, subq, state1 = rvq_train_forward(
        cfg, state, x, jax.random.PRNGKey(1)
    )
    assert float(state1.inited.sum()) == 2.0
    # after init, encode produces valid indices and decode reconstructs
    codes = rvq_encode(cfg, state1, x)
    assert codes.shape == (2, 4, 32)
    assert int(codes.min()) >= 0 and int(codes.max()) < 16
    q2, *_ = rvq_train_forward(cfg, state1, x, jax.random.PRNGKey(2))
    # quantized output should be a reasonable approximation after kmeans
    err = float(jnp.mean((q2 - x) ** 2) / jnp.mean(x**2))
    assert err < 0.9  # meaningfully better than the zero-codebook baseline (1.0)


def test_q0_ds_ratio_train_forward_parity(torch):
    """q0 at half time resolution (ddp_core_vq.py:396-406)."""
    from funcodec.modules.quantization.ddp_core_vq import (
        DistributedResidualVectorQuantization,
    )

    n_q, bins, dim, decay = 3, 32, 8, 0.9
    m = DistributedResidualVectorQuantization(
        num_quantizers=n_q, dim=dim, codebook_size=bins, decay=decay,
        kmeans_init=False, kmeans_iters=5, threshold_ema_dead_code=2,
        quantize_dropout=False, rand_num_quant=None, q0_ds_ratio=2,
    )
    m.train()
    cfg = RVQConfig(
        dim=dim, codebook_size=bins, num_quantizers=n_q, decay=decay,
        kmeans_init=False, q0_ds_ratio=2, expiry_mode="reference",
    )
    state = _state_from_ref(m)
    x = torch.randn(2, dim, 20)
    q_ref, idx_ref, losses_ref, subq_ref = m(x)

    x_j = jnp.asarray(x.numpy().transpose(0, 2, 1))
    q, idx, commits, subq, new_state = rvq_train_forward(
        cfg, state, x_j, jax.random.PRNGKey(0)
    )
    np.testing.assert_array_equal(np.asarray(idx), idx_ref.numpy())
    np.testing.assert_allclose(
        np.asarray(q).transpose(0, 2, 1), q_ref.detach().numpy(), atol=1e-5, rtol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(commits), losses_ref.detach().numpy().reshape(-1), atol=1e-6, rtol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(new_state.embed), m.embed.numpy(), atol=1e-5, rtol=1e-4
    )
