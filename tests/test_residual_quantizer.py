"""ResidualQuantizer (lucidrains surface, residual_quantizer.py:5-49).

The reference registers this wrapper in no task choice; these tests pin the
surface contract we expose: (quantized, indices (B,T,n_q), commit_loss, state)
and the quantize-dropout depth set derived from cutoff_index/multiple_of.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from funcodec_tpu.models.quantizer import ResidualQuantizer


def test_forward_contract_shapes():
    rq = ResidualQuantizer(
        input_size=16, codebook_size=32, num_quantizers=4, kmeans_init=False
    )
    params, state = rq.init(jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 10, 16))
    q, idx, loss, new_state = rq(params, state, x, jax.random.PRNGKey(2))
    assert q.shape == x.shape
    assert idx.shape == (2, 10, 4)  # lucidrains stacks indices last
    assert loss.shape == ()
    assert rq.output_size() == 16
    # deterministic round-trip: encode -> decode reproduces the quantized sum
    codes = rq.encode(params, new_state, x)  # (n_q, B, T)
    dec = rq.decode(params, new_state, codes)
    q2, idx2, _ = rq.inference(params, new_state, x)
    np.testing.assert_allclose(np.asarray(dec), np.asarray(q2), rtol=1e-5, atol=1e-5)
    np.testing.assert_array_equal(
        np.asarray(codes), np.asarray(jnp.transpose(idx2, (0, 1, 2)))
    )


def test_commitment_weight_scales_loss():
    kw = dict(input_size=8, codebook_size=16, num_quantizers=2, kmeans_init=False)
    rq1 = ResidualQuantizer(commitment_weight=1.0, **kw)
    rq3 = ResidualQuantizer(commitment_weight=3.0, **kw)
    params, state = rq1.init(jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 6, 8))
    _, _, l1, _ = rq1(params, state, x, jax.random.PRNGKey(2))
    _, _, l3, _ = rq3(params, state, x, jax.random.PRNGKey(2))
    np.testing.assert_allclose(np.asarray(l3), 3.0 * np.asarray(l1), rtol=1e-6)


@pytest.mark.parametrize(
    "cutoff,multiple,n_q,expect",
    [
        # lucidrains: c drawn from randrange(cutoff_index, n_q), kept depth =
        # round_up(c + 1, multiple_of) capped at n_q (residual_vq.py dropout
        # branch). Enumerated as a MULTISET (one entry per c) so the uniform
        # jax.random.choice over entries reproduces randrange's distribution.
        (1, 1, 4, (2, 3, 4)),
        (2, 1, 4, (3, 4)),
        (1, 2, 8, (2, 4, 4, 6, 6, 8, 8)),
        (3, 4, 8, (4, 8, 8, 8, 8)),
    ],
)
def test_dropout_depth_set(cutoff, multiple, n_q, expect):
    rq = ResidualQuantizer(
        input_size=8,
        codebook_size=16,
        num_quantizers=n_q,
        quantize_dropout=True,
        quantize_dropout_cutoff_index=cutoff,
        quantize_dropout_multiple_of=multiple,
        kmeans_init=False,
    )
    assert rq.cfg.rand_num_quant == expect


def test_task_registry_builds_residual_quantizer():
    from funcodec_tpu.tasks.codec import build_quantizer

    rq = build_quantizer(
        {"codebook_size": 32, "num_quantizers": 4, "commitment_weight": 2.0,
         "sync_codebook": True, "kmeans_init": False},
        input_size=16,
        name="residual_quantizer",
    )
    assert isinstance(rq, ResidualQuantizer)
    assert rq.commitment_weight == 2.0
    assert rq.cfg.num_quantizers == 4
