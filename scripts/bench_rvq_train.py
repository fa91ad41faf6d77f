"""RVQ training-forward cost in isolation (v5e, recipe shapes).

recon_grad - convs_grad says the RVQ train path costs ~130 ms fwd+bwd at
B=32 (32 layers, 1024 bins, D=128, N=4096). This times the quantizer train
forward and its grad alone to separate scan-latency from compute, A/B-able
against scan unroll settings. Appends to /tmp/rvq_train_bench.log.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

LOG = "/tmp/rvq_train_bench.log"


from _benchlib import make_logger  # noqa: E402

log = make_logger(LOG)


def main():
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _build_flagship

    model, _ = _build_flagship(kmeans_init=True)
    params, rvq_state = model.init(jax.random.PRNGKey(0))
    B, Tq, D = 32, 128, 128
    emb = jnp.asarray(
        np.random.RandomState(0).randn(B, Tq, D).astype(np.float32)
    )
    # steady state: mark every codebook inited (with dropout, layers init
    # lazily on first activity; timing-wise only the branch matters)
    rvq_state = rvq_state.replace(
        inited=jnp.ones_like(rvq_state.inited),
        embed=jnp.asarray(
            np.random.RandomState(1).randn(*rvq_state.embed.shape), jnp.float32
        ),
        cluster_size=jnp.ones_like(rvq_state.cluster_size),
    )
    log(f"inited: {float(np.asarray(rvq_state.inited).min()):.0f}")

    def timeit(fn, *args, warmup=2, iters=6):
        for _ in range(warmup):
            float(np.asarray(fn(*args)))
        best = float("inf")
        for _ in range(iters):
            t0 = time.perf_counter()
            float(np.asarray(fn(*args)))
            best = min(best, time.perf_counter() - t0)
        return best

    @jax.jit
    def fwd(p, st, emb):
        q, idx, commit, subq, new_state = model.quantizer.train_forward(
            p["quantizer"], st, emb, jax.random.PRNGKey(3)
        )
        return jnp.sum(jnp.abs(q)) + jnp.sum(new_state.embed)

    log(f"rvq_train_fwd: {timeit(fwd, params, rvq_state, emb)*1e3:.1f} ms")

    @jax.jit
    def grad(p, st, emb):
        def loss(emb):
            q, idx, commit, subq, new_state = model.quantizer.train_forward(
                p["quantizer"], st, emb, jax.random.PRNGKey(3)
            )
            return jnp.sum(jnp.abs(q)) + jnp.sum(commit)

        v, g = jax.value_and_grad(loss)(emb)
        return v + jnp.sum(jnp.abs(g))

    log(f"rvq_train_grad: {timeit(grad, params, rvq_state, emb)*1e3:.1f} ms")


if __name__ == "__main__":
    main()
