"""Probe XLA TPU layout/traffic behavior for narrow-channel tensors.

Questions this answers (design inputs for the fused-resblock kernel):
1. Does an elementwise pass over (B, T, 32) bf16 move logical bytes
   (~2.6 GB) or lane-padded bytes (4x)?
2. Is reshape (B, T, 32) -> (B, T/4, 128) free or a relayout copy?
3. What does the XLA resblock (ELU/conv/tgn x3/add) cost at each encoder
   stage shape, as the baseline the Pallas kernel must beat?
"""

import sys, os, time, json
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

PEAK_GBS = 819.0


def timeit(fn, *args, warmup=2, iters=6):
    for _ in range(warmup):
        r = fn(*args)
        float(jnp.sum(r[0] if isinstance(r, tuple) else r)) if r.ndim else float(r)
    best = float("inf")
    for _ in range(iters):
        t0 = time.perf_counter()
        r = fn(*args)
        _ = float(jnp.sum(r[0] if isinstance(r, tuple) else r)) if r.ndim else float(r)
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    B, T, C = 256, 160_000, 32
    x = jnp.asarray(np.random.RandomState(0).randn(B, T, C), jnp.bfloat16)
    gb = B * T * C * 2 / 1e9

    add1 = jax.jit(lambda v: v + 1.0)
    dt = timeit(add1, x)
    print(f"elementwise (B,T,32) bf16: {dt*1e3:.2f} ms -> "
          f"{2*gb/dt:.0f} GB/s logical ({200*gb/dt/PEAK_GBS:.0f}% of peak r+w)",
          flush=True)

    resh = jax.jit(lambda v: v.reshape(B, T // 4, C * 4) * 1.0)
    dt2 = timeit(resh, x)
    print(f"reshape->(*,T/4,128) + mul: {dt2*1e3:.2f} ms (vs {dt*1e3:.2f} elementwise)",
          flush=True)

    resh2 = jax.jit(lambda v: jnp.sum(v.reshape(B, T // 4, C * 4), axis=(1, 2)))
    dt3 = timeit(resh2, x)
    red = jax.jit(lambda v: jnp.sum(v, axis=(1, 2)))
    dt4 = timeit(red, x)
    print(f"reshape+reduce: {dt3*1e3:.2f} ms | plain reduce: {dt4*1e3:.2f} ms",
          flush=True)

    if os.environ.get("PROBE_SKIP_RESBLOCK"):
        return

    # XLA resblock per stage shape (the Pallas target baseline)
    from funcodec_tpu.ops.conv import ConvSpec, init_conv, apply_conv

    for (Ts, Cs) in [(160_000, 32), (80_000, 64), (20_000, 128), (4_000, 256)]:
        spec1 = ConvSpec(Cs, Cs // 2, 3, norm="time_group_norm", pad_mode="reflect")
        spec2 = ConvSpec(Cs // 2, Cs, 1, norm="time_group_norm", pad_mode="reflect")
        specs = ConvSpec(Cs, Cs, 1, norm="time_group_norm", pad_mode="reflect")
        k = jax.random.PRNGKey(0)
        k1, k2, k3 = jax.random.split(k, 3)
        p1, p2, ps = init_conv(k1, spec1), init_conv(k2, spec2), init_conv(k3, specs)
        p1, p2, ps = jax.tree_util.tree_map(
            lambda a: a.astype(jnp.bfloat16), (p1, p2, ps))
        xs = jnp.asarray(np.random.RandomState(1).randn(B, Ts, Cs), jnp.bfloat16)

        def elu(v):
            vf = v.astype(jnp.float32)
            return jnp.where(vf > 0, vf, jnp.exp(jnp.minimum(vf, 0.0)) - 1.0).astype(v.dtype)

        @jax.jit
        def resblock(v):
            h = apply_conv(spec1, p1, elu(v))
            c = apply_conv(spec2, p2, elu(h))
            s = apply_conv(specs, ps, v)
            return c + s

        dt = timeit(resblock, xs)
        g = B * Ts * Cs * 2 / 1e9
        print(f"XLA resblock T={Ts} C={Cs}: {dt*1e3:.2f} ms "
              f"(tensor {g:.2f} GB; 4-pass ideal {4*g/PEAK_GBS*1e3:.2f} ms)",
              flush=True)


def packed_vs_narrow():
    """Confirm lane padding: same logical bytes, full vs quarter lanes."""
    import jax
    import jax.numpy as jnp

    B = 256
    xn = jnp.asarray(np.random.RandomState(0).randn(B, 160_000, 32), jnp.bfloat16)
    xp = jnp.asarray(np.random.RandomState(0).randn(B, 40_000, 128), jnp.bfloat16)
    add1 = jax.jit(lambda v: v + 1.0)
    dtn = timeit(add1, xn)
    dtp = timeit(add1, xp)
    gb = B * 160_000 * 32 * 2 / 1e9
    print(f"elementwise narrow (T,32): {dtn*1e3:.2f} ms ({2*gb/dtn:.0f} GB/s) | "
          f"packed (T/4,128): {dtp*1e3:.2f} ms ({2*gb/dtp:.0f} GB/s) | "
          f"ratio {dtn/dtp:.2f}x", flush=True)


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "packed":
        packed_vs_narrow()
    else:
        main()
