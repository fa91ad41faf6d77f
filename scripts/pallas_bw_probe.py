"""Why does a blocked pallas_call copy stream at ~258 GB/s when XLA
elementwise sustains ~544 GB/s on the same tensor? (v5e, bf16)

Variants probed (all dispatch-amortized via fori_loop, array passed as a
traced argument — see scripts/pallas_stream_probe.py methodology):
  A. pallas_call blocked copy, default pipeline          (baseline: ~258)
  B. A + dimension_semantics=(parallel, arbitrary)
  C. A with grid collapsed to 1-D over T (B inside block)
  D. manual double-buffered DMA kernel (HBM refs, 2 slots)
  E. A with fp32 instead of bf16 (is it a narrow-store artifact?)

Appends to /tmp/pallas_probe.log.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

LOG = "/tmp/pallas_probe.log"


from _benchlib import make_logger  # noqa: E402

log = make_logger(LOG)


from _benchlib import timeit_amortized  # noqa: E402


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, Tp, L = 256, 20_000, 128
    x = jnp.asarray(np.random.RandomState(0).randn(B, Tp, L), jnp.bfloat16)
    gb = x.size * 2 / 1e9

    def scale_kernel(x_ref, o_ref):
        o_ref[...] = x_ref[...] * 2.0

    def bench(name, call, xin, reps=16):
        def make_loop(n, call=call):
            @jax.jit
            def f(v):
                y = lax.fori_loop(0, n, lambda i, a: call(a), v)
                return jnp.sum(y[:, ::513, 0].astype(jnp.float32))
            return f

        try:
            dt = timeit_amortized(make_loop, reps, xin)
        except Exception as e:  # noqa: BLE001
            log(f"{name}: FAILED {type(e).__name__}: {str(e)[:160]}")
            return
        nbytes = xin.size * xin.dtype.itemsize
        log(f"{name}: {dt*1e3:.2f} ms/op -> {2*nbytes/1e9/dt:.0f} GB/s r+w")

    tile = 4000

    # A: default pipeline
    call_a = pl.pallas_call(
        scale_kernel,
        grid=(B, Tp // tile),
        in_specs=[pl.BlockSpec((1, tile, L), lambda b, t: (b, t, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, tile, L), lambda b, t: (b, t, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, Tp, L), x.dtype),
    )
    bench("A default", call_a, x)

    # B: dimension semantics parallel/arbitrary
    for sems in [("parallel", "arbitrary"), ("arbitrary", "arbitrary"),
                 ("parallel", "parallel")]:
        call_b = pl.pallas_call(
            scale_kernel,
            grid=(B, Tp // tile),
            in_specs=[pl.BlockSpec((1, tile, L), lambda b, t: (b, t, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((1, tile, L), lambda b, t: (b, t, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((B, Tp, L), x.dtype),
            compiler_params=pltpu.CompilerParams(dimension_semantics=sems),
        )
        bench(f"B sem={sems}", call_b, x)

    # C: multi-batch blocks (8 rows per block: 8*4000*128*2B = 8 MB VMEM
    # in+out with double buffering stays under the 16 MB scoped limit at
    # Bc=8/tile 2000)
    for bc, tile_t in [(8, 2000), (16, 1000)]:
        call_c = pl.pallas_call(
            scale_kernel,
            grid=(B // bc, Tp // tile_t),
            in_specs=[pl.BlockSpec((bc, tile_t, L), lambda b, t: (b, t, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((bc, tile_t, L), lambda b, t: (b, t, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((B, Tp, L), x.dtype),
        )
        bench(f"C block=({bc},{tile_t})", call_c, x)

    # D: manual double-buffered DMA, refs stay in HBM ("ANY")
    chunk = 2000  # rows of (B*Tp) flattened view processed per DMA

    xf = x.reshape(B * Tp, L)

    def dma_kernel(h_ref, o_ref):
        n_chunks = (B * Tp) // chunk

        def body(scratch, osc, sem, osem):
            def get_in(slot, ci):
                return pltpu.make_async_copy(
                    h_ref.at[pl.ds(ci * chunk, chunk)],
                    scratch.at[slot], sem.at[slot])

            get_in(0, 0).start()

            def loop_body(ci, _):
                cur = lax.rem(ci, 2)
                nxt = lax.rem(ci + 1, 2)

                @pl.when(ci + 1 < n_chunks)
                def _():
                    get_in(nxt, ci + 1).start()

                get_in(cur, ci).wait()
                osc[cur] = scratch[cur] * 2.0
                out_dma = pltpu.make_async_copy(
                    osc.at[cur], o_ref.at[pl.ds(ci * chunk, chunk)],
                    osem.at[cur])
                out_dma.start()
                # wait for the out DMA two iterations later would be ideal;
                # simplest correct: wait before reusing the slot
                @pl.when(ci >= 1)
                def _():
                    pass
                out_dma.wait()

            lax.fori_loop(0, n_chunks, loop_body, None)

        pl.run_scoped(
            body,
            scratch=pltpu.VMEM((2, chunk, L), x.dtype),
            osc=pltpu.VMEM((2, chunk, L), x.dtype),
            sem=pltpu.SemaphoreType.DMA((2,)),
            osem=pltpu.SemaphoreType.DMA((2,)),
        )

    call_d = pl.pallas_call(
        dma_kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
        out_shape=jax.ShapeDtypeStruct((B * Tp, L), x.dtype),
    )

    def call_d_wrap(v):
        return call_d(v.reshape(B * Tp, L)).reshape(B, Tp, L)

    bench("D manual-dma chunk=2000", call_d_wrap, x, reps=8)

    # E: fp32
    xf32 = x.astype(jnp.float32)
    call_e = pl.pallas_call(
        scale_kernel,
        grid=(B, Tp // tile),
        in_specs=[pl.BlockSpec((1, tile, L), lambda b, t: (b, t, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, tile, L), lambda b, t: (b, t, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, Tp, L), jnp.float32),
    )
    bench("E fp32 default", call_e, xf32)


if __name__ == "__main__":
    main()
