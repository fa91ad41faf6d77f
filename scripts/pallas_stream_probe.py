"""Dispatch-amortized TPU micro-benchmarks (axon-safe methodology).

Every host-timed call on the axon tunnel carries a ~30-40 ms fixed
dispatch+fetch floor, which silently dominates sub-50ms A/B comparisons
(learned the hard way — earlier per-step overhead estimates were garbage).
This probe repeats each op N times INSIDE one jit via lax.fori_loop with a
data dependency, so one dispatch covers N executions:
    t_op = (t(N) - t(0-ish)) / N     (we report t(N)/N with N large)

Sections:
  elementwise  — narrow (B,T,32) vs packed (B,T/4,128): the lane-padding
                 question, measured cleanly.
  pallas_copy  — raw Pallas streaming GB/s vs tile size.
  resblock     — packed-in/packed-out resblock: packed-XLA vs fused Pallas
                 per stage shape (the apply_layers_packed steady state),
                 plus the unfused XLA resblock baseline.
Appends to /tmp/pallas_probe.log.
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

LOG = "/tmp/pallas_probe.log"


from _benchlib import make_logger  # noqa: E402

log = make_logger(LOG)


from _benchlib import timeit_amortized  # noqa: E402


def elementwise():
    import jax
    import jax.numpy as jnp
    from jax import lax

    B = 256
    for shape, name in [((B, 160_000, 32), "narrow (T,32)"),
                        ((B, 40_000, 128), "packed (T/4,128)")]:
        x = jnp.asarray(np.random.RandomState(0).randn(*shape), jnp.bfloat16)
        gb = x.size * 2 / 1e9

        def make_loop(n):
            @jax.jit
            def f(v):
                y = lax.fori_loop(
                    0, n, lambda i, a: a * 1.0001 + 0.001, v)
                return jnp.sum(y[:, ::513, 0].astype(jnp.float32))
            return f

        dt = timeit_amortized(make_loop, 24, x)
        log(f"elementwise {name}: {dt*1e3:.2f} ms/op -> {2*gb/dt:.0f} GB/s r+w")


def pallas_copy():
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

    for tile in (1000, 4000, 10000):
        call = pl.pallas_call(
            scale_kernel,
            grid=(B, Tp // tile),
            in_specs=[pl.BlockSpec((1, tile, L), lambda b, t: (b, t, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((1, tile, L), lambda b, t: (b, t, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((B, Tp, L), x.dtype),
        )

        def make_loop(n, call=call):
            @jax.jit
            def f(v):
                y = lax.fori_loop(0, n, lambda i, a: call(a), v)
                return jnp.sum(y[:, ::513, 0].astype(jnp.float32))
            return f

        dt = timeit_amortized(make_loop, 16, x)
        steps = B * (Tp // tile)
        log(f"pallas copy tile={tile}: {dt*1e3:.2f} ms/op -> "
            f"{2*gb/dt:.0f} GB/s r+w | {dt/steps*1e6:.2f} us/step")


def resblock_stages():
    import jax
    import jax.numpy as jnp
    from jax import lax

    from funcodec_tpu.ops.conv import ConvSpec, init_conv, apply_sconv1d
    from funcodec_tpu.ops.packed import pack_factor
    from funcodec_tpu.models.seanet import _packed_resblock_xla
    from funcodec_tpu.ops.resblock_pallas import fused_resblock_tgn

    B = 256
    for Ts, Cs in [(160_000, 32), (80_000, 64), (20_000, 128)]:
        H = Cs // 2
        spec1 = ConvSpec(Cs, H, 3, norm="time_group_norm", pad_mode="reflect")
        spec2 = ConvSpec(H, Cs, 1, norm="time_group_norm", pad_mode="reflect")
        spec_s = ConvSpec(Cs, Cs, 1, norm="time_group_norm", pad_mode="reflect")
        k1, k2, k3 = jax.random.split(jax.random.PRNGKey(0), 3)
        params = [init_conv(k1, spec1), init_conv(k2, spec2), init_conv(k3, spec_s)]
        params = jax.tree_util.tree_map(lambda a: a.astype(jnp.bfloat16), params)
        f = pack_factor(Cs)
        xp0 = jnp.asarray(
            np.random.RandomState(1).randn(B, Ts // f, f * Cs), jnp.bfloat16)
        x0 = jnp.asarray(
            np.random.RandomState(1).randn(B, Ts, Cs), jnp.bfloat16)
        spec = ((("act", ("ELU", {})), ("conv", spec1),
                 ("act", ("ELU", {})), ("conv", spec2)), spec_s)
        p = {"block": [None, params[0], None, params[1]], "shortcut": params[2]}
        gb = B * Ts * Cs * 2 / 1e9

        def elu(v):
            return jax.nn.elu(v.astype(jnp.float32)).astype(v.dtype)

        def rb_xla(v):
            h = apply_sconv1d(spec1, params[0], elu(v))
            c = apply_sconv1d(spec2, params[1], elu(h))
            s = apply_sconv1d(spec_s, params[2], v)
            return c + s

        def rb_packed_xla(v):
            return _packed_resblock_xla(spec, p, v, Ts, f)

        def rb_pallas(v):
            return fused_resblock_tgn(v, *params, spec1, spec2, spec_s,
                                      packed_f=f)

        variants = [("xla-unpacked", rb_xla, x0),
                    ("xla-packed", rb_packed_xla, xp0),
                    ("pallas-packed", rb_pallas, xp0)]
        for name, fn, xin in variants:
            def make_loop(n, fn=fn):
                @jax.jit
                def g(v):
                    y = lax.fori_loop(0, n, lambda i, a: fn(a), v)
                    return jnp.sum(y[:, ::513, 0].astype(jnp.float32))
                return g

            dt = timeit_amortized(make_loop, 8, xin)
            log(f"resblock T={Ts} C={Cs} [{name}]: {dt*1e3:.2f} ms/op | "
                f"4-pass-equiv BW {4*gb/dt:.0f} GB/s")


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    if which in ("all", "elementwise"):
        elementwise()
    if which in ("all", "copy"):
        pallas_copy()
    if which in ("all", "resblock"):
        resblock_stages()
