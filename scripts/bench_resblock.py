"""A/B the fused whole-resblock Pallas kernel vs XLA on real TPU.

Per encoder-stage shape (bf16, flagship B=256 x 10 s) plus the full EnCodec
inference e2e with PALLAS_RESBLOCK on/off. Appends to /tmp/bench_resblock.log
so the run can be detached and polled (axon protocol: scalar-fetch fence,
best-of-N).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

LOG = "/tmp/bench_resblock.log"


def log(msg):
    line = f"[{time.strftime('%H:%M:%S')}] {msg}"
    print(line, flush=True)
    with open(LOG, "a") as f:
        f.write(line + "\n")


def timeit(fn, *args, warmup=2, iters=6):
    import jax.numpy as jnp

    for _ in range(warmup):
        out = fn(*args)
        float(jnp.sum(out[0] if isinstance(out, tuple) else out))
    best = float("inf")
    for _ in range(iters):
        t0 = time.perf_counter()
        out = fn(*args)
        float(jnp.sum(out[0] if isinstance(out, tuple) else out))
        best = min(best, time.perf_counter() - t0)
    return best


def stage_ab():
    import jax
    import jax.numpy as jnp

    import funcodec_tpu.ops.conv as conv_ops
    from funcodec_tpu.ops.conv import ConvSpec, init_conv, apply_sconv1d
    from funcodec_tpu.ops.resblock_pallas import fused_resblock_tgn

    B = 256
    for Ts, Cs in [(160_000, 32), (80_000, 64), (20_000, 128), (4_000, 256)]:
        H = Cs // 2
        spec1 = ConvSpec(Cs, H, 3, norm="time_group_norm", pad_mode="reflect")
        spec2 = ConvSpec(H, Cs, 1, norm="time_group_norm", pad_mode="reflect")
        spec_s = ConvSpec(Cs, Cs, 1, norm="time_group_norm", pad_mode="reflect")
        k1, k2, k3 = jax.random.split(jax.random.PRNGKey(0), 3)
        params = [init_conv(k1, spec1), init_conv(k2, spec2), init_conv(k3, spec_s)]
        params = jax.tree_util.tree_map(
            lambda a: a.astype(jnp.bfloat16), params)
        x = jnp.asarray(
            np.random.RandomState(1).randn(B, Ts, Cs), jnp.bfloat16)

        def elu(v):
            return jax.nn.elu(v.astype(jnp.float32)).astype(v.dtype)

        @jax.jit
        def xla_rb(v):
            h = apply_sconv1d(spec1, params[0], elu(v))
            c = apply_sconv1d(spec2, params[1], elu(h))
            s = apply_sconv1d(spec_s, params[2], v)
            return c + s

        @jax.jit
        def pal_rb(v):
            return fused_resblock_tgn(v, *params, spec1, spec2, spec_s)

        dt_x = timeit(xla_rb, x)
        dt_p = timeit(pal_rb, x)
        gb = B * Ts * Cs * 2 / 1e9
        log(f"stage T={Ts} C={Cs} ({gb:.2f} GB): XLA {dt_x*1e3:.2f} ms | "
            f"Pallas {dt_p*1e3:.2f} ms | {dt_x/dt_p:.2f}x | "
            f"pallas 4-pass BW {4*gb/dt_p:.0f} GB/s")
        # numerics check at this scale
        d = np.abs(np.asarray(xla_rb(x), np.float32) -
                   np.asarray(pal_rb(x), np.float32))
        log(f"  max|diff| {d.max():.4f} mean {d.mean():.5f}")


def stage_packed():
    """Steady-state narrow-stage resblock: input/output stay PACKED (the
    apply_layers_packed regime) — no boundary relayout in the measurement."""
    import jax
    import jax.numpy as jnp

    from funcodec_tpu.ops.conv import ConvSpec, init_conv
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
        xp = jnp.asarray(
            np.random.RandomState(1).randn(B, Ts // f, 128), jnp.bfloat16)
        spec = ((("act", ("ELU", {})), ("conv", spec1),
                 ("act", ("ELU", {})), ("conv", spec2)), spec_s)
        p = {"block": [None, params[0], None, params[1]], "shortcut": params[2]}

        @jax.jit
        def xla_packed(v):
            return _packed_resblock_xla(spec, p, v, Ts, f)

        @jax.jit
        def pal_packed(v):
            return fused_resblock_tgn(v, *params, spec1, spec2, spec_s,
                                      packed_f=f)

        dt_x = timeit(xla_packed, xp)
        dt_p = timeit(pal_packed, xp)
        gb = B * Ts * Cs * 2 / 1e9
        log(f"PACKED stage T={Ts} C={Cs} ({gb:.2f} GB): packed-XLA "
            f"{dt_x*1e3:.2f} ms | Pallas {dt_p*1e3:.2f} ms | "
            f"pallas 4-pass BW {4*gb/dt_p:.0f} GB/s")
        d = np.abs(np.asarray(xla_packed(xp), np.float32) -
                   np.asarray(pal_packed(xp), np.float32))
        log(f"  max|diff| {d.max():.4f} mean {d.mean():.5f}")


def e2e_packed(batch=256, seconds=10):
    """Full inference with PACKED_NARROW (+Pallas resblocks) vs plain XLA."""
    import jax
    import jax.numpy as jnp

    import funcodec_tpu.ops.conv as conv_ops
    import funcodec_tpu.quant.rvq as rvq_mod
    from __graft_entry__ import _build_flagship

    rvq_mod.PALLAS_RVQ = True
    model, _ = _build_flagship(kmeans_init=False)
    params, rvq_state = model.init(jax.random.PRNGKey(0))
    params = jax.tree_util.tree_map(
        lambda a: a.astype(jnp.bfloat16) if a.dtype == jnp.float32 else a, params)
    T = seconds * 16000
    speech = jnp.asarray(
        np.random.RandomState(0).randn(batch, T), np.float32
    ).astype(jnp.bfloat16) * 0.1

    def make_fn():
        @jax.jit
        def run(p, st, s):
            out = model.inference(p, st, s, need_recon=True)
            return (jnp.sum(jnp.abs(out["recon_speech"].astype(jnp.float32))),
                    out["code_indices"][0])
        return run

    au = batch * seconds
    results = {}
    for name, packed, pallas in (
        ("xla", False, False),
        ("packed-xla", True, False),
        ("packed+pallas", True, True),
    ):
        conv_ops.PACKED_NARROW = packed
        conv_ops.PALLAS_RESBLOCK = pallas
        fn = make_fn()
        dt = timeit(fn, params, rvq_state, speech)
        tok = np.asarray(fn(params, rvq_state, speech)[1])
        results[name] = (dt, tok)
        base = results["xla"][0]
        log(f"e2e[{name}] B={batch}x{seconds}s: {dt*1e3:.1f} ms "
            f"({au/dt:.0f} au_s/s) | {base/dt:.2f}x vs xla | "
            f"q0 flip vs xla {(tok != results['xla'][1]).mean():.5f}")
    conv_ops.PACKED_NARROW = False
    conv_ops.PALLAS_RESBLOCK = False


def e2e_ab(batch=256, seconds=10):
    import jax
    import jax.numpy as jnp

    import funcodec_tpu.ops.conv as conv_ops
    import funcodec_tpu.quant.rvq as rvq_mod
    from __graft_entry__ import _build_flagship

    rvq_mod.PALLAS_RVQ = True
    model, _ = _build_flagship(kmeans_init=False)
    params, rvq_state = model.init(jax.random.PRNGKey(0))
    params = jax.tree_util.tree_map(
        lambda a: a.astype(jnp.bfloat16) if a.dtype == jnp.float32 else a, params)
    T = seconds * 16000
    speech = jnp.asarray(
        np.random.RandomState(0).randn(batch, T), jnp.float32).astype(jnp.bfloat16) * 0.1

    def make_fn():
        @jax.jit
        def run(p, st, s):
            out = model.inference(p, st, s, need_recon=True)
            return (jnp.sum(jnp.abs(out["recon_speech"].astype(jnp.float32))),
                    out["code_indices"][0])
        return run

    conv_ops.PALLAS_RESBLOCK = False
    f0 = make_fn()
    dt0 = timeit(f0, params, rvq_state, speech)
    tok0 = np.asarray(f0(params, rvq_state, speech)[1])

    conv_ops.PALLAS_RESBLOCK = True
    f1 = make_fn()
    dt1 = timeit(f1, params, rvq_state, speech)
    tok1 = np.asarray(f1(params, rvq_state, speech)[1])

    au = batch * seconds
    log(f"e2e bf16 B={batch}x{seconds}s: XLA {dt0*1e3:.1f} ms ({au/dt0:.0f} au_s/s) | "
        f"+resblock {dt1*1e3:.1f} ms ({au/dt1:.0f} au_s/s) | {dt0/dt1:.2f}x | "
        f"q0 flip {(tok0 != tok1).mean():.5f}")


if __name__ == "__main__":
    mode = sys.argv[1] if len(sys.argv) > 1 else "all"
    if mode in ("all", "stage"):
        stage_ab()
    if mode in ("all", "e2e"):
        e2e_ab()
    if mode in ("packed", "stage_packed"):
        stage_packed()
    if mode in ("packed", "e2e_packed"):
        e2e_packed()
