"""A/B: BLOCKED_F (frequency space-to-depth) disc tower vs plain, real
shared GAN step at the headline batch.

The B=64 bf16 trace (artifacts/trace_train_b64_r5.json) put 56% of the
train step in the MS-STFT disc tower's 32-channel 2D convs (200 GB/s,
<=21% MXU). discriminators.BLOCKED_F reruns the tower with F-bin pairs
folded into channels (C 32->64, kernels rewritten (3,9)->(3,6|5)) —
exactness pinned in tests/test_disc_blocked.py. This times the full jitted
shared step both ways in one process (second compile is cheap same-process)
and writes artifacts/blocked_disc_ab_r5.json.

Usage: python scripts/blocked_disc_ab.py [--batch 64] [--steps 30]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

LOG = "/tmp/blocked_disc_ab.log"


def log(msg):
    line = f"[{time.strftime('%H:%M:%S')}] {msg}"
    print(line, flush=True)
    with open(LOG, "a") as f:
        f.write(line + "\n")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--steps", type=int, default=30)
    ap.add_argument("--dur_s", type=float, default=2.56)
    ap.add_argument("--block_ns", type=str, default="2,4",
                    help="comma list of block sizes; 0 (plain) always runs")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    import funcodec_tpu.models.discriminators as D
    from __graft_entry__ import _build_flagship
    from funcodec_tpu.train.step import (
        create_gan_train_state, make_gan_train_step, make_optimizer,
    )

    model, disc = _build_flagship(kmeans_init=True)
    params, rvq_state = model.init(jax.random.PRNGKey(0))
    disc_params = disc.init(jax.random.PRNGKey(1))
    rvq_state = rvq_state.replace(
        inited=jnp.ones_like(rvq_state.inited),
        embed=jnp.asarray(
            np.random.RandomState(2).randn(*rvq_state.embed.shape),
            jnp.float32),
        cluster_size=jnp.ones_like(rvq_state.cluster_size),
    )
    opt_g = make_optimizer(lr=3e-4, betas=(0.5, 0.9))
    opt_d = make_optimizer(lr=3e-4, betas=(0.5, 0.9))
    B, T = args.batch, int(args.dur_s * 16000)
    speech = jnp.asarray(
        np.random.RandomState(0).randn(B, T).astype(np.float32) * 0.1)
    rng = jax.random.PRNGKey(7)

    results = {"batch": B, "t_samples": T, "steps": args.steps,
               "compute_dtype": "bfloat16"}
    arms = [("plain", 0)] + [
        (f"blocked_f{n}", int(n)) for n in args.block_ns.split(",") if int(n)
    ]
    for name, block_n in arms:
        D.BLOCKED_F = block_n > 0
        D.BLOCK_F_N = max(block_n, 2)
        state = create_gan_train_state(
            params, disc_params, rvq_state, opt_g, opt_d)
        step = jax.jit(make_gan_train_step(
            model, disc, opt_g, opt_d, compute_dtype=jnp.bfloat16,
            shared_forward=True))
        t0 = time.perf_counter()
        state, stats = step(state, {"speech": speech}, rng)
        gl = float(stats["generator_loss"])
        log(f"{name}: compile+first {time.perf_counter()-t0:.0f}s "
            f"g_loss={gl:.4f}")
        t0 = time.perf_counter()
        for _ in range(args.steps):
            state, stats = step(state, {"speech": speech}, rng)
        gl = float(stats["generator_loss"])
        ms = (time.perf_counter() - t0) * 1e3 / args.steps
        log(f"{name}: steady {ms:.1f} ms/step g_loss_end={gl:.4f} "
            f"d_loss_end={float(stats['discriminator_loss']):.4f}")
        results[name] = {
            "steady_ms_per_step": round(ms, 1),
            "g_loss_end": round(gl, 4),
            "d_loss_end": round(float(stats["discriminator_loss"]), 4),
        }
        del state, step

    sp = results["plain"]["steady_ms_per_step"]
    for name, _ in arms[1:]:
        sb = results[name]["steady_ms_per_step"]
        results[f"speedup_{name}_over_plain"] = round(sp / sb, 3)
    log(json.dumps(results))
    out = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "artifacts", "blocked_disc_ab_r5.json")
    # merge into an existing artifact (so n-sweeps can run incrementally)
    merged = {}
    if os.path.exists(out):
        with open(out) as f:
            merged = json.load(f)
        if merged.get("batch") != B or merged.get("steps") != args.steps:
            merged = {}
    merged.update(results)
    with open(out, "w") as f:
        json.dump(merged, f, indent=1)
    log(f"wrote {out}")


if __name__ == "__main__":
    main()
