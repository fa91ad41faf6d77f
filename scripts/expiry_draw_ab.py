"""Expiry-draw A/B (VERDICT r4 weak #5): shared-permutation vs per-layer draw.

Round 4 made `expiry_mode: effective` the recipe default on a measured
quality win (artifacts/expiry_ab_r4.json), but its fresh-sample indices were
drawn with one `jax.random.permutation` PER scan layer — 32 vmapped sort
kernels whose compile alone cost ~17 min on the axon remote compiler
(NOTES_ROUND4.md ops note) vs ~4 min for the whole reference-mode step.
quant/rvq.py now draws ONE shared permutation + per-layer random offsets
(each layer still gets `bins` distinct, marginally-uniform rows). This
script proves the swap is free:

  --mode revival  (CPU ok): train an RVQ on clustered synthetic data that
      strands most codes dead, under three settings — effective/shared draw,
      effective/per-layer draw (rvq.EXPIRY_PER_LAYER_DRAW hook), and the
      inert reference mode — across SEVERAL seeds, and record dead-code and
      usage-perplexity trajectories plus held-out quantization error.
      Pass = the shared draw's revival matches the per-layer draw's and its
      mean held-out MSE is no worse (one-sided within seed noise), and both
      beat reference mode.
  --mode compile  (chip): time the FIRST compile of the flagship bf16
      shared-forward GAN step at B=16 for expiry_mode reference vs effective
      (new draw). Pass = effective within ~1.5x of reference.

Writes artifacts/expiry_draw_ab_r5.json (merge-update across modes).
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

LOG = "/tmp/expiry_draw_ab.log"
OUT = "artifacts/expiry_draw_ab_r5.json"


def log(msg):
    line = f"[{time.strftime('%H:%M:%S')}] {msg}"
    print(line, flush=True)
    with open(LOG, "a") as f:
        f.write(line + "\n")


def _merge_write(out_path, update):
    merged = {}
    if os.path.exists(out_path):
        try:
            merged = json.load(open(out_path))
        except Exception:
            merged = {}
    merged.update(update)
    with open(out_path, "w") as f:
        json.dump(merged, f, indent=2)


def run_revival(out_path):
    import jax
    import jax.numpy as jnp
    from funcodec_tpu.quant import rvq as rvq_mod
    from funcodec_tpu.quant.rvq import (
        RVQConfig, init_rvq_state, rvq_train_forward, rvq_decode, rvq_encode,
    )

    bins, n_q, dim = 64, 8, 32
    B, T = 8, 512  # N = 4096 flattened vectors per step
    steps = 300
    rs = np.random.RandomState(0)
    # 4 tight Gaussian clusters: uniform-random-init codebooks leave most of
    # the 64 codes per layer unused -> they go dead and stay dead unless
    # expiry revives them
    centers = rs.randn(4, dim).astype(np.float32) * 3.0
    def draw_batch(seed):
        r = np.random.RandomState(seed)
        which = r.randint(0, 4, (B * T,))
        x = centers[which] + r.randn(B * T, dim).astype(np.float32) * 0.1
        return jnp.asarray(x.reshape(B, T, dim))

    held = draw_batch(10_000)

    n_seeds = 3

    def one_run(tag, expiry_mode, per_layer_draw, seed):
        rvq_mod.EXPIRY_PER_LAYER_DRAW = per_layer_draw
        cfg = RVQConfig(
            dim=dim, codebook_size=bins, num_quantizers=n_q,
            kmeans_init=False, expiry_mode=expiry_mode,
            threshold_ema_dead_code=2.0,
        )
        state = init_rvq_state(cfg, key=jax.random.PRNGKey(1 + seed))
        step = jax.jit(
            lambda s, x, k: rvq_train_forward(cfg, s, x, k)[4]
        )
        dead_traj, perp_traj = [], []
        for i in range(steps):
            state = step(
                state, draw_batch(1000 * seed + i),
                jax.random.PRNGKey(100 + 1000 * seed + i),
            )
            if (i + 1) % 20 == 0:
                cs = np.asarray(state.cluster_size)
                dead = int((cs < cfg.threshold_ema_dead_code).sum())
                p = cs / np.maximum(cs.sum(axis=1, keepdims=True), 1e-9)
                perp = float(
                    np.exp(-(p * np.log(np.maximum(p, 1e-12))).sum(axis=1))
                    .mean() / bins
                )
                dead_traj.append(dead)
                perp_traj.append(round(perp, 4))
        codes = rvq_encode(cfg, state, held)
        q = rvq_decode(cfg, state, codes)
        mse = float(jnp.mean((held - q) ** 2))
        rvq_mod.EXPIRY_PER_LAYER_DRAW = False
        total = bins * n_q
        log(f"{tag} seed{seed}: dead {dead_traj[0]}->{dead_traj[-1]}/{total}, "
            f"norm-perp {perp_traj[0]}->{perp_traj[-1]}, held MSE {mse:.5f}")
        return {
            "dead_codes_every20": dead_traj,
            "norm_perplexity_every20": perp_traj,
            "dead_final": dead_traj[-1],
            "total_codes": total,
            "heldout_mse": mse,
        }

    def seeds_run(tag, expiry_mode, per_layer_draw):
        runs = [
            one_run(tag, expiry_mode, per_layer_draw, s)
            for s in range(n_seeds)
        ]
        mses = [r["heldout_mse"] for r in runs]
        agg = dict(runs[0])  # seed-0 trajectories kept for the record
        agg["heldout_mse_per_seed"] = mses
        agg["heldout_mse_mean"] = float(np.mean(mses))
        agg["heldout_mse_std"] = float(np.std(mses))
        agg["dead_final_per_seed"] = [r["dead_final"] for r in runs]
        agg["dead_final"] = int(max(r["dead_final"] for r in runs))
        agg["heldout_mse"] = agg["heldout_mse_mean"]
        return agg

    res = {
        "revival": {
            "setup": {
                "bins": bins, "n_q": n_q, "dim": dim, "steps": steps,
                "vectors_per_step": B * T, "clusters": 4, "seeds": n_seeds,
                "platform": str(jax.devices()[0].platform),
            },
            "effective_shared_draw": seeds_run(
                "effective/shared", "effective", False
            ),
            "effective_per_layer_draw": seeds_run(
                "effective/per-layer (round-4)", "effective", True
            ),
            "reference_inert": seeds_run(
                "reference (inert)", "reference", False
            ),
        }
    }
    rev = res["revival"]
    a = rev["effective_shared_draw"]
    b = rev["effective_per_layer_draw"]
    c = rev["reference_inert"]
    # one-sided: the shared draw must revive like the per-layer draw and be
    # no WORSE on held-out error beyond seed noise (being better is fine)
    noise = max(a["heldout_mse_std"], b["heldout_mse_std"], 1e-12)
    rev["verdict"] = {
        "shared_revives_like_per_layer": bool(
            abs(a["dead_final"] - b["dead_final"]) <= 0.05 * a["total_codes"]
        ),
        "shared_mse_not_worse": bool(
            a["heldout_mse_mean"] <= b["heldout_mse_mean"] + 2 * noise
        ),
        "both_beat_reference": bool(
            a["dead_final"] < 0.5 * c["dead_final"]
            and b["dead_final"] < 0.5 * c["dead_final"]
        ),
    }
    log(f"verdict: {rev['verdict']}")
    _merge_write(out_path, res)


def run_compile(out_path):
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _build_flagship
    from funcodec_tpu.train.step import (
        create_gan_train_state, make_gan_train_step, make_optimizer,
    )

    log(f"devices: {jax.devices()}")
    B, T = 16, 40960  # recipe operating point
    res = {}
    for mode in ("reference", "effective"):
        model, disc = _build_flagship(kmeans_init=True, expiry_mode=mode)
        params, rvq_state = model.init(jax.random.PRNGKey(0))
        disc_params = disc.init(jax.random.PRNGKey(1))
        rvq_state = rvq_state.replace(
            inited=jnp.ones_like(rvq_state.inited),
            embed=jnp.asarray(
                np.random.RandomState(2).randn(*rvq_state.embed.shape),
                jnp.float32,
            ),
            cluster_size=jnp.ones_like(rvq_state.cluster_size),
        )
        opt_g = make_optimizer(lr=3e-4, betas=(0.5, 0.9))
        opt_d = make_optimizer(lr=3e-4, betas=(0.5, 0.9))
        state = create_gan_train_state(params, disc_params, rvq_state, opt_g, opt_d)
        step = jax.jit(
            make_gan_train_step(
                model, disc, opt_g, opt_d, compute_dtype=jnp.bfloat16,
                shared_forward=True,
            )
        )
        speech = jnp.asarray(
            np.random.RandomState(0).randn(B, T).astype(np.float32) * 0.1
        )
        rng = jax.random.PRNGKey(7)
        t0 = time.perf_counter()
        state, stats = step(state, {"speech": speech}, rng)
        float(stats["generator_loss"])
        compile_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        for _ in range(3):
            state, stats = step(state, {"speech": speech}, rng)
        float(stats["generator_loss"])
        step_s = (time.perf_counter() - t0) / 3
        log(f"expiry_mode={mode}: first step (compile) {compile_s:.0f}s, "
            f"steady {step_s*1e3:.0f} ms/step")
        res[f"{mode}_compile_s"] = compile_s
        res[f"{mode}_step_ms"] = step_s * 1e3
    res["effective_over_reference_compile"] = (
        res["effective_compile_s"] / res["reference_compile_s"]
    )
    res["round4_per_layer_draw_compile_s"] = 17 * 60  # NOTES_ROUND4 ops note
    log(f"compile ratio effective/reference = "
        f"{res['effective_over_reference_compile']:.2f} "
        f"(round-4 per-layer draw: ~{17*60}s)")
    _merge_write(out_path, {"compile_bf16_shared_b16": res})


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", choices=["revival", "compile"], required=True)
    ap.add_argument("--out", default=OUT)
    args = ap.parse_args()
    if args.mode == "revival":
        run_revival(args.out)
    else:
        run_compile(args.out)


if __name__ == "__main__":
    main()
