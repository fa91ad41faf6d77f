"""Disc-input-dtype A/B: bf16 both branches (new) vs fp32 gen-turn disc (old).

The B=64 trace (artifacts/trace_train_b64_r5.json) showed the gen turn's
discriminator calls ran fp32 — `_generator_losses` upcast `recon` for the
recon/mel losses and the disc follows its input dtype — while the disc turn
ran bf16: 177.7 ms/step of f32 disc convs for the same model_flops as the
150.3 ms bf16 set, plus a real-vs-fake dtype cue the discriminator could
learn. encodec.py now keeps BOTH disc branches in the caller's compute
dtype (torch-AMP semantics: autocast would run the disc bf16 on both).

This script proves the swap is safe and fast:

  --mode train (chip or CPU): two from-scratch trainings of the flagship at
      B=16 x 2.56 s, IDENTICAL init + data stream + RNG, on the synthetic
      corpus generator: (a) `bf16_both` = shipped code; (b) `fp32_real` =
      the old behavior, reproduced exactly by upcasting `recon` entering
      `_generator_losses` (making disc_in_dtype=f32 — both disc branches of
      the gen turn fp32, disc turn bf16 as before). Records loss
      trajectories, skip counts, steady ms/step, and held-out fp32-path
      STOI / SI-SNR from each variant's final weights.
      Pass = no skips, overlapping trajectories, held-out quality within
      noise (or better), and the bf16 variant no slower.

Writes artifacts/disc_dtype_ab_r5.json. Usage:
  python scripts/disc_dtype_ab.py [--steps 600] [--batch 16]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

LOG = "/tmp/disc_dtype_ab.log"
OUT = "artifacts/disc_dtype_ab_r5.json"
SR = 16_000


def log(msg):
    line = f"[{time.strftime('%H:%M:%S')}] {msg}"
    print(line, flush=True)
    with open(LOG, "a") as f:
        f.write(line + "\n")


def _batches(n_steps, batch, n_samples, seed=1234):
    """Deterministic stream of synthetic speech-like batches."""
    from scripts.make_synth_corpus import synth_utterance

    rs = np.random.RandomState(seed)
    for _ in range(n_steps):
        x = np.stack([
            synth_utterance(rs, n_samples, SR).astype(np.float32)
            for _ in range(batch)
        ])
        yield x


def run_variant(name, fp32_real, args, val_batch):
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _build_flagship
    from funcodec_tpu.train.step import (
        create_gan_train_state, make_gan_train_step, make_optimizer,
    )
    from funcodec_tpu.utils.quality import si_snr, stoi

    model, disc = _build_flagship(kmeans_init=True)
    if fp32_real:
        # reproduce the pre-fix behavior exactly: an f32 `recon` entering
        # _generator_losses makes disc_in_dtype f32, so both gen-turn disc
        # branches run fp32 (the disc turn was already fed compute-dtype
        # inputs by the shared step, unchanged here)
        inner = model._generator_losses

        def fp32_gl(params, disc_params, discriminator, orig, recon, aux,
                    key, precision=None):
            return inner(params, disc_params, discriminator, orig,
                         recon.astype(jnp.float32), aux, key,
                         precision=precision)

        model._generator_losses = fp32_gl

    params, rvq_state = model.init(jax.random.PRNGKey(0))
    disc_params = disc.init(jax.random.PRNGKey(1))
    opt_g = make_optimizer(lr=3e-4, betas=(0.5, 0.9))
    opt_d = make_optimizer(lr=3e-4, betas=(0.5, 0.9))
    state = create_gan_train_state(params, disc_params, rvq_state, opt_g, opt_d)
    step = jax.jit(make_gan_train_step(
        model, disc, opt_g, opt_d, compute_dtype=jnp.bfloat16,
        shared_forward=True), donate_argnums=(0,))
    rng = jax.random.PRNGKey(7)

    track = ["generator_loss", "generator_adv_loss",
             "generator_feat_match_loss", "generator_recon_loss",
             "generator_multi_spectral_recon_loss", "discriminator_loss"]
    traj = {k: [] for k in track}
    skips = 0
    t_compile = time.perf_counter()
    t_steady = None
    n_samples = int(args.dur * SR)
    for i, x in enumerate(_batches(args.steps, args.batch, n_samples)):
        state, stats = step(state, {"speech": jnp.asarray(x)}, rng)
        if i == 0:
            float(stats["generator_loss"])
            log(f"{name}: compile+step0 {time.perf_counter()-t_compile:.0f}s")
            t_steady = time.perf_counter()
        if (i + 1) % args.log_every == 0:
            s = {k: float(stats[k]) for k in track}
            skips += int(float(stats["generator_nonfinite_skip"]))
            skips += int(float(stats["discriminator_nonfinite_skip"]))
            for k in track:
                traj[k].append(round(s[k], 4))
            log(f"{name} step {i+1}: " +
                " ".join(f"{k.replace('generator_','g_').replace('discriminator_','d_')}={s[k]:.3f}"
                         for k in track))
    float(state.gen_loss_carry)
    steady_ms = ((time.perf_counter() - t_steady) / max(args.steps - 1, 1)) * 1e3

    # held-out quality through the fp32 bit-exact inference path
    out = jax.jit(lambda p, r, s: model.inference(p, r, s, need_recon=True))(
        state.params, state.rvq_state, jnp.asarray(val_batch))
    recon = np.asarray(out["recon_speech"].astype(jnp.float32))
    stois = [stoi(val_batch[i], recon[i], SR) for i in range(len(val_batch))]
    sisnrs = [si_snr(val_batch[i], recon[i]) for i in range(len(val_batch))]
    res = {
        "trajectories_every_%d" % args.log_every: traj,
        "nonfinite_skips": skips,
        "steady_ms_per_step": round(steady_ms, 1),
        "val_stoi_mean": round(float(np.mean(stois)), 4),
        "val_si_snr_mean_db": round(float(np.mean(sisnrs)), 3),
    }
    log(f"{name}: steady {steady_ms:.1f} ms/step, "
        f"val STOI {res['val_stoi_mean']}, SI-SNR {res['val_si_snr_mean_db']} dB, "
        f"skips {skips}")
    return res


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=600)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--dur", type=float, default=2.56)
    ap.add_argument("--log-every", type=int, default=25)
    args = ap.parse_args()

    from scripts.make_synth_corpus import synth_utterance
    rs = np.random.RandomState(777)
    n = int(args.dur * SR)
    val = np.stack([synth_utterance(rs, n, SR).astype(np.float32)
                    for _ in range(8)])

    results = {"config": {"steps": args.steps, "batch": args.batch,
                          "dur_s": args.dur, "compute_dtype": "bfloat16",
                          "model": "flagship EnCodec 16k nq32ds320"}}
    results["bf16_both"] = run_variant("bf16_both", False, args, val)
    results["fp32_real_old"] = run_variant("fp32_real_old", True, args, val)

    a, b = results["bf16_both"], results["fp32_real_old"]
    results["verdict"] = {
        "no_skips": a["nonfinite_skips"] == 0 and b["nonfinite_skips"] == 0,
        "quality_within_noise_or_better":
            a["val_stoi_mean"] >= b["val_stoi_mean"] - 0.02
            and a["val_si_snr_mean_db"] >= b["val_si_snr_mean_db"] - 0.5,
        "bf16_not_slower": a["steady_ms_per_step"] <= b["steady_ms_per_step"] * 1.02,
    }
    os.makedirs("artifacts", exist_ok=True)
    with open(OUT, "w") as f:
        json.dump(results, f, indent=2)
    log("verdict: " + json.dumps(results["verdict"]))
    log(f"wrote {OUT}")


if __name__ == "__main__":
    main()
