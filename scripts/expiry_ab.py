"""Dead-code expiry A/B: expiry_mode="effective" vs "reference" (VERDICT r3 #2).

Round 3's 20k-step long-run (expiry_mode="reference" — faithfully reproduced
and provably inert, quant/rvq.py:21-27 vs reference ddp_core_vq.py:161-178
clobbered by :228-237) ended with ~76% of the 32,768 codebook entries dead
and usage perplexity falling. This script runs the A/B the repo was built
for: branch TWO continuation runs off the SAME long-run checkpoint — one per
expiry mode — for N extra epochs through the real cli.codec_train path, then
compare:

  1. codebook health trajectories (dead codes, usage perplexity per epoch),
  2. end-of-branch valid quality (LSD/mel/SI-SNR/STOI/NSIM on dumped wavs),
  3. per-n_q reconstruction quality of each branch's final weights on a
     held-out synthetic set (fp32 bit-exact inference path).

Branches run SEQUENTIALLY (one chip; concurrent benches are garbage —
NOTES_ROUND3.md:20-23). Writes artifacts/expiry_ab_r4.json.

Usage:
  python scripts/expiry_ab.py --base /tmp/longrun --corpus /tmp/corpus \
      [--extra-epochs 3] [--out artifacts/expiry_ab_r4.json]
"""

import argparse
import json
import os
import re
import shutil
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import yaml

LOG = "/tmp/expiry_ab.log"


def log(msg):
    line = f"[{time.strftime('%H:%M:%S')}] {msg}"
    print(line, flush=True)
    with open(LOG, "a") as f:
        f.write(line + "\n")


def run_branch(mode: str, base: str, corpus: str, extra_epochs: int) -> str:
    out = f"/tmp/expiry_ab/{mode}"
    if os.path.exists(out):
        shutil.rmtree(out)
    os.makedirs(out)
    shutil.copy(f"{base}/checkpoint.ckpt", f"{out}/checkpoint.ckpt")
    # the trainer's resume() reads reporter.json from the OUTPUT dir for
    # start_epoch (gan_trainer.py:436-441); without it the branch would
    # restart at epoch 1 and train max_epoch full epochs instead of
    # extra_epochs continuation epochs
    shutil.copy(f"{base}/reporter.json", f"{out}/reporter.json")

    cfg = yaml.safe_load(open(f"{base}/config.yaml"))
    start_epoch = cfg["max_epoch"]
    cfg["max_epoch"] = start_epoch + extra_epochs
    cfg.setdefault("quantizer_conf", {})["expiry_mode"] = mode
    conf_path = f"{out}/config_ab.yaml"
    yaml.safe_dump(cfg, open(conf_path, "w"))

    cmd = [
        sys.executable, "-m", "funcodec_tpu.cli.codec_train",
        "--config", conf_path,
        "--output_dir", out,
        "--train_wav_scp", f"{corpus}/train/wav.scp",
        "--valid_wav_scp", f"{corpus}/valid/wav.scp",
        "--train_dtype", "bfloat16",
        "--resume", "true",
    ]
    log(f"branch {mode}: {extra_epochs} epochs from epoch {start_epoch} -> {out}")
    t0 = time.time()
    with open(f"{out}/train.log", "w") as f:
        subprocess.run(cmd, stdout=f, stderr=subprocess.STDOUT, check=True,
                       cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    log(f"branch {mode}: done in {time.time() - t0:.0f}s")
    return out


def step_trajectory(out: str):
    """(step-in-branch, dead, perp) points from the branch's train log."""
    pts = []
    pat = re.compile(
        r"(\d+)epoch:train:(\d+)batch.*rvq_dead_codes=([\d.e+]+).*"
        r"rvq_usage_perplexity=([\d.e+-]+)"
    )
    for line in open(f"{out}/train.log"):
        m = pat.search(line)
        if m:
            ep, b, dead, perp = int(m[1]), int(m[2]), float(m[3]), float(m[4])
            pts.append({"epoch": ep, "batch": b, "dead": dead, "perp": perp})
    return pts


def epoch_stats(out: str, start_epoch: int):
    rep = json.load(open(f"{out}/reporter.json"))["stats"]
    rows = {}
    for ep, phases in rep.items():
        if not ep.isdigit() or int(ep) <= start_epoch:
            continue
        rows[ep] = {
            "train_dead": phases.get("train", {}).get("rvq_dead_codes"),
            "train_perp": phases.get("train", {}).get("rvq_usage_perplexity"),
            "train_gen_loss": phases.get("train", {}).get("generator_loss"),
            "train_mspec": phases.get("train", {}).get(
                "generator_multi_spectral_recon_loss"),
            "valid_lsd_db": phases.get("valid", {}).get("lsd_db"),
            "valid_stoi": phases.get("valid", {}).get("stoi"),
            "valid_mel": phases.get("valid", {}).get("mel_distortion"),
            "valid_nsim": phases.get("valid", {}).get("nsim"),
        }
    return rows


def per_nq_quality(ckpt: str, n_utts: int, dur_sec: float, sr: int):
    """fp32 bit-exact per-n_q reconstruction metrics on held-out synth."""
    import jax
    import jax.numpy as jnp

    from funcodec_tpu.tasks.codec import build_codec_model
    from funcodec_tpu.train.checkpoint import load_checkpoint_params
    from funcodec_tpu.utils.quality import reconstruction_metrics
    from scripts.make_synth_corpus import synth_utterance

    cfg = yaml.safe_load(open(os.path.join(os.path.dirname(ckpt), "config_ab.yaml")))
    model, _ = build_codec_model(cfg)
    params, rvq_state = load_checkpoint_params(ckpt, model)
    params = jax.tree_util.tree_map(jnp.asarray, params)
    rvq_state = jax.tree_util.tree_map(jnp.asarray, rvq_state)

    rng = np.random.RandomState(1234)  # held out: corpora use seeds 0/1
    n = int(dur_sec * sr)
    speech = np.stack(
        [synth_utterance(rng, n, sr) for _ in range(n_utts)]
    ).astype(np.float32)
    x = jnp.asarray(speech)

    qc = cfg["quantizer_conf"]
    bw_per_q = (sr / qc.get("encoder_hop_length", 320)) * np.log2(
        qc.get("codebook_size", 1024))

    def make_fn(bit_width):
        @jax.jit
        def run(params, state, xx):
            out = model.inference(params, state, xx, need_recon=True,
                                  bit_width=bit_width)
            return out["recon_speech"]

        return run

    rows = {}
    for n_q in (1, 4, 8, 16, 32):
        recon = np.asarray(
            make_fn(int(n_q * bw_per_q))(params, rvq_state, x), np.float32)
        acc = {}
        for b in range(n_utts):
            for k, v in reconstruction_metrics(speech[b], recon[b], sr=sr).items():
                acc.setdefault(k, []).append(v)
        rows[str(n_q)] = {k: float(np.mean(v)) for k, v in acc.items()}
        log(f"  n_q={n_q:2d}: " + " ".join(
            f"{k}={rows[str(n_q)][k]:.4f}" for k in ("lsd_db", "stoi", "si_snr_db")))
    return rows


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--base", default="/tmp/longrun")
    ap.add_argument("--corpus", default="/tmp/corpus")
    ap.add_argument("--extra-epochs", type=int, default=3)
    ap.add_argument("--n-utts", type=int, default=16)
    ap.add_argument("--dur-sec", type=float, default=4.0)
    ap.add_argument("--sr", type=int, default=16000)
    ap.add_argument("--out", default="artifacts/expiry_ab_r4.json")
    ap.add_argument("--skip-train", action="store_true",
                    help="branches already ran; just re-score and summarize")
    args = ap.parse_args()

    base_cfg = yaml.safe_load(open(f"{args.base}/config.yaml"))
    start_epoch = base_cfg["max_epoch"]
    results = {
        "base": args.base,
        "start_epoch": start_epoch,
        "extra_epochs": args.extra_epochs,
        "steps_per_epoch": base_cfg.get("num_iters_per_epoch"),
        "codebook_entries": base_cfg["quantizer_conf"]["codebook_size"]
        * base_cfg["quantizer_conf"]["num_quantizers"],
        "branches": {},
    }
    for mode in ("reference", "effective"):
        out = (f"/tmp/expiry_ab/{mode}" if args.skip_train
               else run_branch(mode, args.base, args.corpus, args.extra_epochs))
        traj = step_trajectory(out)
        log(f"branch {mode}: scoring per-n_q quality")
        results["branches"][mode] = {
            "dir": out,
            "epoch_stats": epoch_stats(out, start_epoch),
            "step_trajectory": traj[:: max(1, len(traj) // 60)],
            "final_dead": traj[-1]["dead"] if traj else None,
            "final_perp": traj[-1]["perp"] if traj else None,
            "per_nq": per_nq_quality(
                f"{out}/latest.ckpt", args.n_utts, args.dur_sec, args.sr),
        }

    ref, eff = (results["branches"][m] for m in ("reference", "effective"))
    results["summary"] = {
        "dead_codes": {"reference": ref["final_dead"], "effective": eff["final_dead"]},
        "usage_perplexity": {"reference": ref["final_perp"],
                             "effective": eff["final_perp"]},
        "per_nq_lsd_delta_effective_minus_reference": {
            q: eff["per_nq"][q]["lsd_db"] - ref["per_nq"][q]["lsd_db"]
            for q in eff["per_nq"]
        },
        "per_nq_stoi_delta_effective_minus_reference": {
            q: eff["per_nq"][q]["stoi"] - ref["per_nq"][q]["stoi"]
            for q in eff["per_nq"]
        },
    }
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(results, f, indent=2)
    log("DONE " + json.dumps(results["summary"]))


if __name__ == "__main__":
    main()
