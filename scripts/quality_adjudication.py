"""Quality-adjudicate the bf16+Pallas production serving path (VERDICT r2 #1).

The headline bench number rides bf16 params + the Pallas RVQ search, which
flips ~9% of tokens vs the fp32 bit-exact path. This script decides whether
that path is quality-neutral: for each n_q in the recipe's bitrate envelope
{1,2,4,8,16,32} (250-16000 bps role, reference README models table), encode
and decode the SAME inputs through both paths with TRAINED weights, score
both reconstructions against the ground-truth input with utils/quality.py
(LSD, mel distortion, SI-SNR, STOI), and report per-n_q deltas plus the
cross-path divergence (token flip rate and LSD between the two recons).

Usage (after a training run has produced a checkpoint):
  python scripts/quality_adjudication.py \
      --ckpt /tmp/longrun/checkpoints/latest.weights \
      [--n-utts 32] [--dur-sec 4.0]

Writes one JSON to /tmp/quality_adjudication.json.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

LOG = "/tmp/quality_adjudication.log"


def log(msg):
    line = f"[{time.strftime('%H:%M:%S')}] {msg}"
    print(line, flush=True)
    with open(LOG, "a") as f:
        f.write(line + "\n")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", required=True,
                    help="weights file ({params, rvq_state} msgpack)")
    ap.add_argument("--n-utts", type=int, default=32)
    ap.add_argument("--dur-sec", type=float, default=4.0)
    ap.add_argument("--sr", type=int, default=16000)
    ap.add_argument("--out", default="/tmp/quality_adjudication.json")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    import funcodec_tpu.quant.rvq as rvq_mod
    from __graft_entry__ import _build_flagship
    from funcodec_tpu.train.checkpoint import load_checkpoint_params
    from funcodec_tpu.utils.quality import reconstruction_metrics
    from scripts.make_synth_corpus import synth_utterance

    model, _ = _build_flagship(kmeans_init=True)
    params_f32, rvq_state = load_checkpoint_params(args.ckpt, model)
    params_f32 = jax.tree_util.tree_map(jnp.asarray, params_f32)
    rvq_state = jax.tree_util.tree_map(jnp.asarray, rvq_state)
    params_bf16 = jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x,
        params_f32,
    )
    log(f"loaded {args.ckpt}; inited codebooks: "
        f"{int(np.asarray(rvq_state.inited).sum())}/{rvq_state.inited.shape[0]}")

    # held-out seed: training corpora use make_synth_corpus seeds 0/1
    rng = np.random.RandomState(1234)
    n = int(args.dur_sec * args.sr)
    speech = np.stack(
        [synth_utterance(rng, n, args.sr) for _ in range(args.n_utts)]
    ).astype(np.float32)
    speech_dev = jnp.asarray(speech)

    # n_q is static per compile: bandwidth -> n_q via bw_per_q = 10*sr/hop
    bw_per_q = 10.0 * args.sr / 320.0  # log2(1024) bits * frame rate = 500 bps

    def make_fn(bit_width):
        @jax.jit
        def run(params, state, x):
            out = model.inference(
                params, state, x, need_recon=True, bit_width=bit_width
            )
            return out["recon_speech"], out["code_indices"][0]

        return run

    results = {"n_utts": args.n_utts, "dur_sec": args.dur_sec, "per_nq": {}}
    for n_q in (1, 2, 4, 8, 16, 32):
        bit_width = int(n_q * bw_per_q)
        rvq_mod.PALLAS_RVQ = False
        recon_f32, tok_f32 = make_fn(bit_width)(params_f32, rvq_state, speech_dev)
        recon_f32 = np.asarray(recon_f32, np.float32)
        tok_f32 = np.asarray(tok_f32)

        rvq_mod.PALLAS_RVQ = True
        recon_bf16, tok_bf16 = make_fn(bit_width)(
            params_bf16, rvq_state, speech_dev.astype(jnp.bfloat16)
        )
        recon_bf16 = np.asarray(recon_bf16, np.float32)
        tok_bf16 = np.asarray(tok_bf16)

        # average metrics over utterances, each path scored against the input
        m_f32, m_bf16 = {}, {}
        for b in range(args.n_utts):
            for store, rec in ((m_f32, recon_f32), (m_bf16, recon_bf16)):
                mm = reconstruction_metrics(speech[b], rec[b], sr=args.sr)
                for k, v in mm.items():
                    store.setdefault(k, []).append(v)
        m_f32 = {k: float(np.mean(v)) for k, v in m_f32.items()}
        m_bf16 = {k: float(np.mean(v)) for k, v in m_bf16.items()}
        # cross-path: how far apart are the two reconstructions themselves
        cross_lsd = float(np.mean([
            reconstruction_metrics(recon_f32[b], recon_bf16[b], sr=args.sr)["lsd_db"]
            for b in range(args.n_utts)
        ]))
        flip = float((tok_f32 != tok_bf16).mean())
        row = {
            "bit_width_bps": bit_width,
            "fp32": m_f32,
            "bf16": m_bf16,
            "delta": {k: m_bf16[k] - m_f32[k] for k in m_f32},
            "token_flip_rate": flip,
            "cross_path_lsd_db": cross_lsd,
        }
        results["per_nq"][str(n_q)] = row
        log(f"n_q={n_q:2d}: fp32 lsd={m_f32['lsd_db']:.3f} stoi={m_f32['stoi']:.4f} "
            f"si_snr={m_f32['si_snr_db']:.2f} | bf16 lsd={m_bf16['lsd_db']:.3f} "
            f"stoi={m_bf16['stoi']:.4f} si_snr={m_bf16['si_snr_db']:.2f} | "
            f"flip={flip:.4f} cross_lsd={cross_lsd:.3f}")

    # verdict: max absolute degradation across the sweep
    worst = {
        k: max(
            (r["delta"][k] if k != "stoi" else -r["delta"][k])
            for r in results["per_nq"].values()
        )
        for k in ("lsd_db", "mel_distortion", "stoi")
    }
    worst["si_snr_db_drop"] = max(
        -r["delta"]["si_snr_db"] for r in results["per_nq"].values()
    )
    results["worst_degradation"] = worst
    with open(args.out, "w") as f:
        json.dump(results, f, indent=2)
    log("DONE " + json.dumps(worst))


if __name__ == "__main__":
    main()
