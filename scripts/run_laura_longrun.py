"""Laura/TTS long-horizon training record (VERDICT r4 missing #2 / next #4).

The codec trainer has a committed 24k-step stability record
(artifacts/longrun_r4_summary.md); this gives the SECOND trainer family its
equivalent: a multi-epoch `cli.text2audio_train` run whose per-epoch quality
is tracked with the native TTS proxies (utils/tts_quality.py — speaker
cosine, MCD, held-out token NLL) that were built in round 4 precisely to
regress such a run. Reference acceptance analogue: a trained-model benchmark
(WER 4.56 / speaker-sim 78.20, egs/LibriTTS/text2speech_laura/README.md).

No real speech ships in this image, so the corpus is synthetic but
LEARNABLE end-to-end: a 32-token pitch "phoneme" vocabulary where token k is
a 0.16 s harmonic tone at 110*2^(k/12) Hz, scaled per speaker (4 speakers
with distinct pitch multipliers + harmonic tilts). Text therefore fully
determines the codec-token sequence up to speaker identity, which the
zero-shot prompt carries — exactly the structure the LauraGPT objective
models (text prefix -> codec continuation conditioned on prompt).

Stages (all through the public CLIs, like the recipe run.sh):
  1 corpus      — wavs + text + token_list + syn/prompt split
  2 tokens      — codec_inference encode (trained codec ckpt; by default the
                  round-5 from-scratch effective-expiry flagship)
  3 train       — text2audio_train, shipped nq2 uni rel_pos topology
                  (87.75M), multi-epoch with per-epoch checkpoints
  4 eval        — for selected epochs: text2audio_inference on held-out
                  texts with zero-shot prompts (through the
                  continuous-batching serving session, --serving_slots) ->
                  per-epoch tts_eval.json
  5 summarize   — reporter curves + per-epoch proxies ->
                  artifacts/laura_longrun_r5.json

Usage:
  python scripts/run_laura_longrun.py --codec_dir /tmp/longrun_r5 \
      [--root /tmp/laura_longrun] [--max_epoch 16] [--eval_epochs 2,4,8,12,16]
"""

import argparse
import json
import os
import shutil
import sys
import time
from pathlib import Path

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import yaml

LOG = "/tmp/laura_longrun.log"


def log(msg):
    line = f"[{time.strftime('%H:%M:%S')}] {msg}"
    print(line, flush=True)
    with open(LOG, "a") as f:
        f.write(line + "\n")


SR = 16000
N_TOK = 32
SEG = 0.16  # s per phoneme token
SPEAKERS = [  # (pitch multiplier, harmonic tilt alpha: amp_h ~ h**-alpha)
    (0.78, 0.8), (1.0, 1.3), (1.31, 1.9), (1.62, 2.6),
]


def _tone(tok: int, spk: int, rng: np.random.RandomState) -> np.ndarray:
    mult, tilt = SPEAKERS[spk]
    f0 = 110.0 * (2.0 ** (tok / 12.0)) * mult
    n = int(SEG * SR)
    t = np.arange(n) / SR
    vib = 1.0 + 0.01 * np.sin(2 * np.pi * 5.0 * t + rng.uniform(0, 6.28))
    phase = np.cumsum(2 * np.pi * f0 * vib / SR)
    seg = np.zeros(n)
    for h in range(1, 6):
        if h * f0 < 0.45 * SR:
            seg += (h ** -tilt) * np.sin(h * phase + rng.uniform(0, 6.28))
    env = np.hanning(n) ** 0.5
    return (seg * env).astype(np.float32)


def _utterance(tokens, spk, rng):
    audio = np.concatenate([_tone(t, spk, rng) for t in tokens])
    audio += rng.randn(audio.size).astype(np.float32) * 0.003
    return 0.3 * audio / max(1e-6, np.abs(audio).max())


def make_corpus(root: Path, n_train: int, n_valid: int, n_syn: int, seed=0):
    from funcodec_tpu.data.wav_io import write_wav

    rng = np.random.RandomState(seed)
    (root / "wavs").mkdir(parents=True, exist_ok=True)
    tokens_txt = "\n".join(f"p{k}" for k in range(N_TOK)) + "\n"
    (root / "tokens.txt").write_text(tokens_txt)

    def emit(split, n, start):
        (root / split).mkdir(exist_ok=True)
        scp, text = [], []
        metas = []
        for i in range(n):
            uid = f"{split}{start + i:05d}"
            toks = rng.randint(0, N_TOK, rng.randint(6, 13))
            spk = rng.randint(0, len(SPEAKERS))
            wav = _utterance(toks, spk, rng)
            p = root / "wavs" / f"{uid}.wav"
            write_wav(p, wav, SR)
            scp.append(f"{uid} {p}")
            text.append(f"{uid} " + " ".join(f"p{t}" for t in toks))
            metas.append((uid, spk, toks))
        (root / split / "wav.scp").write_text("\n".join(scp) + "\n")
        (root / split / "text").write_text("\n".join(text) + "\n")
        return metas

    emit("train", n_train, 0)
    emit("valid", n_valid, 0)
    # synthesis split: new texts, zero-shot prompts drawn from a SEPARATE
    # prompt utterance of the target speaker (continual mode: prompt text +
    # prompt audio prefix the generation)
    syn = root / "syn"
    syn.mkdir(exist_ok=True)
    text, pwav, ptext, spk_map = [], [], [], []
    for i in range(n_syn):
        uid = f"syn{i:05d}"
        spk = i % len(SPEAKERS)
        toks = rng.randint(0, N_TOK, rng.randint(6, 11))
        ptoks = rng.randint(0, N_TOK, 6)
        prompt = _utterance(ptoks, spk, rng)
        pp = root / "wavs" / f"{uid}_prompt.wav"
        write_wav(pp, prompt, SR)
        text.append(f"{uid} " + " ".join(f"p{t}" for t in toks))
        pwav.append(f"{uid} {pp}")
        ptext.append(f"{uid} " + " ".join(f"p{t}" for t in ptoks))
        spk_map.append(f"{uid} {spk}")
    (syn / "text").write_text("\n".join(text) + "\n")
    (syn / "prompt_wav.scp").write_text("\n".join(pwav) + "\n")
    (syn / "prompt_text").write_text("\n".join(ptext) + "\n")
    (syn / "spk").write_text("\n".join(spk_map) + "\n")
    log(f"corpus: {n_train} train / {n_valid} valid / {n_syn} syn utts "
        f"({N_TOK}-token pitch vocabulary, {len(SPEAKERS)} speakers)")


def extract_tokens(root: Path, codec_dir: Path, exp: Path):
    from funcodec_tpu.cli.codec_inference import inference_pipeline

    ckpt = codec_dir / "latest.ckpt"
    for split in ("train", "valid"):
        out = exp / f"tokens_{split}"
        if (out / "indices.scp").exists():
            log(f"tokens_{split}: exists, skipping")
            continue
        t0 = time.time()
        inference_pipeline(
            output_dir=str(out),
            config_file=str(codec_dir / "config.yaml"),
            model_file=str(ckpt),
            data_path_and_name_and_type=[
                (str(root / split / "wav.scp"), "speech", "sound")
            ],
            batch_size=16, bit_width=None, run_mod="encode",
            indices_save_type="ark",
        )
        log(f"tokens_{split}: {time.time()-t0:.0f}s")


def train(root: Path, exp: Path, codec_dir: Path, max_epoch: int,
          train_dtype: str):
    from funcodec_tpu.cli import text2audio_train

    cfg = yaml.safe_load(
        open("egs/LibriTTS/text2speech_laura/conf/"
             "text2audio_codec_lm_nq2_uni_rel_pos.yaml")
    )
    # corpus-scale schedule: the recipe's batch_bins 10240 packs this
    # corpus's ~2 s utterances into ~6 batches/epoch and its 10k-step warmup
    # would never finish warming; bins 2560 gives ~25 steps/epoch at the
    # same topology. Everything else is the shipped config.
    cfg["max_epoch"] = max_epoch
    cfg["batch_bins"] = 2560
    cfg["scheduler_conf"] = {"warmup_steps": 100}
    cfg["keep_nbest_models"] = max_epoch
    cfg["log_interval"] = 20
    conf = exp / "train_conf.yaml"
    exp.mkdir(parents=True, exist_ok=True)
    yaml.safe_dump(cfg, open(conf, "w"))
    text2audio_train.main([
        "--config", str(conf), "--output_dir", str(exp),
        "--train_text", str(root / "train/text"),
        "--train_codec", str(exp / "tokens_train/indices.scp"),
        "--valid_text", str(root / "valid/text"),
        "--valid_codec", str(exp / "tokens_valid/indices.scp"),
        "--token_list", str(root / "tokens.txt"), "--token_type", "word",
        "--codec_init_param", str(codec_dir / "latest.ckpt"),
        "--codec_config", str(codec_dir / "config.yaml"),
        "--train_dtype", train_dtype, "--resume", "true",
    ])


def eval_epoch(root: Path, exp: Path, codec_dir: Path, epoch: int,
               serving_slots: int):
    from funcodec_tpu.cli import text2audio_inference

    ckpt = exp / f"{epoch}epoch.ckpt"
    out = exp / f"eval_ep{epoch}"
    if (out / "tts_eval.json").exists():
        log(f"eval ep{epoch}: exists, skipping")
    else:
        t0 = time.time()
        text2audio_inference.main([
            "--output_dir", str(out),
            "--config_file", str(exp / "train_conf.yaml"),
            "--model_file", str(ckpt),
            "--codec_config_file", str(codec_dir / "config.yaml"),
            "--codec_model_file", str(codec_dir / "latest.ckpt"),
            "--text_scp", str(root / "syn/text"),
            "--token_list", str(root / "tokens.txt"),
            "--token_type", "word",
            "--prompt_wav_scp", str(root / "syn/prompt_wav.scp"),
            "--prompt_text_scp", str(root / "syn/prompt_text"),
            "--sampling", "25",
            "--serving_slots", str(serving_slots),
        ])
        log(f"eval ep{epoch}: {time.time()-t0:.0f}s")
    return json.load(open(out / "tts_eval.json"))["mean"]


def summarize(exp: Path, eval_means: dict, out_json: Path):
    rep = json.load(open(exp / "reporter.json"))
    epochs = sorted(int(e) for e in rep["stats"])
    curves = {}
    for e in epochs:
        st = rep["stats"][str(e)]
        row = {}
        for split in ("train", "valid"):
            for k, v in st.get(split, {}).items():
                if isinstance(v, (int, float)):
                    row[f"{split}_{k}"] = round(float(v), 5)
        curves[e] = row
    summary = {
        "config": "text2audio_codec_lm_nq2_uni_rel_pos (shipped 87.75M)",
        "per_epoch_reporter": curves,
        "per_epoch_tts_eval_mean": eval_means,
    }
    out_json.parent.mkdir(exist_ok=True)
    with open(out_json, "w") as f:
        json.dump(summary, f, indent=2)
    log(f"summary -> {out_json}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--codec_dir", default="/tmp/longrun_r5",
                    help="trained codec run dir (config.yaml + latest.ckpt)")
    ap.add_argument("--root", default="/tmp/laura_corpus")
    ap.add_argument("--exp", default="/tmp/laura_longrun")
    ap.add_argument("--n_train", type=int, default=1024)
    ap.add_argument("--n_valid", type=int, default=64)
    ap.add_argument("--n_syn", type=int, default=16)
    ap.add_argument("--max_epoch", type=int, default=16)
    ap.add_argument("--eval_epochs", default="2,4,8,12,16")
    ap.add_argument("--serving_slots", type=int, default=8)
    ap.add_argument("--train_dtype", default="bfloat16")
    ap.add_argument("--out", default="artifacts/laura_longrun_r5.json")
    args = ap.parse_args()

    root, exp, codec_dir = Path(args.root), Path(args.exp), Path(args.codec_dir)
    if not (root / "syn/text").exists():
        make_corpus(root, args.n_train, args.n_valid, args.n_syn)
    extract_tokens(root, codec_dir, exp)
    final_ckpt = exp / f"{args.max_epoch}epoch.ckpt"
    if not final_ckpt.exists():
        train(root, exp, codec_dir, args.max_epoch, args.train_dtype)
    eval_means = {}
    for e in [int(x) for x in args.eval_epochs.split(",")]:
        eval_means[e] = eval_epoch(root, exp, codec_dir, e,
                                   args.serving_slots)
        log(f"ep{e} proxies: "
            + json.dumps({k: round(v, 4) for k, v in eval_means[e].items()
                          if "speaker" in k or "mcd" in k or "stoi" in k}))
    summarize(exp, eval_means, Path(args.out))


if __name__ == "__main__":
    main()
