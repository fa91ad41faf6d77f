"""Objective reconstruction-quality scoring over wav pairs.

The recipe-stage equivalent of the reference's ViSQOL scoring
(/root/reference/egs/LibriTTS/codec/run.sh:249-295, which shells out to a
docker image unavailable here): given a reference wav.scp and a directory
(or scp) of reconstructions, prints per-utterance and mean LSD /
multi-scale mel distortion / SI-SNR, and writes a `quality.json`.

Usage:
  python -m funcodec_tpu.cli.codec_eval \
      --ref_scp data/test/wav.scp \
      --deg_dir exp/codec/decode  [--deg_scp ...] \
      --output_dir exp/codec/score
"""

from __future__ import annotations

import argparse
import json
import logging
import os
from pathlib import Path

import numpy as np

from funcodec_tpu.data.wav_io import read_2column_text, read_wav, resample
from funcodec_tpu.utils.quality import reconstruction_metrics


def _find_deg(deg_dir: str, key: str):
    for pattern in (f"{key}.wav", f"{key}_rec.wav", f"{key}_fake.wav",
                    f"{key}_gen.wav"):
        p = Path(deg_dir) / pattern
        if p.exists():
            return str(p)
    return None


def main(argv=None):
    parser = argparse.ArgumentParser(description="codec reconstruction scoring")
    parser.add_argument("--ref_scp", type=str, required=True)
    parser.add_argument("--deg_scp", type=str, default=None)
    parser.add_argument("--deg_dir", type=str, default=None)
    parser.add_argument("--output_dir", type=str, required=True)
    parser.add_argument("--sampling_rate", type=int, default=16000)
    args = parser.parse_args(argv)
    assert args.deg_scp or args.deg_dir, "need --deg_scp or --deg_dir"

    logging.basicConfig(level=logging.INFO)
    refs = read_2column_text(args.ref_scp)
    degs = read_2column_text(args.deg_scp) if args.deg_scp else {}

    per_utt = {}
    for key, ref_path in refs.items():
        deg_path = degs.get(key) or (args.deg_dir and _find_deg(args.deg_dir, key))
        if not deg_path:
            logging.warning("no reconstruction for %s; skipped", key)
            continue
        sr_r, ref = read_wav(ref_path)
        sr_d, deg = read_wav(deg_path)
        if ref.ndim == 2:
            ref = ref[:, 0]
        if deg.ndim == 2:
            deg = deg[:, 0]
        if sr_r != args.sampling_rate:
            ref = resample(ref, sr_r, args.sampling_rate)
        if sr_d != args.sampling_rate:
            deg = resample(deg, sr_d, args.sampling_rate)
        per_utt[key] = reconstruction_metrics(ref, deg, sr=args.sampling_rate)
        logging.info(
            "%s: lsd %.3f dB, mel_dist %.4f, si_snr %.2f dB", key,
            per_utt[key]["lsd_db"], per_utt[key]["mel_distortion"],
            per_utt[key]["si_snr_db"],
        )

    if not per_utt:
        raise SystemExit("no scored pairs")
    mean = {
        k: float(np.mean([m[k] for m in per_utt.values()]))
        for k in next(iter(per_utt.values()))
    }
    os.makedirs(args.output_dir, exist_ok=True)
    with open(Path(args.output_dir) / "quality.json", "w") as f:
        json.dump({"mean": mean, "per_utt": per_utt}, f, indent=2)
    print(json.dumps({"n": len(per_utt), **mean}))


if __name__ == "__main__":
    main()
