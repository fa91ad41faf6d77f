"""Generate a synthetic speech-like wav corpus for in-image training runs.

No real speech ships in this image, so long-horizon training (VERDICT r2
item 5) and end-to-end CLI benchmarks (item 2) run on a synthetic corpus
with enough structure to be learnable and non-trivial: per-utterance random
mixtures of harmonic tones with vibrato and syllable-rate amplitude
envelopes (vowel-ish), filtered noise bursts (fricative-ish), chirps, and a
noise floor. Deterministic by seed.

Usage:
  python scripts/make_synth_corpus.py --out /tmp/corpus --n-train 512 \
      --n-valid 32 --dur-sec 3.0 [--sr 16000]
Writes {out}/train/wav.scp, {out}/valid/wav.scp and the wavs.
"""

import argparse
import os
from pathlib import Path

import numpy as np


def synth_utterance(rng: np.random.RandomState, n: int, sr: int) -> np.ndarray:
    t = np.arange(n) / sr
    out = np.zeros(n, np.float64)

    # 2-5 "syllables": harmonic stacks with random f0, vibrato, AM envelope
    for _ in range(rng.randint(2, 6)):
        f0 = rng.uniform(80, 300)
        start = rng.randint(0, max(1, n - sr // 4))
        length = rng.randint(sr // 8, sr // 2)
        end = min(n, start + length)
        seg_t = t[start:end]
        vib = 1.0 + 0.02 * np.sin(2 * np.pi * rng.uniform(4, 7) * seg_t)
        phase = np.cumsum(2 * np.pi * f0 * vib / sr)
        seg = np.zeros(end - start)
        for h in range(1, rng.randint(4, 9)):
            seg += rng.uniform(0.2, 1.0) / h * np.sin(h * phase + rng.uniform(0, 6.28))
        env = np.hanning(2 * len(seg))[: len(seg)] if rng.rand() < 0.5 else np.hanning(len(seg))
        out[start:end] += seg * env * rng.uniform(0.2, 0.6)

    # 1-3 noise bursts (high-passed white noise)
    for _ in range(rng.randint(1, 4)):
        start = rng.randint(0, max(1, n - sr // 8))
        length = rng.randint(sr // 40, sr // 8)
        end = min(n, start + length)
        burst = rng.randn(end - start)
        burst = np.diff(burst, prepend=burst[0])  # crude high-pass
        out[start:end] += burst * np.hanning(end - start) * rng.uniform(0.05, 0.2)

    # occasional chirp
    if rng.rand() < 0.5:
        f_a, f_b = rng.uniform(200, 1000), rng.uniform(1000, 4000)
        start = rng.randint(0, max(1, n - sr // 4))
        end = min(n, start + sr // 4)
        seg_t = np.arange(end - start) / sr
        k = (f_b - f_a) / (seg_t[-1] + 1e-9)
        out[start:end] += 0.15 * np.sin(
            2 * np.pi * (f_a * seg_t + 0.5 * k * seg_t**2)
        ) * np.hanning(end - start)

    out += 0.002 * rng.randn(n)  # noise floor
    peak = np.abs(out).max() + 1e-9
    return (out / peak * rng.uniform(0.3, 0.8)).astype(np.float32)


def make_split(out_dir: Path, n_utts: int, dur_sec: float, sr: int, seed: int):
    from funcodec_tpu.data.wav_io import write_wav

    wav_dir = out_dir / "wavs"
    os.makedirs(wav_dir, exist_ok=True)
    rng = np.random.RandomState(seed)
    n = int(dur_sec * sr)
    with open(out_dir / "wav.scp", "w") as scp:
        for i in range(n_utts):
            key = f"synth_{seed}_{i:05d}"
            w = synth_utterance(rng, n, sr)
            write_wav(wav_dir / f"{key}.wav", w, sr)
            scp.write(f"{key} {wav_dir}/{key}.wav\n")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", required=True)
    ap.add_argument("--n-train", type=int, default=512)
    ap.add_argument("--n-valid", type=int, default=32)
    ap.add_argument("--dur-sec", type=float, default=3.0)
    ap.add_argument("--sr", type=int, default=16000)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    out = Path(args.out)
    make_split(out / "train", args.n_train, args.dur_sec, args.sr, args.seed)
    make_split(out / "valid", args.n_valid, args.dur_sec, args.sr, args.seed + 1)
    print(f"corpus at {out}: {args.n_train} train / {args.n_valid} valid, "
          f"{args.dur_sec}s @ {args.sr} Hz")


if __name__ == "__main__":
    import sys

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
    main()
