"""Extract T5 text embeddings for text2music training (jamendo recipe).

Behavioral reference: egs/jamendo/text2music_laura/scripts/extract_t5_emb.py —
tag text -> T5 encoder hidden states, written as kaldi ark/scp, consumed by
the Laura model with text_encoder=None (embedding inputs, input_size=1536 for
t5-large).

Requires local T5 weights (--t5_model pointing at a downloaded checkpoint
directory); this environment has no network egress.
"""

from __future__ import annotations

import argparse
import logging

import numpy as np

from funcodec_tpu.data.kaldi_ark import ArkWriter
from funcodec_tpu.data.wav_io import read_2column_text


def main(argv=None):
    parser = argparse.ArgumentParser(description="T5 text embedding extraction")
    parser.add_argument("--text_scp", type=str, required=True)
    parser.add_argument("--output", type=str, required=True,
                        help="output basename; writes {output}.ark/.scp")
    parser.add_argument("--t5_model", type=str, default="t5-large",
                        help="HF model name or local checkpoint directory")
    parser.add_argument("--max_length", type=int, default=128)
    args = parser.parse_args(argv)

    logging.basicConfig(level=logging.INFO)
    try:
        import torch
        from transformers import AutoTokenizer, T5EncoderModel
    except ImportError as e:
        raise SystemExit(f"transformers/torch unavailable: {e}")

    try:
        tokenizer = AutoTokenizer.from_pretrained(args.t5_model)
        model = T5EncoderModel.from_pretrained(args.t5_model).eval()
    except Exception as e:
        raise SystemExit(
            f"could not load T5 weights from {args.t5_model!r}: {e}\n"
            "Download the checkpoint on a machine with network access and "
            "pass the local directory via --t5_model."
        )

    texts = read_2column_text(args.text_scp)
    with ArkWriter(args.output + ".ark", args.output + ".scp") as writer:
        with torch.no_grad():
            for key, text in texts.items():
                ids = tokenizer(
                    text, return_tensors="pt", truncation=True,
                    max_length=args.max_length,
                )
                h = model(**ids).last_hidden_state[0]  # (L, D)
                writer(key, h.cpu().numpy().astype(np.float32))
    logging.info("wrote %d embeddings to %s.ark", len(texts), args.output)


if __name__ == "__main__":
    main()
