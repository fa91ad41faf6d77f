"""Average the n best checkpoints into one weights file.

Behavioral reference: funcodec/util_funcs/average_nbest_models.py:18 (n-best
weight averaging driven by the reporter's best-epoch ranking).
"""

from __future__ import annotations

import argparse
import json
import logging
from pathlib import Path


def main(argv=None):
    parser = argparse.ArgumentParser(description="n-best checkpoint averaging")
    parser.add_argument("--exp_dir", type=str, required=True,
                        help="training output dir (reporter.json + *epoch.ckpt)")
    parser.add_argument("--config", type=str, default=None,
                        help="config.yaml (defaults to exp_dir/config.yaml)")
    parser.add_argument("--nbest", type=int, default=10)
    parser.add_argument("--criterion", type=str, default=None,
                        help="phase.key.mode, e.g. valid.loss.min (defaults to reporter order)")
    parser.add_argument("--output", type=str, default=None)
    args = parser.parse_args(argv)

    logging.basicConfig(level=logging.INFO)
    exp = Path(args.exp_dir)
    from funcodec_tpu.tasks.codec import build_codec_model, load_config
    from funcodec_tpu.train.checkpoint import average_checkpoints, save_weights
    from funcodec_tpu.train.reporter import Reporter

    config = load_config(args.config or str(exp / "config.yaml"))
    model, _ = build_codec_model(config)

    reporter = Reporter()
    reporter.load_state_dict(json.loads((exp / "reporter.json").read_text()))
    if args.criterion:
        phase, key, mode = args.criterion.rsplit(".", 2)
    else:
        phase, key, mode = "valid", "generator_multi_spectral_recon_loss", "min"
    order = reporter.sort_epochs(phase, key, mode)[: args.nbest]
    paths = [str(exp / f"{e}epoch.ckpt") for e in order if (exp / f"{e}epoch.ckpt").exists()]
    if not paths:
        raise SystemExit("no epoch checkpoints found for the requested criterion")
    logging.info("averaging %d checkpoints: epochs %s", len(paths), order[: len(paths)])
    params, rvq_state = average_checkpoints(paths, model)
    out = args.output or str(exp / f"{phase}.{key}.ave_{len(paths)}best.ckpt")
    save_weights(out, params, rvq_state)
    logging.info("wrote %s", out)


if __name__ == "__main__":
    main()
