"""Codec training CLI: config.yaml + wav.scp -> trained checkpoints.

Behavioral reference: funcodec/bin/codec_train.py:9-48 +
GANSpeechCodecTask.main_worker (tasks/abs_task.py:1152-1442): build model
from config, dump the resolved config.yaml (round-trip contract), train.

The reference forks one process per GPU; here one process drives all local
TPU devices through a data-parallel Mesh.
"""

from __future__ import annotations

import argparse
import logging
import os
from pathlib import Path

import numpy as np

import jax

from funcodec_tpu.data.dataset import CodecDataset
from funcodec_tpu.data.preprocessor import CodecPreprocessor
from funcodec_tpu.tasks.codec import build_codec_model, load_config
from funcodec_tpu.train.gan_trainer import GANCodecTrainer, TrainerOptions


def build_datasets(args, config):
    preprocess = None
    if config.get("use_preprocessor", True):
        preprocess = CodecPreprocessor(
            train=True,
            speech_max_length=config.get("speech_max_length", -1),
            rir_scp=config.get("rir_scp"),
            noise_scp=config.get("noise_scp"),
        )
    valid_preprocess = CodecPreprocessor(
        train=False,
        speech_max_length=config.get("valid_max_length", config.get("speech_max_length", -1)),
    )
    train = CodecDataset(
        [(args.train_wav_scp, "speech", "sound")], preprocess=preprocess
    )
    valid = CodecDataset(
        [(args.valid_wav_scp, "speech", "sound")], preprocess=valid_preprocess
    )
    return train, valid


def make_mesh(batch_size: int):
    """Data mesh over the largest device count that divides the batch."""
    devices = jax.devices()
    n = len(devices)
    while n > 1 and batch_size % n != 0:
        n -= 1
    if n <= 1:
        return None
    from jax.sharding import Mesh

    return Mesh(np.array(devices[:n]), axis_names=("data",))


def main(argv=None):
    parser = argparse.ArgumentParser(description="TPU codec training")
    parser.add_argument("--config", type=str, required=True)
    parser.add_argument("--output_dir", type=str, required=True)
    parser.add_argument("--train_wav_scp", type=str, required=True)
    parser.add_argument("--train_shape_file", type=str, default=None,
                        help="precomputed 'uttid length' file for sorted/length "
                             "batching (abs_task.py:710, speech_shape)")
    parser.add_argument("--valid_wav_scp", type=str, required=True)
    parser.add_argument("--resume", type=lambda s: s.lower() == "true", default=True)
    parser.add_argument("--seed", type=int, default=None)
    parser.add_argument("--max_epoch", type=int, default=None)
    parser.add_argument("--num_iters_per_epoch", type=int, default=None)
    parser.add_argument("--batch_size", type=int, default=None)
    parser.add_argument("--print_config", action="store_true",
                        help="dump the resolved config yaml and exit (abs_task.py:1108)")
    parser.add_argument("--dry_run", action="store_true",
                        help="build everything, run zero steps (abs_task.py:1299)")
    parser.add_argument("--stat_flops", action="store_true",
                        help="print the per-layer FLOPs/params tree of the "
                             "serving path (gan_speech_codec.py:345-355)")
    parser.add_argument("--profile_dir", type=str, default=None,
                        help="capture a jax.profiler trace of a few compiled "
                             "steps into this directory (utils/profiling.py)")
    parser.add_argument("--train_dtype", type=str, default=None,
                        choices=["float32", "bfloat16", "bf16"],
                        help="bfloat16 = mixed-precision training: fp32 master "
                             "params, bf16 forward/backward (train/step.py)")
    args = parser.parse_args(argv)

    logging.basicConfig(
        level=logging.INFO,
        format="%(asctime)s (%(module)s:%(lineno)d) %(levelname)s: %(message)s",
    )

    config = load_config(args.config)
    for field in ("seed", "max_epoch", "num_iters_per_epoch", "batch_size"):
        v = getattr(args, field)
        if v is not None:
            config[field] = v

    if args.print_config:
        import sys

        import yaml

        yaml.safe_dump(config, sys.stdout)
        return

    model, discriminator = build_codec_model(config)

    options = TrainerOptions(
        output_dir=args.output_dir,
        max_epoch=config.get("max_epoch", 60),
        num_iters_per_epoch=config.get("num_iters_per_epoch"),
        batch_size=config.get("batch_size", 16),
        drop_last=config.get("drop_last", True),
        seed=config.get("seed", 0),
        log_interval=config.get("log_interval", 50),
        keep_nbest_models=config.get("keep_nbest_models", 60),
        best_model_criterion=tuple(config.get(
            "best_model_criterion",
            [["valid", "generator_multi_spectral_recon_loss", "min"]],
        )[0]),
        patience=config.get("patience"),
        resume=args.resume,
        max_update=config.get("max_update"),
        num_workers=config.get("num_workers", 8),
        gen_train_interval=config.get("gen_train_interval", 1),
        disc_train_interval=config.get("disc_train_interval", 1),
        optim=config.get("optim", "adam"),
        optim2=config.get("optim2", config.get("optim", "adam")),
        optim_conf=config.get("optim_conf", {}),
        optim2_conf=config.get("optim2_conf", {}),
        grad_clip=config.get("grad_clip", -1),
        disc_grad_clip=config.get("disc_grad_clip", -1),
        sampling_rate=config.get("sampling_rate", 16000),
        accum_grad=config.get("accum_grad", 1),
        grad_noise=config.get("grad_noise", False),
        batch_type=config.get("batch_type", "unsorted"),
        batch_bins=config.get("batch_bins", 4_000_000),
        shared_forward=config.get("shared_forward", True),
        num_valid_dump_wavs=config.get("num_valid_dump_wavs", 5),
        train_shape_file=args.train_shape_file or config.get("train_shape_file"),
        profile_dir=args.profile_dir,
        # "bfloat16" = mixed-precision training (fp32 masters, bf16 compute);
        # the reference's train_dtype/AMP knob (abs_task.py --train_dtype)
        train_dtype=args.train_dtype or config.get("train_dtype", "float32"),
        # device-resident corpus cache: crops sliced on device, per-step H2D
        # is just row indices + offsets (data/device_cache.py)
        device_cache=config.get("device_cache", False),
        device_cache_crop=config.get("speech_max_length", -1),
        stats_interval=config.get("stats_interval", 1),
    )

    out = Path(args.output_dir)
    out.mkdir(parents=True, exist_ok=True)
    # config round-trip: the dumped file reconstructs the model at inference
    # (abs_task.py:1282-1297)
    import yaml

    with open(out / "config.yaml", "w") as f:
        yaml.safe_dump(config, f)

    train_ds, valid_ds = build_datasets(args, config)
    logging.info("train: %d utts, valid: %d utts", len(train_ds), len(valid_ds))

    mesh = make_mesh(options.batch_size)
    trainer = GANCodecTrainer(model, discriminator, options, mesh=mesh)
    state = trainer.init_state(jax.random.PRNGKey(options.seed))
    from funcodec_tpu.utils.misc import model_summary

    logging.info(model_summary(state.params, "generator"))
    if args.stat_flops:
        from funcodec_tpu.utils.misc import codec_flops_tree

        logging.info(
            "\n%s",
            codec_flops_tree(model, state.params, state.rvq_state,
                             samples=config.get("speech_max_length", 16000)),
        )
    if args.dry_run:
        logging.info("--dry_run: model and data built, exiting before training")
        return
    trainer.run(state, train_ds, valid_ds)


if __name__ == "__main__":
    main()
