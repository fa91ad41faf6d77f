"""LauraTTS training CLI: (text, codec tokens) -> codec language model.

Behavioral reference: funcodec/bin/text2audio_train.py + Text2AudioGenTask
(tasks/text2audio_generation.py) + the LibriTTS recipe stage
(egs/LibriTTS/text2speech_laura/run.sh:221-243, incl. the
`--init_param codec.pth:quantizer.rq.model:quantizer_codebook` codebook graft).
"""

from __future__ import annotations

import argparse
import logging
from pathlib import Path

import numpy as np
import yaml

import jax
import jax.numpy as jnp

from funcodec_tpu.data.dataset import CodecDataset, collate_fn
from funcodec_tpu.data.loader import PrefetchLoader
from funcodec_tpu.data.sampler import length_batches, shuffle_batches_for_epoch
from funcodec_tpu.data.text import Text2AudioPreprocessor
from funcodec_tpu.tasks.text2audio import build_laura_model
from funcodec_tpu.train.laura_trainer import LauraTrainer, LauraTrainerOptions


def graft_codebooks(params, codec_model_file: str, codec_config_file=None):
    """--init_param <codec.pth>:quantizer.rq.model:quantizer_codebook
    (torch_utils/load_pretrained_model.py:46-129 remap semantics)."""
    from funcodec_tpu.compat.torch_import import load_torch_state_dict

    if codec_model_file.endswith((".pth", ".pt", ".bin")):
        sd = load_torch_state_dict(codec_model_file)
        embed = jnp.asarray(np.array(sd["quantizer.rq.model.embed"], copy=True))
    else:
        from funcodec_tpu.tasks.codec import build_codec_model, load_config

        cfg_path = codec_config_file or str(Path(codec_model_file).parent / "config.yaml")
        model, _ = build_codec_model(load_config(cfg_path))
        from funcodec_tpu.train.checkpoint import load_checkpoint_params

        _, rvq_state = load_checkpoint_params(codec_model_file, model)
        embed = rvq_state.embed
    nq, bins, dim = params["quantizer_codebook"].shape
    return {**params, "quantizer_codebook": embed[:nq, :bins, :dim]}


def main(argv=None):
    parser = argparse.ArgumentParser(description="TPU LauraTTS training")
    parser.add_argument("--config", type=str, required=True)
    parser.add_argument("--output_dir", type=str, required=True)
    parser.add_argument("--train_text", type=str, required=True,
                        help="text file/scp: uttid <tokens or raw text>")
    parser.add_argument("--train_codec", type=str, required=True,
                        help="codec scp: kaldi ark scp of (T, n_q) token matrices")
    parser.add_argument("--valid_text", type=str, required=True)
    parser.add_argument("--valid_codec", type=str, required=True)
    parser.add_argument("--token_list", type=str, default=None)
    parser.add_argument("--token_type", type=str, default=None)
    parser.add_argument("--codec_init_param", type=str, default=None,
                        help="codec checkpoint whose quantizer codebooks are grafted")
    parser.add_argument("--codec_config", type=str, default=None,
                        help="codec config.yaml (defaults to sibling of the checkpoint)")
    parser.add_argument("--resume", type=lambda s: s.lower() == "true", default=True)
    parser.add_argument("--max_epoch", type=int, default=None)
    parser.add_argument("--profile_dir", type=str, default=None,
                        help="capture a jax.profiler trace of a few compiled "
                             "steps into this directory (utils/profiling.py)")
    parser.add_argument("--train_dtype", type=str, default=None,
                        choices=["float32", "bfloat16", "bf16"],
                        help="bfloat16 = mixed-precision training: fp32 master "
                             "params, bf16 forward/backward (train/step.py)")
    args = parser.parse_args(argv)

    logging.basicConfig(level=logging.INFO)
    with open(args.config) as f:
        config = yaml.safe_load(f)
    if args.max_epoch is not None:
        config["max_epoch"] = args.max_epoch

    token_list = None
    if args.token_list:
        with open(args.token_list, encoding="utf-8") as f:
            token_list = [line.strip() for line in f if line.strip()]

    model = build_laura_model(config, token_list=token_list)

    def make_pre(train):
        return Text2AudioPreprocessor(
            train=train,
            audio_max_duration=config.get("audio_max_duration", 30),
            codec_token_rate=config.get("codec_token_rate", 25),
            token_list=token_list,
            token_type=args.token_type,
        )

    text_type = "text" if args.token_type else "text_int"
    train_ds = CodecDataset(
        [(args.train_text, "text", text_type), (args.train_codec, "codec", "kaldi_ark")],
        preprocess=make_pre(True),
    )
    valid_ds = CodecDataset(
        [(args.valid_text, "text", text_type), (args.valid_codec, "codec", "kaldi_ark")],
        preprocess=make_pre(False),
    )
    logging.info("train=%d valid=%d utts", len(train_ds), len(valid_ds))

    options = LauraTrainerOptions(
        output_dir=args.output_dir,
        max_epoch=config.get("max_epoch", 50),
        num_iters_per_epoch=config.get("num_iters_per_epoch"),
        batch_bins=config.get("batch_bins", 10240),
        seed=config.get("seed", 0),
        log_interval=config.get("log_interval", 50),
        keep_nbest_models=config.get("keep_nbest_models", 50),
        best_model_criterion=tuple(
            config.get("best_model_criterion", [["valid", "loss", "min"]])[0]
        ),
        patience=config.get("patience"),
        resume=args.resume,
        grad_clip=config.get("grad_clip", 5),
        optim=config.get("optim", "adam"),
        optim_conf=config.get("optim_conf", {"lr": 1e-3}),
        scheduler=config.get("scheduler", "warmuplr"),
        scheduler_conf=config.get("scheduler_conf", {"warmup_steps": 10000}),
        num_workers=config.get("num_workers", 8),
        accum_grad=config.get("accum_grad", 1),
        profile_dir=args.profile_dir,
        train_dtype=args.train_dtype or config.get("train_dtype", "float32"),
    )
    trainer = LauraTrainer(model, options)
    state = trainer.init_state(jax.random.PRNGKey(options.seed))
    if args.codec_init_param:
        state = state.replace(
            params=graft_codebooks(state.params, args.codec_init_param, args.codec_config)
        )

    # lengths for batch_bins packing (codec token counts)
    def utt_lengths(ds):
        lens = {}
        for u in ds.uttids:
            _, data = ds[u]
            lens[u] = int(np.asarray(data["codec"]).shape[0]) + len(
                np.atleast_1d(data["text"])
            )
        return lens

    train_lens = utt_lengths(train_ds)
    valid_lens = utt_lengths(valid_ds)
    base_train = length_batches(train_ds.uttids, train_lens, options.batch_bins)
    base_valid = length_batches(valid_ds.uttids, valid_lens, options.batch_bins)

    def loader(ds, base, epoch, shuffle):
        batches = shuffle_batches_for_epoch(base, options.seed, epoch, shuffle)
        return PrefetchLoader(
            ds, batches,
            lambda items: collate_fn(items, int_pad_value=-1),
            num_workers=options.num_workers,
        )

    trainer.run(
        state,
        lambda e: loader(train_ds, base_train, e, True),
        lambda e: loader(valid_ds, base_valid, e, False),
    )


if __name__ == "__main__":
    main()
