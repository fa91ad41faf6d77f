"""End-to-end training loop: the codec_train CLI on a tiny corpus.

Covers: dataset/preprocessor/sampler/loader, jitted GAN step, reporter,
checkpoint/latest/best symlinks, n-best pruning, resume, validation dumps.
"""

import os
from pathlib import Path

import numpy as np
import pytest
import yaml


TINY_CONFIG = {
    "input_size": 1,
    "use_preprocessor": True,
    "speech_max_length": 4096,
    "valid_max_length": 4096,
    "sampling_rate": 16000,
    "encoder": "encodec_seanet_encoder",
    "encoder_conf": {"n_filters": 4, "ratios": [4, 2], "norm": "time_group_norm", "causal": False},
    "quantizer": "costume_quantizer",
    "quantizer_conf": {
        "codebook_size": 32, "num_quantizers": 4, "ema_decay": 0.9,
        "kmeans_init": True, "sampling_rate": 16000,
        "quantize_dropout": True, "rand_num_quant": [1, 2, 4],
        "encoder_hop_length": 8,
    },
    "decoder": "encodec_seanet_decoder",
    "decoder_conf": {"n_filters": 4, "ratios": [4, 2], "norm": "time_group_norm", "causal": False},
    "discriminator": "multiple_disc",
    "discriminator_conf": {
        "disc_conf_list": [{"name": "encodec_multi_scale_stft_discriminator", "filters": 4}]
    },
    "model": "encodec",
    "model_conf": {
        "odim": 16,
        "multi_spectral_window_powers_of_two": [5, 6],
        "target_sample_hz": 16000,
        "audio_normalize": True,
        "use_power_spec_loss": True,
        "segment_dur": None,
        "overlap_ratio": None,
    },
    "optim_conf": {"lr": 0.001, "betas": [0.5, 0.9]},
    "optim2_conf": {"lr": 0.001, "betas": [0.5, 0.9]},
    "num_iters_per_epoch": 3,
    "max_epoch": 2,
    "batch_size": 2,
    "drop_last": True,
    "log_interval": 1,
    "keep_nbest_models": 1,
    "num_workers": 2,
    "seed": 0,
    "best_model_criterion": [["valid", "generator_multi_spectral_recon_loss", "min"]],
}


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    root = tmp_path_factory.mktemp("train")
    from funcodec_tpu.data.wav_io import write_wav

    rng = np.random.RandomState(0)
    (root / "wavs").mkdir()
    lines = []
    for i in range(6):
        t = 4096 + 512 * i
        w = (0.2 * np.sin(2 * np.pi * (100 + 40 * i) * np.arange(t) / 16000)
             + 0.02 * rng.randn(t)).astype(np.float32)
        p = root / "wavs" / f"u{i}.wav"
        write_wav(p, w, 16000)
        lines.append(f"u{i} {p}")
    (root / "wav.scp").write_text("\n".join(lines) + "\n")
    with open(root / "config.yaml", "w") as f:
        yaml.safe_dump(TINY_CONFIG, f)
    return root


def test_codec_train_cli_end_to_end(corpus):
    from funcodec_tpu.cli.codec_train import main

    out = corpus / "exp"
    main([
        "--config", str(corpus / "config.yaml"),
        "--output_dir", str(out),
        "--train_wav_scp", str(corpus / "wav.scp"),
        "--valid_wav_scp", str(corpus / "wav.scp"),
    ])

    # artifacts of the checkpoint contract (trainer.py:369-509)
    assert (out / "checkpoint.ckpt").exists()
    assert (out / "2epoch.ckpt").exists()
    assert (out / "latest.ckpt").is_symlink()
    assert (out / "config.yaml").exists()
    best = out / "valid.generator_multi_spectral_recon_loss.best.ckpt"
    assert best.is_symlink()
    # n-best pruning with keep=1: only the best + current epoch survive
    epochs = sorted(p.name for p in out.glob("*epoch.ckpt"))
    assert len(epochs) <= 2
    # validation wav dumps
    dumps = list((out / "valid_wavs").rglob("*.wav"))
    assert len(dumps) >= 2
    # reporter recorded both epochs with finite losses
    import json

    rep = json.loads((out / "reporter.json").read_text())
    assert set(rep["stats"].keys()) == {"1", "2"}
    v = rep["stats"]["2"]["valid"]["generator_multi_spectral_recon_loss"]
    assert np.isfinite(v)


def test_resume_continues(corpus):
    """Re-running with a higher max_epoch resumes from the checkpoint."""
    from funcodec_tpu.cli.codec_train import main

    out = corpus / "exp"
    main([
        "--config", str(corpus / "config.yaml"),
        "--output_dir", str(out),
        "--train_wav_scp", str(corpus / "wav.scp"),
        "--valid_wav_scp", str(corpus / "wav.scp"),
        "--max_epoch", "3",
    ])
    assert (out / "3epoch.ckpt").exists()
    import json

    rep = json.loads((out / "reporter.json").read_text())
    assert "3" in rep["stats"]
    # epochs 1-2 weren't retrained: their stats are the originals
    assert "1" in rep["stats"] and "2" in rep["stats"]


def test_trained_checkpoint_loads_for_inference(corpus):
    """The weights file round-trips through the inference CLI loader."""
    import jax

    from funcodec_tpu.tasks.codec import build_codec_model
    from funcodec_tpu.train.checkpoint import load_checkpoint_params

    out = corpus / "exp"
    config = yaml.safe_load((out / "config.yaml").read_text())
    model, _ = build_codec_model(config)
    params, rvq_state = load_checkpoint_params(str(out / "latest.ckpt"), model)
    import jax.numpy as jnp

    speech = jnp.zeros((1, 2048), jnp.float32) + 0.01
    res = model.inference(params, rvq_state, speech)
    assert res["recon_speech"].shape == (1, 2048)
    assert float(rvq_state.inited.sum()) > 0  # codebooks were trained


def test_shape_file_avoids_corpus_decode(corpus, tmp_path):
    """With a speech_shape file (utils/shape_utils.py:calc_shape; reference
    abs_task.py:1177-1184), sorted/length batch building must not read any
    audio — the lengths come from the file."""
    import jax

    from funcodec_tpu.data.dataset import CodecDataset
    from funcodec_tpu.tasks.codec import build_codec_model, load_config
    from funcodec_tpu.train.gan_trainer import GANCodecTrainer, TrainerOptions
    from funcodec_tpu.utils.shape_utils import calc_shape

    # produce the shape file the way the recipe would
    (corpus / "data" / "train").mkdir(parents=True, exist_ok=True)
    import shutil

    shutil.copy(corpus / "wav.scp", corpus / "data" / "train" / "wav.scp")
    kept, dropped = calc_shape(str(corpus / "data"), "train", str(corpus / "shapes"))
    assert kept == 6 and dropped == 0
    shape_file = corpus / "shapes" / "train" / "speech_shape"

    config = load_config(str(corpus / "config.yaml"))
    model, disc = build_codec_model(config)

    class CountingDataset(CodecDataset):
        reads = 0

        def __getitem__(self, uttid):
            type(self).reads += 1
            return super().__getitem__(uttid)

    ds = CountingDataset([(str(corpus / "wav.scp"), "speech", "sound")])
    options = TrainerOptions(
        output_dir=str(tmp_path / "exp"),
        max_epoch=0,  # build everything, no steps
        batch_size=2,
        batch_type="length",
        batch_bins=16384,
        train_shape_file=str(shape_file),
        num_workers=0,
        resume=False,
    )
    trainer = GANCodecTrainer(model, disc, options)
    params, rvq_state = model.init(jax.random.PRNGKey(0))
    disc_params = disc.init(jax.random.PRNGKey(1))
    from funcodec_tpu.train.step import create_gan_train_state

    state = create_gan_train_state(
        params, disc_params, rvq_state, trainer.optimizer_g, trainer.optimizer_d
    )
    CountingDataset.reads = 0
    trainer.run(state, ds, ds)
    assert CountingDataset.reads == 0, (
        f"batch building decoded {CountingDataset.reads} utterances despite "
        "the shape file"
    )


def test_codec_train_device_cache(corpus, tmp_path):
    """device_cache=True + stats_interval>1: corpus staged on device once,
    crops sliced on device (data/device_cache.py), stats fetched every N
    steps (no per-step host fence). Same checkpoint/reporter contract."""
    import json

    from funcodec_tpu.cli.codec_train import main

    cfg = dict(TINY_CONFIG)
    cfg.update(device_cache=True, stats_interval=2, num_iters_per_epoch=4,
               max_epoch=1, log_interval=2)
    p = tmp_path / "config.yaml"
    with open(p, "w") as f:
        yaml.safe_dump(cfg, f)
    out = tmp_path / "exp"
    main([
        "--config", str(p),
        "--output_dir", str(out),
        "--train_wav_scp", str(corpus / "wav.scp"),
        "--valid_wav_scp", str(corpus / "wav.scp"),
    ])
    assert (out / "1epoch.ckpt").exists()
    rep = json.loads((out / "reporter.json").read_text())
    tr = rep["stats"]["1"]["train"]
    assert np.isfinite(tr["generator_loss"])
    assert np.isfinite(tr["discriminator_loss"])
    # with RIR/noise augmentation the cache must refuse
    import pytest as _pytest

    cfg_bad = dict(cfg)
    cfg_bad["rir_scp"] = str(corpus / "wav.scp")
    with open(p, "w") as f:
        yaml.safe_dump(cfg_bad, f)
    with _pytest.raises(ValueError, match="device_cache"):
        main([
            "--config", str(p),
            "--output_dir", str(tmp_path / "exp2"),
            "--train_wav_scp", str(corpus / "wav.scp"),
            "--valid_wav_scp", str(corpus / "wav.scp"),
        ])
