"""Chunk iterator, streaming loader, shape scan, stats collection, summary."""

import json

import numpy as np
import pytest


@pytest.fixture()
def wav_corpus(tmp_path):
    from funcodec_tpu.data.wav_io import write_wav

    rng = np.random.RandomState(0)
    (tmp_path / "train").mkdir()
    lines = []
    for i in range(5):
        t = 900 + 333 * i
        w = (0.2 * rng.randn(t)).astype(np.float32)
        p = tmp_path / f"u{i}.wav"
        write_wav(p, np.clip(w, -1, 1), 16000)
        lines.append(f"u{i} {p}")
    (tmp_path / "train" / "wav.scp").write_text("\n".join(lines) + "\n")
    return tmp_path


def test_calc_shape_and_data_list(wav_corpus):
    from funcodec_tpu.utils.shape_utils import calc_shape, generate_data_list

    kept, dropped = calc_shape(
        str(wav_corpus), "train", str(wav_corpus / "shape"),
        min_length=1000, num_workers=2,
    )
    assert kept == 4 and dropped == 1  # u0 (900 samples) filtered
    lines = (wav_corpus / "shape" / "train" / "speech_shape").read_text().splitlines()
    assert len(lines) == 4
    key, length = lines[0].split()
    assert key == "u1" and int(length) == 1233

    dl = generate_data_list(str(wav_corpus), "train")
    items = [json.loads(line) for line in open(dl)]
    assert len(items) == 5 and items[0]["key"] == "u0"


def test_chunk_iter_factory(wav_corpus):
    from funcodec_tpu.data.chunk_iter import ChunkIterFactory
    from funcodec_tpu.data.dataset import CodecDataset

    ds = CodecDataset([(str(wav_corpus / "train" / "wav.scp"), "speech", "sound")])
    factory = ChunkIterFactory(ds, batch_size=3, chunk_length="512", seed=0)
    batches = list(factory.build_iter(epoch=1))
    assert batches
    total_chunks = 0
    for keys, batch in batches:
        assert batch["speech"].shape[1] == 512  # static chunk shape
        assert batch["speech"].shape[0] <= 3
        total_chunks += len(keys)
    assert total_chunks >= 5
    # deterministic per epoch
    again = list(factory.build_iter(epoch=1))
    np.testing.assert_array_equal(batches[0][1]["speech"], again[0][1]["speech"])


def test_streaming_loader(wav_corpus):
    from funcodec_tpu.data.streaming import LargeDataLoader
    from funcodec_tpu.utils.shape_utils import generate_data_list

    dl = generate_data_list(str(wav_corpus), "train")
    loader = LargeDataLoader(
        [dl], batch_size=2, min_length=1000, shuffle=True,
        shuffle_buffer_size=4, sort_buffer_size=4, seed=3,
    )
    seen = []
    for keys, batch in loader.build_iter(epoch=0):
        assert batch["speech"].ndim == 2
        assert (batch["speech_lengths"] >= 1000).all()
        seen.extend(keys)
    assert sorted(seen) == ["u1", "u2", "u3", "u4"]


def test_collect_stats(wav_corpus):
    from funcodec_tpu.data.dataset import CodecDataset
    from funcodec_tpu.utils.shape_utils import collect_stats

    ds = CodecDataset([(str(wav_corpus / "train" / "wav.scp"), "speech", "sound")])
    stats = collect_stats(ds, str(wav_corpus / "stats"))
    assert stats["count"] > 0
    shape_lines = (wav_corpus / "stats" / "speech_shape").read_text().splitlines()
    assert len(shape_lines) == 5


def test_model_summary_and_flops():
    import jax
    import jax.numpy as jnp

    from funcodec_tpu.utils.misc import count_parameters, estimate_flops, model_summary

    params = {"a": {"w": jnp.zeros((4, 8))}, "b": jnp.zeros((16,))}
    assert count_parameters(params) == 48
    s = model_summary(params)
    assert "TOTAL: 48" in s
    cost = estimate_flops(lambda x: x @ jnp.ones((8, 8)), jnp.ones((4, 8)))
    assert cost["flops"] != 0


def test_hdf5_source(tmp_path):
    import h5py

    from funcodec_tpu.data.dataset import CodecDataset

    p = tmp_path / "feats.h5"
    with h5py.File(p, "w") as f:
        f["u0"] = np.arange(12, dtype=np.float32).reshape(4, 3)
        f["u1"] = np.ones((2, 3), np.float32)
    ds = CodecDataset([(str(p), "feat", "hdf5")])
    uid, data = ds["u0"]
    assert data["feat"].shape == (4, 3)
    assert len(ds) == 2


def test_folded_and_numel_samplers():
    from funcodec_tpu.data.sampler import folded_batches, numel_batches

    lengths = {f"u{i}": 100 * (i + 1) for i in range(6)}
    fb = folded_batches(list(lengths), lengths, batch_size=4, fold_length=200)
    assert sum(len(b) for b in fb) == 6
    # longest utterances get smaller batches
    assert len(fb[0]) <= 4

    shapes = {u: (l, 2) for u, l in lengths.items()}
    nb = numel_batches(list(lengths), shapes, batch_bins=1000)
    assert sum(len(b) for b in nb) == 6
    for b in nb:
        worst = max(int(np.prod(shapes[u])) for u in b)
        assert worst * len(b) <= 1000 or len(b) == 1


def test_rand_data_types(tmp_path):
    """rand_float / rand_int_L_H debug sources (fileio/rand_gen_dataset.py)."""
    from funcodec_tpu.data.dataset import CodecDataset

    shp = tmp_path / "shape.txt"
    shp.write_text("uttA 12,8\nuttB 5\n")
    ds = CodecDataset([(str(shp), "feats", "rand_float"),
                       (str(shp), "labels", "rand_int_3_10")])
    uid, batch = ds[0]
    assert batch["feats"].shape == (12, 8) and batch["feats"].dtype == np.float32
    assert batch["labels"].shape == (12, 8)
    assert batch["labels"].min() >= 3 and batch["labels"].max() < 10
    import pytest as _pytest

    with _pytest.raises(ValueError):
        CodecDataset([(str(shp), "x", "rand_int_bad")])


def test_text_cleaner_and_num_sequence(tmp_path):
    from funcodec_tpu.data.text import TextCleaner, load_num_sequence_text

    c = TextCleaner()
    assert c("Hello  World") == "Hello  World"
    assert TextCleaner("whitespace")("a   b\tc") == "a b c"
    import pytest as _pytest

    with _pytest.raises(RuntimeError):
        TextCleaner("tacotron")

    p = tmp_path / "shape.txt"
    p.write_text("uttA 1,2,3\nuttB 7\n")
    d = load_num_sequence_text(p, "csv_int")
    assert d == {"uttA": [1, 2, 3], "uttB": [7]}
    p2 = tmp_path / "f.txt"
    p2.write_text("u 1.5 2.5\n")
    assert load_num_sequence_text(p2, "text_float") == {"u": [1.5, 2.5]}


def test_multiple_split_loader():
    from funcodec_tpu.data.loader import MultipleSplitLoader

    class FakeLoader:
        def __init__(self, items):
            self.items = items

        def build_iter(self, epoch, shuffle=None):
            return iter(self.items)

    m = MultipleSplitLoader(
        [lambda: FakeLoader([1, 2]), lambda: FakeLoader([3])], seed=0, shuffle=False
    )
    assert list(m.build_iter(1)) == [1, 2, 3]
    m2 = MultipleSplitLoader(
        [lambda: FakeLoader([1, 2]), lambda: FakeLoader([3])], seed=0, shuffle=True
    )
    got = list(m2.build_iter(5))
    assert sorted(got) == [1, 2, 3]


def test_quality_metrics_sanity():
    """utils/quality.py: identical signals score perfectly; distortion is
    monotone in noise level (the in-repo ViSQOL-role metrics)."""
    import numpy as np

    from funcodec_tpu.utils.quality import (
        log_spectral_distance,
        mel_distortion,
        reconstruction_metrics,
        si_snr,
    )

    rng = np.random.RandomState(0)
    t = np.arange(16000) / 16000.0
    ref = (0.5 * np.sin(2 * np.pi * 440 * t) + 0.2 * np.sin(2 * np.pi * 1330 * t)).astype(np.float32)

    assert log_spectral_distance(ref, ref) < 1e-6
    assert mel_distortion(ref, ref) < 1e-6
    assert si_snr(ref, ref) > 60.0

    noisy1 = ref + 0.01 * rng.randn(len(ref)).astype(np.float32)
    noisy2 = ref + 0.10 * rng.randn(len(ref)).astype(np.float32)
    assert log_spectral_distance(ref, noisy1) < log_spectral_distance(ref, noisy2)
    assert mel_distortion(ref, noisy1) < mel_distortion(ref, noisy2)
    assert si_snr(ref, noisy1) > si_snr(ref, noisy2)
    # scale invariance of si_snr (on a non-degenerate pair; the identical
    # pair sits in the epsilon-limited >140 dB regime)
    assert abs(si_snr(ref, 0.3 * noisy1) - si_snr(ref, noisy1)) < 0.1

    m = reconstruction_metrics(ref, noisy1)
    assert set(m) == {"lsd_db", "mel_distortion", "si_snr_db", "stoi", "nsim"}


def test_codec_eval_cli(tmp_path):
    """cli/codec_eval.py end-to-end: scp + deg dir -> quality.json."""
    import json

    import numpy as np

    from funcodec_tpu.cli.codec_eval import main
    from funcodec_tpu.data.wav_io import write_wav

    rng = np.random.RandomState(1)
    (tmp_path / "deg").mkdir()
    lines = []
    for i in range(3):
        t = np.arange(8000) / 16000.0
        # broadband (speech-like) reference: harmonics + shaped noise — LSD
        # on pure tones is dominated by empty-bin mismatch by construction
        ref = sum(
            0.3 / (k + 1) * np.sin(2 * np.pi * (200 + 100 * i) * (k + 1) * t)
            for k in range(8)
        ) + 0.05 * rng.randn(len(t))
        ref = ref.astype(np.float32)
        deg = ref + 0.02 * rng.randn(len(ref)).astype(np.float32)
        write_wav(tmp_path / f"u{i}.wav", ref, 16000)
        write_wav(tmp_path / "deg" / f"u{i}_rec.wav", deg, 16000)
        lines.append(f"u{i} {tmp_path}/u{i}.wav")
    (tmp_path / "wav.scp").write_text("\n".join(lines) + "\n")

    main([
        "--ref_scp", str(tmp_path / "wav.scp"),
        "--deg_dir", str(tmp_path / "deg"),
        "--output_dir", str(tmp_path / "score"),
    ])
    q = json.loads((tmp_path / "score" / "quality.json").read_text())
    assert len(q["per_utt"]) == 3
    assert q["mean"]["si_snr_db"] > 10.0
    assert q["mean"]["lsd_db"] < 15.0
