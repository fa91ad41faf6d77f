"""Wav-ark dump + read round trip (scripts/dump_to_wav_ark.py role,
egs/LibriTTS/codec/run.sh:123-147)."""

import os

import numpy as np
import pytest

from funcodec_tpu.cli.dump_to_wav_ark import main as dump_main
from funcodec_tpu.data.wav_io import (
    SoundScpReader,
    WavArkWriter,
    read_2column_text,
    read_wav_ark_entry,
    write_wav,
)


def _tone(n, f, sr=16000):
    return (0.5 * np.sin(2 * np.pi * f * np.arange(n) / sr)).astype(np.float32)


def test_wav_ark_writer_roundtrip(tmp_path):
    ark = tmp_path / "wav.ark"
    scp = tmp_path / "wav.scp"
    wavs = {"utt_b": _tone(1601, 220), "utt_a": _tone(800, 440)}  # odd length too
    with WavArkWriter(ark, scp) as w:
        for k, v in wavs.items():
            w(k, 16000, v)
    entries = read_2column_text(scp)
    assert set(entries) == set(wavs)
    for k, rx in entries.items():
        sr, x = read_wav_ark_entry(rx)
        assert sr == 16000
        # int16 quantization round trip
        np.testing.assert_allclose(x, np.trunc(wavs[k] * 2**15) / 2**15, atol=1 / 2**15)


def test_sound_scp_reader_reads_ark_entries(tmp_path):
    ark, scp = tmp_path / "wav.ark", tmp_path / "wav.scp"
    with WavArkWriter(ark, scp) as w:
        w("u1", 16000, _tone(1600, 100))
        w("u2", 16000, _tone(1600, 300))
    r = SoundScpReader(scp)
    sr, x = r["u2"]
    assert sr == 16000 and x.shape == (1600,) and x.dtype == np.float32


def test_dump_cli_resamples_and_shards(tmp_path):
    src = tmp_path / "src"
    out = tmp_path / "out"
    src.mkdir()
    with open(tmp_path / "wav.scp", "wt") as f:
        for i in range(5):
            p = src / f"u{i}.wav"
            write_wav(p, _tone(24000, 200 + 50 * i, sr=24000), 24000)
            f.write(f"u{i} {p}\n")
    dump_main(["--wav_scp", str(tmp_path / "wav.scp"), "--out_dir", str(out),
               "--sample_rate", "16000", "--nj", "2"])
    assert os.path.exists(out / "wav.00.ark") and os.path.exists(out / "wav.01.ark")
    merged = read_2column_text(out / "wav.scp")
    assert set(merged) == {f"u{i}" for i in range(5)}
    lengths = read_2column_text(out / "length.txt")
    for k, rx in merged.items():
        sr, x = read_wav_ark_entry(rx)
        assert sr == 16000
        assert len(x) == int(lengths[k]) == 16000  # 1 s resampled 24k -> 16k
    # re-consumable by the training data pipeline
    r = SoundScpReader(out / "wav.scp")
    sr, x = r["u3"]
    assert sr == 16000 and len(x) == 16000
