"""Kaldi fbank frontend invariants + LFR/CMVN."""

import numpy as np
import pytest

import jax.numpy as jnp

from funcodec_tpu.ops.fbank import (
    WavFrontend,
    apply_cmvn,
    apply_lfr,
    fbank,
    kaldi_mel_banks,
    load_kaldi_cmvn,
)


def test_fbank_shapes_and_values():
    sr = 16000
    t = np.arange(sr) / sr
    wav = (0.5 * np.sin(2 * np.pi * 1000 * t)).astype(np.float32)[None]
    feats = np.asarray(fbank(jnp.asarray(wav), sr, num_mel_bins=80))
    # snip_edges: 1 + (16000 - 400)//160 = 98 frames
    assert feats.shape == (1, 98, 80)
    assert np.isfinite(feats).all()
    # energy peaks near the 1 kHz mel bin
    banks = kaldi_mel_banks(80, 512, sr)
    freqs = np.arange(257) * sr / 512
    peak_bin = feats[0].mean(axis=0).argmax()
    peak_hz = freqs[banks[peak_bin].argmax()]
    assert 800 < peak_hz < 1250, peak_hz


def test_lfr_stacking():
    x = jnp.asarray(np.arange(10, dtype=np.float32)[None, :, None])
    y = np.asarray(apply_lfr(x, lfr_m=3, lfr_n=2))
    assert y.shape == (1, 5, 3)
    # first output stacks [x0, x0, x1] (left-padded with the first frame)
    np.testing.assert_array_equal(y[0, 0], [0, 0, 1])
    np.testing.assert_array_equal(y[0, 1], [1, 2, 3])


def test_cmvn_roundtrip(tmp_path):
    rng = np.random.RandomState(0)
    feats = rng.randn(1000, 4) * 3.0 + 5.0
    sums = feats.sum(axis=0)
    sq = (feats**2).sum(axis=0)
    n = feats.shape[0]
    text = "[ " + " ".join(map(str, list(sums) + [n])) + "\n" + \
           " ".join(map(str, list(sq) + [0])) + " ]"
    p = tmp_path / "cmvn.txt"
    p.write_text(text)
    shift, scale = load_kaldi_cmvn(str(p))
    out = np.asarray(apply_cmvn(jnp.asarray(feats[None].astype(np.float32)), shift, scale))
    assert abs(out.mean()) < 1e-2
    assert abs(out.std() - 1.0) < 1e-2


def test_wav_frontend_end_to_end():
    fe = WavFrontend(fs=16000, n_mels=40, lfr_m=7, lfr_n=6)
    wav = jnp.asarray(np.random.RandomState(0).randn(2, 8000).astype(np.float32) * 0.1)
    feats = fe(wav)
    assert feats.shape[0] == 2
    assert feats.shape[-1] == fe.output_size() == 280
    assert np.isfinite(np.asarray(feats)).all()
