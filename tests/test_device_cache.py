"""Device-resident corpus cache (data/device_cache.py) unit tests.

Covers the ADVICE r3 findings: the mesh path must keep crops on device
(batch-sharded, zero host hops through put_batch), crop offsets must match
the host preprocessor's high-exclusive randint semantics (reference
datasets/preprocessor.py:564), and dense staging must surface its padding
overhead.
"""

import logging

import numpy as np
import pytest

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from funcodec_tpu.data.device_cache import DeviceCachedCrops
from funcodec_tpu.parallel.mesh import put_batch


class _StubDataset:
    """Minimal raw_item provider: uttid -> float32 waveform."""

    def __init__(self, wavs):
        self.wavs = dict(wavs)

    def raw_item(self, uid):
        return uid, {"speech": self.wavs[uid]}


def _make_corpus(n=16, base=6000, crop=4096, seed=0):
    rng = np.random.RandomState(seed)
    wavs = {}
    for i in range(n):
        t = base + 137 * i  # all longer than crop -> real random offsets
        wavs[f"u{i:02d}"] = rng.randn(t).astype(np.float32) * 0.1
    return _StubDataset(wavs), sorted(wavs)


def test_mesh_crops_match_unsharded_and_stay_on_device():
    """8-device mesh: crop values identical to the mesh=None path, output
    already sharded on "data", and put_batch passes it through as the SAME
    array (no host round-trip, no reshard — ADVICE r3 medium)."""
    crop = 4096
    ds, ids = _make_corpus(crop=crop)
    mesh = Mesh(np.array(jax.devices()), axis_names=("data",))

    plain = DeviceCachedCrops(ds, ids, crop_len=crop, seed=7)
    sharded = DeviceCachedCrops(ds, ids, crop_len=crop, seed=7, mesh=mesh)

    batches = [ids[:8], ids[8:16]]
    for (k0, b0), (k1, b1) in zip(
        plain.epoch_loader(batches, epoch=3), sharded.epoch_loader(batches, epoch=3)
    ):
        assert k0 == k1
        s = b1["speech"]
        assert s.sharding == NamedSharding(mesh, P("data"))
        np.testing.assert_array_equal(np.asarray(b0["speech"]), np.asarray(s))
        out = put_batch({"speech": s}, mesh)
        assert out["speech"] is s, "put_batch must not copy a matching-sharded array"


def test_put_batch_reshards_device_array_without_host_hop():
    """A jax.Array with a non-matching sharding gets device_put (D2D), not
    np.asarray + re-upload; values preserved."""
    mesh = Mesh(np.array(jax.devices()), axis_names=("data",))
    x = jax.numpy.arange(64, dtype=jax.numpy.float32).reshape(8, 8)  # single-device
    out = put_batch({"speech": x}, mesh)
    assert out["speech"].sharding == NamedSharding(mesh, P("data"))
    np.testing.assert_array_equal(np.asarray(out["speech"]), np.asarray(x))


def test_crop_offsets_high_exclusive():
    """T = crop_len + 1 rows: randint(0, 1) semantics -> offset ALWAYS 0
    (the old inclusive draw produced offset 1 about half the time)."""
    crop = 256
    rng = np.random.RandomState(0)
    wavs = {f"u{i}": rng.randn(crop + 1).astype(np.float32) for i in range(4)}
    ds = _StubDataset(wavs)
    ids = sorted(wavs)
    cache = DeviceCachedCrops(ds, ids, crop_len=crop, seed=0)
    for epoch in range(20):
        for keys, batch in cache.epoch_loader([ids], epoch):
            got = np.asarray(batch["speech"])
            want = np.stack([wavs[k][:crop] for k in keys])
            np.testing.assert_array_equal(got, want)


def test_crop_offsets_cover_range_high_exclusive():
    """Offsets over many epochs hit every value in [0, T-L-1] and never T-L."""
    crop = 128
    t = crop + 8  # hi = 8 -> valid offsets {0..7}
    wavs = {"u0": np.arange(t, dtype=np.float32)}
    ds = _StubDataset(wavs)
    cache = DeviceCachedCrops(ds, ["u0"], crop_len=crop, seed=1)
    seen = set()
    for epoch in range(200):
        for _, batch in cache.epoch_loader([["u0"]], epoch):
            off = int(np.asarray(batch["speech"])[0, 0])  # row is arange
            seen.add(off)
    assert seen == set(range(8)), seen


def test_short_rows_zero_padded():
    crop = 512
    wavs = {"short": np.ones(100, np.float32)}
    cache = DeviceCachedCrops(_StubDataset(wavs), ["short"], crop_len=crop)
    for _, batch in cache.epoch_loader([["short"]], 0):
        got = np.asarray(batch["speech"])[0]
        assert got[:100].sum() == 100.0
        assert np.all(got[100:] == 0.0)


def test_padding_overhead_warning(caplog):
    """One outlier-long utterance inflates dense staging: must warn and
    expose the ratio (ADVICE r3 low)."""
    crop = 64
    wavs = {f"u{i}": np.ones(80, np.float32) for i in range(8)}
    wavs["outlier"] = np.ones(8000, np.float32)
    ds = _StubDataset(wavs)
    with caplog.at_level(logging.WARNING):
        cache = DeviceCachedCrops(ds, sorted(wavs), crop_len=crop)
    assert cache.padding_overhead > 2.0
    assert any("pads the corpus" in r.message for r in caplog.records)


def test_rejects_nonpositive_crop():
    with pytest.raises(ValueError):
        DeviceCachedCrops(_StubDataset({"u": np.ones(4, np.float32)}), ["u"], crop_len=0)
