"""Device-resident corpus cache: gather + random-crop training batches on TPU.

Role: the per-step host->device transfer of cropped waveforms is the
reference's DataLoader+DDP cost model (funcodec/tasks/abs_task.py:1635-1660:
every rank uploads its batch every step). On TPU that upload is pure loss —
for corpora that fit in HBM (LibriTTS train-clean @16k PCM16 is ~2 GB; this
image's synthetic long-run corpus is ~190 MB fp32) the TPU-native design is
to stage the UTTERANCES on device once and slice random crops there, so each
training step uploads only B int32 row indices + B int32 crop offsets
(~hundreds of bytes) instead of B x speech_max_length floats.

This matters doubly in this environment: the axon tunnel's H2D degrades to
<1 MB/s while the single host core is busy (NOTES_ROUND3.md), which made the
host-path long-horizon run ~4 s/step — the device cache removes the
per-step H2D entirely and returns the step to its compute-bound time.

Crop semantics match CodecPreprocessor exactly (preprocessor.py:117-128,
reference datasets/preprocessor.py:547-560): utterances longer than
speech_max_length get a uniform random crop start in [0, T - L]; shorter
ones are zero-padded to L (rows are staged zero-padded, offset 0). The crop
RNG is epoch-seeded on host, so resume reproduces the exact data order —
the same contract as the host-path loaders.

Not valid with RIR/noise augmentation or per-crop normalization (those are
per-crop host transforms); the trainer refuses the combination.
"""

from __future__ import annotations

from functools import partial
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

import jax
import jax.numpy as jnp


@partial(jax.jit, static_argnames=("crop_len",))
def _gather_crop(cache: jax.Array, idx: jax.Array, off: jax.Array, crop_len: int):
    """rows = cache[idx]; rows[b, off[b] : off[b]+crop_len] — one fused gather
    + dynamic-slice program, no host roundtrip."""
    rows = jnp.take(cache, idx, axis=0)
    return jax.vmap(
        lambda row, o: jax.lax.dynamic_slice(row, (o,), (crop_len,))
    )(rows, off)


class DeviceCachedCrops:
    """Stage a whole (small) corpus on device; serve crops as device arrays.

    Parameters
    ----------
    dataset: CodecDataset (its `raw_item` bypasses the preprocessor — the
        cache needs full utterances, cropping happens on device).
    ids: utterance ids to stage (training split).
    crop_len: speech_max_length (the static crop size).
    """

    def __init__(self, dataset, ids: Sequence[str], crop_len: int, seed: int = 0):
        if crop_len <= 0:
            raise ValueError("device_cache requires speech_max_length > 0")
        self.ids = list(ids)
        self.crop_len = int(crop_len)
        self.seed = int(seed)
        self.row = {u: i for i, u in enumerate(self.ids)}

        lengths = np.zeros(len(self.ids), np.int64)
        wavs: List[np.ndarray] = []
        for i, u in enumerate(self.ids):
            _, data = dataset.raw_item(u)
            w = np.asarray(data["speech"], np.float32)
            if w.ndim == 2:  # multi-channel: first channel, like the preprocessor
                w = w[:, 0]
            lengths[i] = len(w)
            wavs.append(w)
        t_max = max(int(lengths.max()), self.crop_len)
        host = np.zeros((len(self.ids), t_max), np.float32)
        for i, w in enumerate(wavs):
            host[i, : len(w)] = w
        # ONE upload for the whole corpus (then freed on host)
        self.cache = jnp.asarray(host)
        self.lengths = lengths
        # max valid crop start per row (0 when the row is shorter than the crop)
        self._max_start = np.maximum(lengths - self.crop_len, 0)

    def nbytes(self) -> int:
        return int(self.cache.size) * 4

    def epoch_loader(self, batches: Sequence[Sequence[str]], epoch: int):
        """Yield (keys, {"speech": device crops}) for each batch of uttids.

        Offsets are drawn from an epoch-seeded host RNG (exact-resume data
        order, train/gan_trainer.py epoch seeding contract)."""
        rng = np.random.RandomState((self.seed * 100003 + epoch) % (2**31 - 1))
        for keys in batches:
            idx = np.asarray([self.row[u] for u in keys], np.int32)
            hi = self._max_start[idx]
            off = (rng.random_sample(len(idx)) * (hi + 1)).astype(np.int32)
            speech = _gather_crop(
                self.cache, jnp.asarray(idx), jnp.asarray(off), self.crop_len
            )
            yield list(keys), {"speech": speech}
