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
speech_max_length get a uniform random crop start drawn like
``randint(0, T - L)`` — high-EXCLUSIVE, i.e. [0, T-L-1] (ADVICE r3); shorter
ones are zero-padded to L (rows are staged zero-padded, offset 0). The crop
RNG is epoch-seeded on host, so resume reproduces the exact data order —
the same contract as the host-path loaders.

Under a data mesh the cache is staged REPLICATED over the mesh and the
gather+crop runs with batch-sharded out_shardings, so the crops land already
sharded on "data" and the trainer's put_batch is a no-op — no host hop, no
reshard (ADVICE r3 medium).

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

    def __init__(self, dataset, ids: Sequence[str], crop_len: int, seed: int = 0,
                 mesh=None):
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
        # a single outlier-long utterance pads EVERY row to its length
        # (dense [N, t_max] staging): surface the overhead so a user sees the
        # footprint before it surprises them (ADVICE r3)
        payload = int(lengths.sum())
        self.t_max = t_max
        self.padding_overhead = (len(self.ids) * t_max) / max(payload, 1)
        if self.padding_overhead > 2.0:
            import logging

            logging.warning(
                "device_cache: dense staging pads the corpus %.1fx past its "
                "payload (t_max=%d vs mean len %.0f) — a few outlier-long "
                "utterances dominate; consider cropping them on host first",
                self.padding_overhead, t_max, payload / max(len(self.ids), 1),
            )
        host = np.zeros((len(self.ids), t_max), np.float32)
        for i, w in enumerate(wavs):
            host[i, : len(w)] = w
        # ONE upload for the whole corpus (then freed on host). Under a mesh:
        # replicated (the corpus is small by precondition), so the sharded
        # gather below needs no cross-device comms.
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            self.cache = jax.device_put(host, NamedSharding(mesh, P()))
            self._gather = jax.jit(
                _gather_crop.__wrapped__,
                static_argnames=("crop_len",),
                out_shardings=NamedSharding(mesh, P("data")),
            )
        else:
            self.cache = jnp.asarray(host)
            self._gather = _gather_crop
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
            # floor(U[0,1) * hi) == randint(0, hi) high-exclusive — the host
            # preprocessor / reference semantics (preprocessor.py:121,
            # reference datasets/preprocessor.py:564); hi==0 rows start at 0
            off = (rng.random_sample(len(idx)) * np.maximum(hi, 1)).astype(
                np.int32
            )
            speech = self._gather(
                self.cache, jnp.asarray(idx), jnp.asarray(off), self.crop_len
            )
            yield list(keys), {"speech": speech}
