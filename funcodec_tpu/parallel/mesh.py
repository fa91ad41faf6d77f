"""Device mesh and sharding helpers — the framework's scaling layer.

Replaces the reference's process-per-GPU NCCL choreography
(funcodec/train/distributed_utils.py:13-235, run.sh:151-200) with
single-program SPMD over a ``jax.sharding.Mesh``:

- data parallelism: batch sharded on the "data" axis, state replicated;
  gradient means and RVQ codebook statistics become GSPMD-inserted
  collectives over ICI;
- multi-host: ``jax.distributed.initialize()`` then the same mesh spans all
  hosts (each host feeds its addressable shard of the global batch).

The codec models (<=85M params) need no tensor/pipeline parallelism
(SURVEY §2.6); the axis layout leaves room to extend the mesh with a
"model" axis for larger codec LMs.
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def initialize_multihost(coordinator_address: Optional[str] = None,
                         num_processes: Optional[int] = None,
                         process_id: Optional[int] = None) -> None:
    """Multi-host bring-up (replaces init_torch_distributed, the file://
    rendezvous of distributed_utils.py:45-64)."""
    kwargs = {}
    if coordinator_address is not None:
        kwargs = dict(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    jax.distributed.initialize(**kwargs)


def data_mesh(batch_size: Optional[int] = None, max_devices: Optional[int] = None) -> Optional[Mesh]:
    """1-D "data" mesh over the largest device count dividing the batch."""
    devices = jax.devices()
    n = min(len(devices), max_devices or len(devices))
    if batch_size is not None:
        while n > 1 and batch_size % n != 0:
            n -= 1
    if n <= 1:
        return None
    return Mesh(np.array(devices[:n]), axis_names=("data",))


def shardings(mesh: Optional[Mesh]) -> Tuple[Optional[NamedSharding], Optional[NamedSharding]]:
    """(replicated, batch-sharded) shardings for a data mesh."""
    if mesh is None:
        return None, None
    return NamedSharding(mesh, P()), NamedSharding(mesh, P("data"))


def put_batch(batch: dict, mesh: Optional[Mesh]) -> dict:
    """Device-put a host batch with the batch axis sharded over "data".

    Single-host: a plain sharded device_put. Multi-host (process_count > 1):
    each process passes its LOCAL slice of the global batch (the reference's
    rank-sharded `batches[rank::world_size]`, abs_task.py:1643) and the
    global array is assembled from per-process addressable shards —
    `jax.device_put` of host data onto a multi-host sharding is NOT valid,
    which is why the trainers route through here (VERDICT r1 item 8).
    """
    import jax.numpy as jnp

    if mesh is None:
        return {k: jnp.asarray(v) for k, v in batch.items()}
    _, data_sh = shardings(mesh)
    nproc = jax.process_count()
    out = {}
    for k, v in batch.items():
        if isinstance(v, jax.Array) and nproc == 1:
            # already on device (device_cache path): reshard device-to-device
            # over ICI — np.asarray here would be a blocking D2H fence plus a
            # full re-upload every step (ADVICE r3 medium). device_put is a
            # no-op when the sharding already matches.
            out[k] = v if v.sharding == data_sh else jax.device_put(v, data_sh)
            continue
        if isinstance(v, jax.Array) and nproc > 1:
            global _WARNED_MULTIPROC_DEVICE_INPUT
            if not _WARNED_MULTIPROC_DEVICE_INPUT:
                import logging

                logging.warning(
                    "put_batch: device-resident inputs under multi-process "
                    "fall back to a host round-trip (make_array_from_"
                    "process_local_data needs host data); stage the cache "
                    "per-process instead"
                )
                _WARNED_MULTIPROC_DEVICE_INPUT = True
        v = np.asarray(v)
        if nproc == 1:
            out[k] = jax.device_put(v, data_sh)
        else:
            global_shape = (v.shape[0] * nproc,) + v.shape[1:]
            out[k] = jax.make_array_from_process_local_data(data_sh, v, global_shape)
    return out


_WARNED_MULTIPROC_DEVICE_INPUT = False
