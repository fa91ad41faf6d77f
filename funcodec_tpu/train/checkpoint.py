"""Checkpointing: single-pytree save/restore with n-best bookkeeping.

Behavioral reference: funcodec/train/trainer.py:369-509 (checkpoint.pth with
model+optimizers+schedulers+reporter, {n}epoch.pth weights, latest.pth
symlink, per-criterion best symlinks, n-best pruning + weight averaging via
util_funcs/average_nbest_models.py:18).

Native format: one msgpack file (flax.serialization) holding
{"params": ..., "rvq_state": ...} for weights-only files, or the full train
state for resume checkpoints. Orbax is intentionally avoided for weight files
so a checkpoint is a single portable file, mirroring model.pth ergonomics.
"""

from __future__ import annotations

import os
from pathlib import Path
from typing import Any, List, Optional, Tuple

import jax
import numpy as np
from flax import serialization

from funcodec_tpu.quant.rvq import RVQState


def _to_host(tree):
    return jax.tree_util.tree_map(lambda x: np.asarray(x), tree)


def save_weights(path: str, params: Any, rvq_state: Optional[RVQState]) -> None:
    payload = {"params": _to_host(params)}
    if rvq_state is not None:
        payload["rvq_state"] = _to_host(rvq_state)
    data = serialization.to_bytes(payload)
    tmp = str(path) + ".tmp"
    with open(tmp, "wb") as f:
        f.write(data)
    os.replace(tmp, path)


def load_params(path: str, params_template: Any) -> Any:
    """Restore a params-only weights file (e.g. Laura checkpoints)."""
    template = {"params": _to_host(params_template)}
    with open(path, "rb") as f:
        restored = serialization.from_bytes(template, f.read())
    return restored["params"]


def load_checkpoint_params(path: str, model) -> Tuple[Any, RVQState]:
    """Restore (params, rvq_state) for a model built from the same config.

    The restore template only needs the tree structure and shapes, so it is
    built with jax.eval_shape (a trace, no compile, no device): running a
    real model.init here costs ~20 s of init compiles per fresh process
    (scripts/probe_cli_stages.py) for arrays that are immediately
    overwritten by the restored bytes anyway."""
    shapes = jax.eval_shape(model.init, jax.random.PRNGKey(0))
    params, rvq_state = jax.tree_util.tree_map(
        lambda s: np.zeros(s.shape, s.dtype), shapes
    )
    template = {"params": params, "rvq_state": _to_host(rvq_state)}
    with open(path, "rb") as f:
        restored = serialization.from_bytes(template, f.read())
    return restored["params"], RVQState(**{
        k: restored["rvq_state"][k] for k in ("inited", "cluster_size", "embed", "embed_avg")
    }) if isinstance(restored["rvq_state"], dict) else restored["rvq_state"]


def save_train_state(path: str, state: Any) -> None:
    data = serialization.to_bytes(_to_host(state))
    tmp = str(path) + ".tmp"
    with open(tmp, "wb") as f:
        f.write(data)
    os.replace(tmp, path)


def load_train_state(path: str, template: Any) -> Any:
    with open(path, "rb") as f:
        return serialization.from_bytes(template, f.read())


def update_symlink(target: str, link: str) -> None:
    """Point `link` at `target` (relative), replacing any existing link."""
    link_p = Path(link)
    if link_p.is_symlink() or link_p.exists():
        link_p.unlink()
    link_p.symlink_to(os.path.basename(target))


def average_checkpoints(paths: List[str], model) -> Tuple[Any, RVQState]:
    """n-best weight averaging (util_funcs/average_nbest_models.py:18)."""
    assert paths
    acc_params, acc_state = load_checkpoint_params(paths[0], model)
    acc_params = jax.tree_util.tree_map(lambda x: np.asarray(x, np.float64), acc_params)
    for p in paths[1:]:
        params, _ = load_checkpoint_params(p, model)
        acc_params = jax.tree_util.tree_map(
            lambda a, b: a + np.asarray(b, np.float64), acc_params, params
        )
    n = float(len(paths))
    avg = jax.tree_util.tree_map(lambda a: (a / n).astype(np.float32), acc_params)
    return avg, acc_state
