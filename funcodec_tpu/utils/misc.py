"""Small shared utilities: one-shot hints, parameter census, FLOPs estimate.

Behavioral reference: funcodec/utils/hinter.py:8-13 (hint_once),
funcodec/torch_utils/model_summary.py (parameter census logged at
abs_task.py:1276; thop-style FLOPs tree for --stat_flops,
gan_speech_codec.py:345-355).
"""

from __future__ import annotations

import logging
from typing import Any, Dict

import numpy as np

_hinted = set()


def hint_once(message: str, uid: str, rank: int = 0) -> None:
    """Log a message once per uid (utils/hinter.py:8-13)."""
    if uid not in _hinted:
        _hinted.add(uid)
        logging.info(message)


def count_parameters(tree: Any) -> int:
    import jax

    return sum(int(np.prod(x.shape)) for x in jax.tree_util.tree_leaves(tree))


def model_summary(params: Any, name: str = "model") -> str:
    """Parameter census with per-top-level-branch breakdown."""
    lines = [f"{name} summary:"]
    total = count_parameters(params)
    if isinstance(params, dict):
        for k, v in params.items():
            n = count_parameters(v)
            lines.append(f"  {k}: {n:,} params ({100.0 * n / max(total, 1):.1f}%)")
    lines.append(f"  TOTAL: {total:,} params ({total * 4 / 1e6:.2f} MB fp32)")
    return "\n".join(lines)


def estimate_flops(fn, *example_args) -> Dict[str, float]:
    """XLA cost analysis of a jitted callable (thop/--stat_flops role)."""
    import jax

    lowered = jax.jit(fn).lower(*example_args)
    compiled = lowered.compile()
    cost = compiled.cost_analysis()
    if isinstance(cost, list):
        cost = cost[0] if cost else {}
    return {
        "flops": float(cost.get("flops", -1)),
        "bytes_accessed": float(cost.get("bytes accessed", -1)),
    }
