"""LR schedulers as optax schedules.

Behavioral reference: funcodec/schedulers/warmup_lr.py:11-50 (WarmupLR),
noam_lr.py (NoamLR), tri_stage_scheduler.py:16-120 (TriStageLR with
late-bound max_update, abs_task.py:1383-1385).
"""

from __future__ import annotations

import math
from typing import Optional


def warmup_lr(base_lr: float, warmup_steps: int = 25000):
    """lr * warmup^0.5 * min(step^-0.5, step * warmup^-1.5) (warmup_lr.py:40-49).

    Unlike NoamLR the peak is exactly base_lr at step == warmup_steps.
    """

    def schedule(step):
        s = step + 1  # torch schedulers are 1-indexed via last_epoch
        return (
            base_lr
            * warmup_steps**0.5
            * jnp_minimum(s**-0.5, s * warmup_steps**-1.5)
        )

    return schedule


def noam_lr(base_lr: float, model_size: int = 320, warmup_steps: int = 25000):
    def schedule(step):
        s = step + 1
        return base_lr * model_size**-0.5 * jnp_minimum(s**-0.5, s * warmup_steps**-1.5)

    return schedule


def tri_stage_lr(
    peak_lr: float,
    max_update: int,
    phase_ratio=(0.1, 0.4, 0.5),
    init_lr_scale: float = 0.01,
    final_lr_scale: float = 0.01,
):
    """fairseq-style tri-stage: linear warmup, hold, exponential decay."""
    warmup = int(max_update * phase_ratio[0])
    hold = int(max_update * phase_ratio[1])
    decay = int(max_update * phase_ratio[2])
    init_lr = init_lr_scale * peak_lr
    final_lr = final_lr_scale * peak_lr
    lr_step = (peak_lr - init_lr) / max(warmup, 1)
    decay_factor = -math.log(final_lr_scale) / max(decay, 1)

    def schedule(step):
        import jax.numpy as jnp

        s = jnp.asarray(step, jnp.float32)
        warm = init_lr + lr_step * s
        exp = peak_lr * jnp.exp(-decay_factor * (s - warmup - hold))
        lr = jnp.where(
            s < warmup, warm, jnp.where(s < warmup + hold, peak_lr, exp)
        )
        return jnp.maximum(lr, final_lr)

    return schedule


def jnp_minimum(a, b):
    import jax.numpy as jnp

    return jnp.minimum(a, b)


def build_scheduler(name: Optional[str], conf: dict, base_lr: float, max_update: Optional[int] = None):
    """Scheduler registry (abs_task.py:155-168 subset actually exercised)."""
    if name is None:
        return None
    name = name.lower()
    if name == "warmuplr":
        return warmup_lr(base_lr, conf.get("warmup_steps", 25000))
    if name == "noamlr":
        return noam_lr(base_lr, conf.get("model_size", 320), conf.get("warmup_steps", 25000))
    if name == "tri_stage":
        assert max_update, "tri_stage needs max_update (abs_task.py:1383-1385)"
        return tri_stage_lr(
            base_lr, max_update,
            phase_ratio=tuple(conf.get("phase_ratio", (0.1, 0.4, 0.5))),
            init_lr_scale=conf.get("init_lr_scale", 0.01),
            final_lr_scale=conf.get("final_lr_scale", 0.01),
        )
    raise ValueError(f"unknown scheduler {name}")
