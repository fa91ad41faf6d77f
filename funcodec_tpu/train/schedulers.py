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


# -- torch-builtin registry names (abs_task.py:155-168) ----------------------
#
# The reference registers nine torch.optim.lr_scheduler classes alongside its
# own warmup/noam/tri_stage. Their stepping unit differs by class
# (schedulers/abs_scheduler.py:67-84): steplr/multisteplr/exponentiallr/
# cosineannealinglr/lambdalr/reducelronplateau step once PER EPOCH
# (trainer.py:332-337), cycliclr/onecyclelr/cosineannealingwarmrestarts once
# PER BATCH (trainer.py:737-738). Optax schedules are functions of the
# optimizer step, so the epoch-wise ones take `steps_per_epoch` and evaluate
# at epoch = step // steps_per_epoch — identical lr trajectory to torch when
# every epoch has the configured number of steps.


def step_lr(base_lr: float, steps_per_epoch: int, step_size: int, gamma: float = 0.1):
    """torch StepLR: lr = base * gamma^(epoch // step_size); epoch-wise."""

    def schedule(step):
        epoch = step // steps_per_epoch
        return base_lr * gamma ** (epoch // step_size)

    return schedule


def multi_step_lr(base_lr: float, steps_per_epoch: int, milestones, gamma: float = 0.1):
    """torch MultiStepLR: lr = base * gamma^(#milestones <= epoch)."""
    import jax.numpy as jnp

    ms = sorted(int(m) for m in milestones)

    def schedule(step):
        epoch = step // steps_per_epoch
        n = sum((epoch >= m).astype(jnp.int32) if hasattr(epoch, "astype") else int(epoch >= m) for m in ms)
        return base_lr * gamma**n

    return schedule


def exponential_lr(base_lr: float, steps_per_epoch: int, gamma: float):
    """torch ExponentialLR: lr = base * gamma^epoch."""

    def schedule(step):
        return base_lr * gamma ** (step // steps_per_epoch)

    return schedule


def cosine_annealing_lr(base_lr: float, steps_per_epoch: int, T_max: int, eta_min: float = 0.0):
    """torch CosineAnnealingLR closed form: eta_min + (base-eta_min)*(1+cos(pi*epoch/T_max))/2."""
    import jax.numpy as jnp

    def schedule(step):
        epoch = step // steps_per_epoch
        return eta_min + (base_lr - eta_min) * (1 + jnp.cos(jnp.pi * epoch / T_max)) / 2

    return schedule


def cyclic_lr(
    base_lr: float,
    max_lr: float,
    step_size_up: int = 2000,
    step_size_down: Optional[int] = None,
    mode: str = "triangular",
    gamma: float = 1.0,
):
    """torch CyclicLR (batch-wise): triangular / triangular2 / exp_range."""
    import jax.numpy as jnp

    down = step_size_down if step_size_down is not None else step_size_up
    total = step_size_up + down

    def schedule(step):
        s = jnp.asarray(step, jnp.float32)
        cycle = jnp.floor(1 + s / total)
        pos = s - (cycle - 1) * total
        frac = jnp.where(pos < step_size_up, pos / step_size_up, 1 - (pos - step_size_up) / down)
        amp = max_lr - base_lr
        if mode == "triangular2":
            amp = amp / (2.0 ** (cycle - 1))
        elif mode == "exp_range":
            amp = amp * gamma**s
        elif mode != "triangular":
            raise ValueError(f"unknown CyclicLR mode {mode}")
        return base_lr + amp * jnp.maximum(frac, 0.0)

    return schedule


def one_cycle_lr(
    max_lr: float,
    total_steps: int,
    pct_start: float = 0.3,
    anneal_strategy: str = "cos",
    div_factor: float = 25.0,
    final_div_factor: float = 1e4,
):
    """torch OneCycleLR (batch-wise, two-phase): warm from max_lr/div_factor to
    max_lr over pct_start*total, anneal to max_lr/(div*final_div)."""
    import jax.numpy as jnp

    initial_lr = max_lr / div_factor
    min_lr = initial_lr / final_div_factor
    up = float(pct_start * total_steps) - 1
    down = float(total_steps - 1) - up

    def interp(frac, lo, hi):
        if anneal_strategy == "cos":
            return lo + (hi - lo) * (1 - jnp.cos(jnp.pi * frac)) / 2
        if anneal_strategy == "linear":
            return lo + (hi - lo) * frac
        raise ValueError(f"unknown anneal_strategy {anneal_strategy}")

    def schedule(step):
        s = jnp.asarray(step, jnp.float32)
        warm = interp(jnp.clip(s / jnp.maximum(up, 1e-8), 0, 1), initial_lr, max_lr)
        cool = interp(jnp.clip((s - up) / jnp.maximum(down, 1e-8), 0, 1), max_lr, min_lr)
        return jnp.where(s <= up, warm, cool)

    return schedule


def cosine_annealing_warm_restarts(
    base_lr: float, T_0: int, T_mult: int = 1, eta_min: float = 0.0
):
    """torch CosineAnnealingWarmRestarts (batch-wise): cosine cycles restarting
    every T_0 * T_mult^i steps."""
    import jax.numpy as jnp

    def schedule(step):
        s = jnp.asarray(step, jnp.float32)
        if T_mult == 1:
            t_cur = jnp.mod(s, T_0)
            t_i = float(T_0)
        else:
            # closed form from torch's CosineAnnealingWarmRestarts.step
            n = jnp.floor(
                jnp.log(s / T_0 * (T_mult - 1) + 1) / math.log(T_mult)
            )
            start = T_0 * (T_mult**n - 1) / (T_mult - 1)
            t_cur = s - start
            t_i = T_0 * (T_mult**n)
        return eta_min + (base_lr - eta_min) * (1 + jnp.cos(jnp.pi * t_cur / t_i)) / 2

    return schedule


class ReduceLROnPlateau:
    """Host-side val-metric scheduler (torch ReduceLROnPlateau semantics;
    AbsValEpochStepScheduler in the reference, stepped with the validation
    criterion at trainer.py:332-335).

    Data-dependent, so it cannot be a pure optax step schedule: hold it on the
    trainer, call ``step(val_metric)`` once per epoch, and feed ``.lr`` into
    the optimizer via ``optax.inject_hyperparams`` (or rebuild the optimizer's
    scale on change). state_dict/load_state_dict round-trip for resume.
    """

    def __init__(
        self,
        base_lr: float,
        mode: str = "min",
        factor: float = 0.1,
        patience: int = 10,
        threshold: float = 1e-4,
        threshold_mode: str = "rel",
        cooldown: int = 0,
        min_lr: float = 0.0,
    ):
        assert mode in ("min", "max") and threshold_mode in ("rel", "abs")
        self.lr = float(base_lr)
        self.mode, self.factor, self.patience = mode, factor, patience
        self.threshold, self.threshold_mode = threshold, threshold_mode
        self.cooldown, self.min_lr = cooldown, min_lr
        self.best: Optional[float] = None
        self.num_bad = 0
        self.cooldown_counter = 0

    def _is_better(self, val: float) -> bool:
        if self.best is None:
            return True
        if self.mode == "min":
            thr = self.best * (1 - self.threshold) if self.threshold_mode == "rel" else self.best - self.threshold
            return val < thr
        thr = self.best * (1 + self.threshold) if self.threshold_mode == "rel" else self.best + self.threshold
        return val > thr

    def step(self, val: float) -> float:
        val = float(val)
        if self._is_better(val):
            self.best, self.num_bad = val, 0
        elif self.cooldown_counter > 0:
            self.cooldown_counter -= 1
            self.num_bad = 0
        else:
            self.num_bad += 1
            if self.num_bad > self.patience:
                self.lr = max(self.lr * self.factor, self.min_lr)
                self.cooldown_counter = self.cooldown
                self.num_bad = 0
        return self.lr

    def state_dict(self):
        return dict(lr=self.lr, best=self.best, num_bad=self.num_bad,
                    cooldown_counter=self.cooldown_counter)

    def load_state_dict(self, state):
        self.lr = state["lr"]
        self.best = state["best"]
        self.num_bad = state["num_bad"]
        self.cooldown_counter = state["cooldown_counter"]


def build_scheduler(
    name: Optional[str],
    conf: dict,
    base_lr: float,
    max_update: Optional[int] = None,
    steps_per_epoch: Optional[int] = None,
):
    """Scheduler registry — every name in the reference's registry
    (abs_task.py:155-168) maps here. Epoch-wise torch builtins need
    `steps_per_epoch` (reference: num_iters_per_epoch) to convert the
    trainer's per-epoch .step() into an optax per-step schedule."""
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

    epoch_wise = {"steplr", "multisteplr", "exponentiallr", "cosineannealinglr", "lambdalr"}
    if name in epoch_wise and not steps_per_epoch:
        raise ValueError(
            f"{name} steps per EPOCH in the reference (abs_scheduler.py:68-77); "
            "pass steps_per_epoch (num_iters_per_epoch) to map it onto a "
            "per-step optax schedule"
        )
    if name == "steplr":
        return step_lr(base_lr, steps_per_epoch, conf["step_size"], conf.get("gamma", 0.1))
    if name == "multisteplr":
        return multi_step_lr(base_lr, steps_per_epoch, conf.get("milestones", (30, 80)), conf.get("gamma", 0.1))
    if name == "exponentiallr":
        return exponential_lr(base_lr, steps_per_epoch, conf["gamma"])
    if name == "cosineannealinglr":
        return cosine_annealing_lr(base_lr, steps_per_epoch, conf["T_max"], conf.get("eta_min", 0.0))
    if name == "lambdalr":
        fn = conf.get("lr_lambda")
        if not callable(fn):
            raise ValueError(
                "lambdalr needs a python callable (torch LambdaLR's lr_lambda "
                "is not yaml-expressible in the reference either); pass "
                "conf={'lr_lambda': fn} or hand any step->lr callable directly "
                "to the trainer as the schedule"
            )
        return lambda step: base_lr * fn(step // steps_per_epoch)
    if name == "cycliclr":
        return cyclic_lr(
            conf.get("base_lr", base_lr), conf["max_lr"],
            conf.get("step_size_up", 2000), conf.get("step_size_down"),
            conf.get("mode", "triangular"), conf.get("gamma", 1.0),
        )
    if name == "onecyclelr":
        total = conf.get("total_steps", max_update)
        if not total:
            raise ValueError("onecyclelr needs total_steps (or max_update)")
        return one_cycle_lr(
            conf.get("max_lr", base_lr), total,
            conf.get("pct_start", 0.3), conf.get("anneal_strategy", "cos"),
            conf.get("div_factor", 25.0), conf.get("final_div_factor", 1e4),
        )
    if name == "cosineannealingwarmrestarts":
        return cosine_annealing_warm_restarts(
            base_lr, conf["T_0"], conf.get("T_mult", 1), conf.get("eta_min", 0.0)
        )
    if name == "reducelronplateau":
        raise ValueError(
            "reducelronplateau is val-metric-dependent (AbsValEpochStepScheduler, "
            "trainer.py:332-335) and cannot be a pure step schedule; use "
            "funcodec_tpu.train.schedulers.ReduceLROnPlateau on the trainer and "
            "feed .lr via optax.inject_hyperparams"
        )
    raise ValueError(f"unknown scheduler {name}")
