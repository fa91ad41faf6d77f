"""Scheduler registry parity vs torch.optim.lr_scheduler.

The reference registers nine torch-builtin schedulers (abs_task.py:155-168);
epoch-wise ones step per epoch (trainer.py:332-337), batch-wise per iteration
(trainer.py:737-738). Each optax mapping must reproduce torch's lr trajectory.
"""

import math

import numpy as np
import pytest
import torch

from funcodec_tpu.train.schedulers import ReduceLROnPlateau, build_scheduler

BASE_LR = 0.1
SPE = 5  # steps per epoch


def _torch_epoch_lrs(make_sched, n_epochs):
    opt = torch.optim.SGD([torch.nn.Parameter(torch.zeros(1))], lr=BASE_LR)
    sched = make_sched(opt)
    lrs = []
    for _ in range(n_epochs):
        lrs.append(opt.param_groups[0]["lr"])
        sched.step()
    return lrs


def _torch_batch_lrs(make_sched, n_steps):
    opt = torch.optim.SGD([torch.nn.Parameter(torch.zeros(1))], lr=BASE_LR)
    sched = make_sched(opt)
    lrs = []
    for _ in range(n_steps):
        lrs.append(opt.param_groups[0]["lr"])
        opt.step()
        sched.step()
    return lrs


@pytest.mark.parametrize(
    "name,conf,make_torch",
    [
        ("steplr", {"step_size": 3, "gamma": 0.5},
         lambda o: torch.optim.lr_scheduler.StepLR(o, step_size=3, gamma=0.5)),
        ("multisteplr", {"milestones": [2, 5, 9], "gamma": 0.3},
         lambda o: torch.optim.lr_scheduler.MultiStepLR(o, milestones=[2, 5, 9], gamma=0.3)),
        ("exponentiallr", {"gamma": 0.9},
         lambda o: torch.optim.lr_scheduler.ExponentialLR(o, gamma=0.9)),
        ("cosineannealinglr", {"T_max": 10, "eta_min": 0.01},
         lambda o: torch.optim.lr_scheduler.CosineAnnealingLR(o, T_max=10, eta_min=0.01)),
    ],
)
def test_epoch_wise_torch_parity(name, conf, make_torch):
    n_epochs = 12
    torch_lrs = _torch_epoch_lrs(make_torch, n_epochs)
    sched = build_scheduler(name, conf, BASE_LR, steps_per_epoch=SPE)
    for epoch, expect in enumerate(torch_lrs):
        for step in (epoch * SPE, epoch * SPE + SPE - 1):  # constant within epoch
            got = float(sched(step))
            assert got == pytest.approx(expect, rel=1e-5), (name, epoch, step)


@pytest.mark.parametrize(
    "name,conf,make_torch",
    [
        ("cycliclr", {"base_lr": 0.01, "max_lr": 0.1, "step_size_up": 4, "mode": "triangular"},
         lambda o: torch.optim.lr_scheduler.CyclicLR(o, base_lr=0.01, max_lr=0.1, step_size_up=4, mode="triangular")),
        ("cycliclr", {"base_lr": 0.01, "max_lr": 0.1, "step_size_up": 4, "mode": "triangular2"},
         lambda o: torch.optim.lr_scheduler.CyclicLR(o, base_lr=0.01, max_lr=0.1, step_size_up=4, mode="triangular2")),
        ("cosineannealingwarmrestarts", {"T_0": 5, "T_mult": 1, "eta_min": 0.001},
         lambda o: torch.optim.lr_scheduler.CosineAnnealingWarmRestarts(o, T_0=5, T_mult=1, eta_min=0.001)),
        ("cosineannealingwarmrestarts", {"T_0": 3, "T_mult": 2, "eta_min": 0.0},
         lambda o: torch.optim.lr_scheduler.CosineAnnealingWarmRestarts(o, T_0=3, T_mult=2)),
    ],
)
def test_batch_wise_torch_parity(name, conf, make_torch):
    n = 25
    torch_lrs = _torch_batch_lrs(make_torch, n)
    sched = build_scheduler(name, conf, BASE_LR)
    got = [float(sched(s)) for s in range(n)]
    np.testing.assert_allclose(got, torch_lrs, rtol=2e-5, atol=1e-8)


def test_onecyclelr_torch_parity():
    total = 20
    torch_lrs = _torch_batch_lrs(
        lambda o: torch.optim.lr_scheduler.OneCycleLR(
            o, max_lr=0.1, total_steps=total, pct_start=0.3,
            anneal_strategy="cos", div_factor=25.0, final_div_factor=1e4,
        ),
        total,
    )
    sched = build_scheduler(
        "onecyclelr",
        {"max_lr": 0.1, "total_steps": total, "pct_start": 0.3},
        BASE_LR,
    )
    got = [float(sched(s)) for s in range(total)]
    np.testing.assert_allclose(got, torch_lrs, rtol=1e-4, atol=1e-8)


def test_lambdalr_callable_and_errors():
    sched = build_scheduler(
        "lambdalr", {"lr_lambda": lambda e: 1.0 / (1 + e)}, BASE_LR, steps_per_epoch=SPE
    )
    assert float(sched(0)) == pytest.approx(BASE_LR)
    assert float(sched(SPE * 3)) == pytest.approx(BASE_LR / 4)
    with pytest.raises(ValueError, match="lr_lambda"):
        build_scheduler("lambdalr", {}, BASE_LR, steps_per_epoch=SPE)
    with pytest.raises(ValueError, match="steps_per_epoch"):
        build_scheduler("steplr", {"step_size": 2}, BASE_LR)
    with pytest.raises(ValueError, match="inject_hyperparams"):
        build_scheduler("reducelronplateau", {}, BASE_LR)


def test_reduce_lr_on_plateau_torch_parity():
    vals = [1.0, 0.9, 0.91, 0.92, 0.93, 0.94, 0.89, 0.95, 0.96, 0.97, 0.98,
            0.99, 1.0, 0.5, 0.51, 0.52, 0.53, 0.54]
    opt = torch.optim.SGD([torch.nn.Parameter(torch.zeros(1))], lr=BASE_LR)
    tsched = torch.optim.lr_scheduler.ReduceLROnPlateau(
        opt, mode="min", factor=0.5, patience=2, cooldown=1, min_lr=1e-3
    )
    ours = ReduceLROnPlateau(
        BASE_LR, mode="min", factor=0.5, patience=2, cooldown=1, min_lr=1e-3
    )
    for v in vals:
        tsched.step(v)
        got = ours.step(v)
        assert got == pytest.approx(opt.param_groups[0]["lr"], rel=1e-6), v
    state = ours.state_dict()
    restored = ReduceLROnPlateau(BASE_LR, factor=0.5, patience=2, cooldown=1)
    restored.load_state_dict(state)
    assert restored.lr == ours.lr and restored.best == ours.best
