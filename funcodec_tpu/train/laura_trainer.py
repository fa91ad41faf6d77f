"""Single-optimizer trainer for the Laura text2audio model.

Behavioral reference: funcodec/train/trainer.py (Trainer :101-877) driving
LauraGenModel.forward; optimizer/scheduler per the shipped
text2audio_codec_lm_nq2_uni_rel_pos.yaml (adam lr 1e-3, warmuplr 10k,
grad_clip 5, batch_bins 10240, best criterion (valid, loss, min)).

Batches are shape-bucketed (text/codec lengths rounded up to multiples) so
XLA compiles a handful of executables instead of one per batch shape.
"""

from __future__ import annotations

import dataclasses
import json
import logging
from pathlib import Path
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct

from funcodec_tpu.train.checkpoint import (
    load_train_state,
    save_train_state,
    save_weights,
    update_symlink,
)
from funcodec_tpu.train.reporter import Reporter
from funcodec_tpu.train.schedulers import build_scheduler
from funcodec_tpu.train.step import (
    apply_updates_if_finite,
    cast_floating,
    make_optimizer,
)


@struct.dataclass
class TrainState:
    step: jnp.ndarray
    params: Any
    opt_state: Any


def _round_up(x: int, q: int) -> int:
    return -(-x // q) * q


def bucket_batch(batch: Dict[str, np.ndarray], quantum: int = 32) -> Dict[str, np.ndarray]:
    """Pad text/codec to length buckets for stable compiled shapes."""
    out = dict(batch)
    for name in ("text", "codec"):
        if name not in batch or isinstance(batch[name], list):
            continue
        arr = batch[name]
        target = _round_up(arr.shape[1], quantum)
        pad = target - arr.shape[1]
        if pad > 0:
            widths = [(0, 0), (0, pad)] + [(0, 0)] * (arr.ndim - 2)
            out[name] = np.pad(arr, widths)
    return out


@dataclasses.dataclass
class LauraTrainerOptions:
    output_dir: str = "exp/laura"
    max_epoch: int = 50
    num_iters_per_epoch: Optional[int] = None
    batch_bins: int = 10240
    seed: int = 0
    log_interval: int = 50
    keep_nbest_models: int = 50
    best_model_criterion: Tuple[str, str, str] = ("valid", "loss", "min")
    patience: Optional[int] = None
    resume: bool = True
    num_workers: int = 8
    grad_clip: float = 5.0
    optim: str = "adam"
    optim_conf: Dict[str, Any] = dataclasses.field(default_factory=lambda: {"lr": 1e-3})
    scheduler: Optional[str] = "warmuplr"
    scheduler_conf: Dict[str, Any] = dataclasses.field(
        default_factory=lambda: {"warmup_steps": 10000}
    )
    accum_grad: int = 1
    # jax.profiler trace over a window of compiled steps (utils/profiling.py)
    profile_dir: Optional[str] = None
    profile_start_step: int = 10
    profile_num_steps: int = 5
    # "float32" or "bfloat16" mixed precision (see GAN TrainerOptions)
    train_dtype: str = "float32"


class LauraTrainer:
    def __init__(self, model, options: LauraTrainerOptions, mesh=None):
        self.model = model
        self.opt = options
        self.mesh = mesh
        self.reporter = Reporter()
        schedule = build_scheduler(
            options.scheduler, options.scheduler_conf, options.optim_conf.get("lr", 1e-3)
        )
        self.optimizer = make_optimizer(
            lr=options.optim_conf.get("lr", 1e-3),
            betas=tuple(options.optim_conf.get("betas", options.optim_conf.get("adam_betas", (0.9, 0.999)))),
            eps=options.optim_conf.get("eps", options.optim_conf.get("adam_eps", 1e-8)),
            weight_decay=options.optim_conf.get("weight_decay", 0.0),
            grad_clip=options.grad_clip,
            schedule=schedule,
            accum_grad=options.accum_grad,
            name=options.optim,
            momentum=options.optim_conf.get("momentum", 0.0),
        )
        self._jit_step = None
        self._jit_valid = None

    def init_state(self, key) -> TrainState:
        params = self.model.init(key)
        return TrainState(
            step=jnp.int32(0), params=params, opt_state=self.optimizer.init(params)
        )

    def _step_fn(self):
        if self._jit_step is None:
            model, optimizer = self.model, self.optimizer

            compute_dtype = (
                jnp.bfloat16
                if self.opt.train_dtype in ("bfloat16", "bf16")
                else None
            )

            def step(state: TrainState, batch, rng):
                key = jax.random.fold_in(rng, state.step)

                def loss_fn(params):
                    # cast the floating INPUT too: bf16 params @ fp32 text
                    # would silently promote every downstream matmul back to
                    # fp32 (jax type promotion), making train_dtype=bfloat16
                    # a no-op — caught by the round-4 bench where bf16 and
                    # fp32 measured identical steps/s. Loss softmaxes are
                    # fp32 islands inside the model (laura.py:352,378,440).
                    return model.forward(
                        cast_floating(params, compute_dtype),
                        cast_floating(batch["text"], compute_dtype),
                        batch["text_lengths"],
                        batch["codec"], batch["codec_lengths"],
                        key,
                    )

                (loss, stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                    state.params
                )
                # skip the optimizer step on inf/NaN grads, matching the
                # reference gate (funcodec/train/trainer.py:703-719)
                params, opt_state, grad_norm, is_finite = apply_updates_if_finite(
                    optimizer, grads, state.opt_state, state.params
                )
                # keep the frozen codebooks frozen (grafted from the codec ckpt)
                params = {
                    **params,
                    "quantizer_codebook": state.params["quantizer_codebook"],
                }
                stats = dict(stats)
                stats["grad_norm"] = grad_norm
                stats["nonfinite_skip"] = 1.0 - is_finite.astype(jnp.float32)
                return (
                    TrainState(step=state.step + 1, params=params, opt_state=opt_state),
                    stats,
                )

            # donate the state: params/opt-state update in place instead of
            # allocating a second copy every step
            if self.mesh is None:
                self._jit_step = jax.jit(step, donate_argnums=(0,))
            else:
                from jax.sharding import NamedSharding, PartitionSpec as P

                rep = NamedSharding(self.mesh, P())
                dsh = NamedSharding(self.mesh, P("data"))
                self._jit_step = jax.jit(
                    step,
                    in_shardings=(
                        rep,
                        {"text": dsh, "text_lengths": dsh,
                         "codec": dsh, "codec_lengths": dsh},
                        rep,
                    ),
                    out_shardings=(rep, rep),
                    donate_argnums=(0,),
                )
        return self._jit_step

    def _valid_fn(self):
        if self._jit_valid is None:
            model = self.model

            def valid(state: TrainState, batch, rng):
                _, stats = model.forward(
                    state.params,
                    batch["text"], batch["text_lengths"],
                    batch["codec"], batch["codec_lengths"],
                    rng,
                )
                return stats

            self._jit_valid = jax.jit(valid)
        return self._jit_valid

    def _to_device(self, batch: Dict[str, np.ndarray]):
        from funcodec_tpu.parallel.mesh import put_batch

        batch = bucket_batch(batch)
        return put_batch(
            {
                "text": batch["text"],
                "text_lengths": batch["text_lengths"],
                "codec": np.maximum(batch["codec"], 0),
                "codec_lengths": batch["codec_lengths"],
            },
            self.mesh,
        )

    def run(self, state: TrainState, train_loader_factory, valid_loader_factory, rng=None):
        o = self.opt
        rng = rng if rng is not None else jax.random.PRNGKey(o.seed)
        d = Path(o.output_dir)
        d.mkdir(parents=True, exist_ok=True)

        ckpt = d / "checkpoint.ckpt"
        start_epoch = 1
        if o.resume and ckpt.exists():
            state = load_train_state(str(ckpt), state)
            rep = d / "reporter.json"
            if rep.exists():
                self.reporter.load_state_dict(json.loads(rep.read_text()))
                start_epoch = self.reporter.epoch + 1
            logging.info("resumed at epoch %d", start_epoch)

        step_fn = self._step_fn()
        valid_fn = self._valid_fn()
        phase, key_c, mode = o.best_model_criterion
        from funcodec_tpu.utils.profiling import StepTraceCapture

        tracer = StepTraceCapture(
            o.profile_dir, o.profile_start_step, o.profile_num_steps
        )

        for epoch in range(start_epoch, o.max_epoch + 1):
            self.reporter.set_epoch(epoch)
            sub = self.reporter.start_epoch("train")
            for i, (keys, batch) in enumerate(train_loader_factory(epoch)):
                tracer.tick(int(state.step))
                state, stats = step_fn(state, self._to_device(batch), rng)
                # one batched transfer instead of a ~38 ms tunnel round-trip
                # per stat scalar (NOTES_ROUND2 dispatch-floor trap)
                sub.register(
                    {k: float(v) for k, v in jax.device_get(stats).items()},
                    weight=len(keys),
                )
                if (i + 1) % o.log_interval == 0:
                    logging.info(sub.log_message())
                if o.num_iters_per_epoch and (i + 1) >= o.num_iters_per_epoch:
                    break
            tracer.stop()
            self.reporter.finish_epoch(sub)

            subv = self.reporter.start_epoch("valid")
            for vi, (keys, batch) in enumerate(valid_loader_factory(epoch)):
                stats = valid_fn(
                    state, self._to_device(batch), jax.random.fold_in(rng, vi)
                )
                subv.register(
                    {k: float(v) for k, v in jax.device_get(stats).items()},
                    weight=len(keys),
                )
            self.reporter.finish_epoch(subv)

            save_train_state(str(ckpt), state)
            weights = d / f"{epoch}epoch.ckpt"
            save_weights(str(weights), state.params, None)
            update_symlink(str(weights), str(d / "latest.ckpt"))
            (d / "reporter.json").write_text(json.dumps(self.reporter.state_dict()))
            if self.reporter.best_epoch(phase, key_c, mode) == epoch:
                update_symlink(str(weights), str(d / f"{phase}.{key_c}.best.ckpt"))
            order = self.reporter.sort_epochs(phase, key_c, mode)
            keep = set(order[: o.keep_nbest_models]) | {epoch}
            for pth in d.glob("*epoch.ckpt"):
                e = int(pth.name.replace("epoch.ckpt", ""))
                if e not in keep:
                    pth.unlink()
            logging.info(
                "epoch %d: train loss=%.4f valid loss=%.4f",
                epoch, sub.mean("loss"), subv.mean("loss"),
            )
            if o.patience is not None and self.reporter.check_early_stopping(
                o.patience, phase, key_c, mode
            ):
                break
        return state
