"""GAN codec training loop: epochs, validation, checkpoints, n-best.

Behavioral reference: funcodec/train/trainer.py (Trainer.run :186-517:
resume, per-epoch validate, checkpoint/latest/best symlinks, n-best pruning
+ averaging) and funcodec/train/gan_trainer.py (:97-495: alternating turns,
max_update stop, validation wav dumps).

TPU design: ONE jitted train step (both turns inside) over a data-parallel
mesh; the epoch loop is pure host orchestration. Checkpoints are single
msgpack pytrees; batches stream through a threaded prefetch loader.
"""

from __future__ import annotations

import dataclasses
import json
import logging
import os
import time
from pathlib import Path
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from funcodec_tpu.data.dataset import collate_fn
from funcodec_tpu.data.loader import PrefetchLoader
from funcodec_tpu.data.sampler import (
    length_batches,
    shuffle_batches_for_epoch,
    sorted_batches,
    unsorted_batches,
)
from funcodec_tpu.train.checkpoint import (
    load_train_state,
    save_train_state,
    save_weights,
    update_symlink,
)
from funcodec_tpu.train.reporter import Reporter
from funcodec_tpu.parallel.mesh import put_batch
from funcodec_tpu.train.step import (
    GANTrainState,
    create_gan_train_state,
    make_gan_train_step,
    make_optimizer,
)


@dataclasses.dataclass
class TrainerOptions:
    """Mirrors the recipe training settings (encodec_16k_n32_600k_step.yaml:65-92)."""

    output_dir: str = "exp/codec"
    max_epoch: int = 60
    num_iters_per_epoch: Optional[int] = 10000
    batch_size: int = 16
    drop_last: bool = True
    seed: int = 0
    log_interval: int = 50
    keep_nbest_models: int = 60
    best_model_criterion: Tuple[str, str, str] = (
        "valid", "generator_multi_spectral_recon_loss", "min",
    )
    patience: Optional[int] = None
    resume: bool = True
    max_update: Optional[int] = None
    num_workers: int = 8
    save_ckpt_every_steps: Optional[int] = None
    gen_train_interval: int = 1
    disc_train_interval: int = 1
    optim: str = "adam"  # adam | adamw | fairseq_adam | lazy_adamw | sgd
    optim2: str = "adam"
    optim_conf: Dict[str, Any] = dataclasses.field(
        default_factory=lambda: {"lr": 3e-4, "betas": (0.5, 0.9)}
    )
    optim2_conf: Dict[str, Any] = dataclasses.field(
        default_factory=lambda: {"lr": 3e-4, "betas": (0.5, 0.9)}
    )
    grad_clip: float = -1.0
    disc_grad_clip: float = -1.0
    num_valid_dump_wavs: int = 5
    sampling_rate: int = 16000
    use_tensorboard: bool = True
    use_wandb: bool = False
    accum_grad: int = 1
    grad_noise: bool = False
    batch_type: str = "unsorted"  # unsorted | sorted | length
    batch_bins: int = 4_000_000  # for batch_type=length (samples per batch)
    # precomputed `uttid length` file (speech_shape, utils/shape_utils.py:
    # calc_shape / reference abs_task.py:1177-1184) so sorted/length batching
    # does not decode the whole corpus before step 1
    train_shape_file: Optional[str] = None
    # jax.profiler trace over a window of compiled steps (utils/profiling.py;
    # the reference's closest analog is thop --stat_flops + host phase timers)
    profile_dir: Optional[str] = None
    profile_start_step: int = 10
    profile_num_steps: int = 5
    # "float32" (reference parity) or "bfloat16": mixed-precision training —
    # fp32 master params/Adam moments, bf16 forward/backward (train/step.py
    # compute_dtype; the TPU equivalent of the reference's AMP GradScaler,
    # trainer.py:213-227, minus the loss scaling bf16 doesn't need)
    train_dtype: str = "float32"
    # One generator forward per step, stop-gradient fake into the disc turn
    # (train/step.py shared_train_step). Default ON for production throughput;
    # set false for bit-exact reference two-forward semantics (the differences
    # — single RVQ EMA advance, one-step-stale D in the adv loss — are
    # documented at make_gan_train_step)
    shared_forward: bool = True
    # Stage the training corpus on device once and slice random crops there
    # (data/device_cache.py): per-step H2D drops from B x crop floats to
    # ~2B int32 scalars. For corpora that fit in HBM; crop-only preprocessing
    # (no RIR/noise/per-crop normalization). device_cache_crop is the crop
    # length (speech_max_length).
    device_cache: bool = False
    device_cache_crop: int = -1
    # Fetch + register step stats every N iterations (1 = every step, exact
    # reference semantics). N>1 removes the per-step device->host fence so
    # consecutive steps pipeline under async dispatch — on the axon tunnel the
    # fence is a ~40 ms RTT per step. Curves sample every Nth step; max_update
    # and step checkpoints are also only checked at fetch points.
    stats_interval: int = 1


class GANCodecTrainer:
    def __init__(
        self,
        model,
        discriminator,
        options: TrainerOptions,
        mesh=None,
    ):
        self.model = model
        self.discriminator = discriminator
        self.opt = options
        self.mesh = mesh
        self.reporter = Reporter()
        self._tb = None

        o = options
        self.optimizer_g = make_optimizer(
            lr=o.optim_conf.get("lr", 3e-4),
            betas=tuple(o.optim_conf.get("betas", o.optim_conf.get("adam_betas", (0.5, 0.9)))),
            eps=o.optim_conf.get("eps", o.optim_conf.get("adam_eps", 1e-8)),
            weight_decay=o.optim_conf.get("weight_decay", 0.0),
            grad_clip=o.grad_clip,
            accum_grad=o.accum_grad,
            grad_noise=o.grad_noise,
            name=o.optim,
            momentum=o.optim_conf.get("momentum", 0.0),
        )
        self.optimizer_d = make_optimizer(
            lr=o.optim2_conf.get("lr", 3e-4),
            betas=tuple(o.optim2_conf.get("betas", o.optim2_conf.get("adam_betas", (0.5, 0.9)))),
            eps=o.optim2_conf.get("eps", o.optim2_conf.get("adam_eps", 1e-8)),
            weight_decay=o.optim2_conf.get("weight_decay", 0.0),
            grad_clip=o.disc_grad_clip,
            accum_grad=o.accum_grad,
            name=o.optim2,
            momentum=o.optim2_conf.get("momentum", 0.0),
        )
        self._train_step = make_gan_train_step(
            model, discriminator, self.optimizer_g, self.optimizer_d,
            gen_train_interval=o.gen_train_interval,
            disc_train_interval=o.disc_train_interval,
            compute_dtype=(
                jnp.bfloat16 if o.train_dtype in ("bfloat16", "bf16") else None
            ),
            shared_forward=o.shared_forward,
        )
        self._jit_train_step = None
        self._jit_valid_step = None

    # -- setup ---------------------------------------------------------------

    def init_state(self, key) -> GANTrainState:
        params, rvq_state = self.model.init(key)
        disc_params = self.discriminator.init(jax.random.fold_in(key, 1))
        return create_gan_train_state(
            params, disc_params, rvq_state, self.optimizer_g, self.optimizer_d
        )

    def _shardings(self):
        if self.mesh is None:
            return None, None
        from jax.sharding import NamedSharding, PartitionSpec as P

        return (
            NamedSharding(self.mesh, P()),
            NamedSharding(self.mesh, P("data")),
        )

    def _get_train_step(self):
        if self._jit_train_step is None:
            rep, data_sh = self._shardings()
            # donate the state: params/opt-state/RVQ buffers update in place
            # instead of allocating a second copy every step
            if rep is None:
                self._jit_train_step = jax.jit(
                    self._train_step, donate_argnums=(0,)
                )
            else:
                self._jit_train_step = jax.jit(
                    self._train_step,
                    in_shardings=(rep, {"speech": data_sh}, rep),
                    out_shardings=(rep, rep),
                    donate_argnums=(0,),
                )
        return self._jit_train_step

    def _get_valid_step(self):
        if self._jit_valid_step is None:
            model, disc = self.model, self.discriminator

            def valid_step(state: GANTrainState, batch, rng):
                speech = batch["speech"]
                _, gout = model.forward_generator(
                    state.params, state.disc_params, disc, state.rvq_state,
                    speech, rng, training=False,
                )
                _, dout = model.forward_discriminator(
                    state.params, state.disc_params, disc, state.rvq_state,
                    speech, rng, jnp.float32(0.0), training=False,
                )
                stats = {**gout["stats"], **dout["stats"]}
                return stats, gout["fake"]

            rep, data_sh = self._shardings()
            if rep is None:
                self._jit_valid_step = jax.jit(valid_step)
            else:
                self._jit_valid_step = jax.jit(
                    valid_step,
                    in_shardings=(rep, {"speech": data_sh}, rep),
                    out_shardings=(rep, rep),
                )
        return self._jit_valid_step

    # -- loops ---------------------------------------------------------------

    def train_one_epoch(self, state, loader, epoch: int, rng) -> Tuple[Any, Dict]:
        sub = self.reporter.start_epoch("train")
        step_fn = self._get_train_step()
        o = self.opt
        if not hasattr(self, "_tracer"):
            from funcodec_tpu.utils.profiling import StepTraceCapture

            self._tracer = StepTraceCapture(
                o.profile_dir, o.profile_start_step, o.profile_num_steps
            )
        # host-mirrored global step: int(state.step) per iteration would fetch
        # a device scalar (a full tunnel RTT) every step
        host_step = int(state.step)
        si = max(1, o.stats_interval)
        # logging fires at the stats-fetch cadence, so a log_interval that si
        # does not divide would only fire at lcm(si, log_interval) — possibly
        # never within an epoch (ADVICE r3). Round it up to a multiple of si.
        log_interval = -(-o.log_interval // si) * si
        if log_interval != o.log_interval and not getattr(
            self, "_warned_log_interval", False
        ):
            logging.warning(
                "log_interval %d rounded up to %d (multiple of "
                "stats_interval %d)", o.log_interval, log_interval, si,
            )
            self._warned_log_interval = True
        t_last = time.time()
        for i, (keys, batch) in enumerate(loader):
            self._tracer.tick(host_step)
            t_data = time.time()
            dev_batch = put_batch({"speech": batch["speech"]}, self.mesh)
            state, stats = step_fn(state, dev_batch, rng)
            host_step += 1
            # host-side controls run EVERY step (not at the stats cadence):
            # with stats_interval=N the old placement overshot max_update by
            # up to N-1 steps and gave step checkpoints non-round names
            # (ADVICE r3). host_step is host-resident — checking it costs
            # nothing; the checkpoint save fences anyway.
            if o.save_ckpt_every_steps and host_step % o.save_ckpt_every_steps == 0:
                self._save_step_checkpoint(state)
            if o.max_update is not None and host_step >= o.max_update:
                logging.info("reached max_update=%d", o.max_update)
                break
            if (i + 1) % si != 0:
                continue  # no host sync: steps pipeline under async dispatch
            # per-iteration phase timing (reporter.py:263-280 measure_time
            # role): the device_get below fetches scalars, which fences the
            # async dispatch, so step_time is wall-per-step averaged over the
            # stats_interval window. ONE batched transfer: per-scalar float(v)
            # would pay the dispatch+fetch round-trip (~38 ms over the axon
            # tunnel, NOTES_ROUND2) once per stat instead of once per window.
            host_stats = {
                k: float(v) for k, v in jax.device_get(stats).items()
            }
            now = time.time()
            host_stats["iter_time"] = (now - t_last) / si
            host_stats["step_time"] = (
                (now - t_data) if si == 1 else (now - t_last) / si
            )
            t_last = now
            sub.register(host_stats, weight=batch["speech"].shape[0])
            if (i + 1) % log_interval == 0:
                logging.info(sub.log_message())
        self._tracer.stop()
        self.reporter.finish_epoch(sub)
        return state, sub.to_dict()

    def validate(self, state, loader, epoch: int, rng) -> Dict[str, float]:
        sub = self.reporter.start_epoch("valid")
        valid_fn = self._get_valid_step()
        dumped = 0
        out_dir = Path(self.opt.output_dir) / "valid_wavs" / f"epoch{epoch}"
        for vi, (keys, batch) in enumerate(loader):
            # fold per batch: one rng reused across batches would correlate
            # any stochastic eval statistic (VERDICT r1 weak #7)
            stats, fake = valid_fn(
                state,
                put_batch({"speech": batch["speech"]}, self.mesh),
                jax.random.fold_in(rng, vi),
            )
            sub.register(
                {k: float(v) for k, v in jax.device_get(stats).items()},
                weight=batch["speech"].shape[0],
            )
            # dump a few real/fake pairs per epoch (gan_trainer.py:482-495)
            # and score them with the native quality metrics (the recipe's
            # dockerized-ViSQOL role, run.sh:249-295 — docker absent here)
            if dumped < self.opt.num_valid_dump_wavs:
                from funcodec_tpu.data.wav_io import save_audio
                from funcodec_tpu.utils.quality import reconstruction_metrics

                out_dir.mkdir(parents=True, exist_ok=True)
                fake_np = np.asarray(fake, np.float32)
                for b, key in enumerate(keys):
                    if dumped >= self.opt.num_valid_dump_wavs:
                        break
                    real_b = np.asarray(batch["speech"][b], np.float32)
                    save_audio(
                        real_b, out_dir / f"{key}_real.wav",
                        self.opt.sampling_rate, rescale=True,
                    )
                    save_audio(
                        fake_np[b], out_dir / f"{key}_fake.wav",
                        self.opt.sampling_rate, rescale=True,
                    )
                    q = reconstruction_metrics(
                        real_b, fake_np[b], sr=self.opt.sampling_rate
                    )
                    sub.register(q, weight=1)
                    dumped += 1
        self.reporter.finish_epoch(sub)
        return sub.to_dict()

    # -- checkpointing -------------------------------------------------------

    def _tb_writer(self):
        """Optional TensorBoard emission (reporter.py:499-534 role)."""
        if not self.opt.use_tensorboard:
            return None
        if self._tb is None:
            try:
                from torch.utils.tensorboard import SummaryWriter

                self._tb = SummaryWriter(str(Path(self.opt.output_dir) / "tensorboard"))
            except Exception:
                self.opt.use_tensorboard = False
                return None
        return self._tb

    def _emit_tb(self, epoch: int) -> None:
        tb = self._tb_writer()
        if tb is not None:
            for phase, stats in self.reporter.stats.get(epoch, {}).items():
                for k, v in stats.items():
                    tb.add_scalar(f"{phase}/{k}", v, epoch)
            tb.flush()
        # optional wandb emission (reporter.py:519-534 role); the package is
        # not baked into every image, so it is a silent no-op when absent
        if getattr(self.opt, "use_wandb", False):
            try:
                import wandb  # type: ignore

                if wandb.run is None:
                    wandb.init(project="funcodec_tpu",
                               dir=self.opt.output_dir, resume="allow")
                flat = {
                    f"{phase}/{k}": v
                    for phase, stats in self.reporter.stats.get(epoch, {}).items()
                    for k, v in stats.items()
                }
                wandb.log(flat, step=epoch)
            except ImportError:
                pass

    def _ckpt_dir(self) -> Path:
        p = Path(self.opt.output_dir)
        p.mkdir(parents=True, exist_ok=True)
        return p

    def _save_step_checkpoint(self, state):
        path = self._ckpt_dir() / f"{int(state.step)}steps.ckpt"
        save_train_state(str(path), state)

    def _save_epoch(self, state, epoch: int) -> None:
        d = self._ckpt_dir()
        save_train_state(str(d / "checkpoint.ckpt"), state)
        weights_path = d / f"{epoch}epoch.ckpt"
        save_weights(str(weights_path), state.params, state.rvq_state)
        update_symlink(str(weights_path), str(d / "latest.ckpt"))
        with open(d / "reporter.json", "w") as f:
            json.dump(self.reporter.state_dict(), f)

        phase, key, mode = self.opt.best_model_criterion
        if self.reporter.has(phase, key, epoch):
            best = self.reporter.best_epoch(phase, key, mode)
            if best == epoch:
                update_symlink(
                    str(weights_path), str(d / f"{phase}.{key}.best.ckpt")
                )
        # n-best pruning (trainer.py:403-509)
        order = self.reporter.sort_epochs(phase, key, mode)
        keep = set(order[: self.opt.keep_nbest_models])
        keep.add(epoch)
        for p in d.glob("*epoch.ckpt"):
            e = int(p.name.replace("epoch.ckpt", ""))
            if e not in keep:
                p.unlink()

    def resume(self, state_template) -> Tuple[Any, int]:
        d = self._ckpt_dir()
        ckpt = d / "checkpoint.ckpt"
        start_epoch = 1
        state = state_template
        if self.opt.resume and ckpt.exists():
            state = load_train_state(str(ckpt), state_template)
            rep_file = d / "reporter.json"
            if rep_file.exists():
                with open(rep_file) as f:
                    self.reporter.load_state_dict(json.load(f))
                start_epoch = self.reporter.epoch + 1
            logging.info("resumed from %s at epoch %d", ckpt, start_epoch)
        return state, start_epoch

    # -- entry ---------------------------------------------------------------

    def run(
        self,
        state: GANTrainState,
        train_dataset,
        valid_dataset,
        rng=None,
    ) -> GANTrainState:
        o = self.opt
        rng = rng if rng is not None else jax.random.PRNGKey(o.seed)
        state, start_epoch = self.resume(state)

        train_ids = list(train_dataset.uttids)
        valid_ids = list(valid_dataset.uttids)
        phase, key, mode = o.best_model_criterion

        def make_batches(ids, dataset):
            if o.batch_type == "unsorted":
                return unsorted_batches(ids, o.batch_size, o.drop_last)
            # sorted/length need utterance lengths (speech_shape role,
            # samplers/build_batch_sampler.py:78-168). Prefer the precomputed
            # shape file (reference loads it at abs_task.py:1309); decoding
            # audio only for ids the file is missing.
            lengths = {}
            if o.train_shape_file:
                with open(o.train_shape_file) as f:
                    for line in f:
                        parts = line.split()
                        if len(parts) >= 2:
                            # "uttid T" or "uttid T,D" (csv shape)
                            lengths[parts[0]] = int(parts[1].split(",")[0])
                lengths = {u: lengths[u] for u in ids if u in lengths}
            for u in ids:
                if u in lengths:
                    continue
                _, data = dataset[u]
                lengths[u] = int(np.asarray(data["speech"]).shape[0])
            if o.batch_type == "sorted":
                return sorted_batches(ids, lengths, o.batch_size, o.drop_last)
            if o.batch_type == "length":
                return length_batches(ids, lengths, o.batch_bins)
            raise ValueError(f"unknown batch_type {o.batch_type}")

        train_batches_base = make_batches(train_ids, train_dataset)

        device_cache = None
        if o.device_cache:
            if getattr(train_dataset, "preprocess", None) is not None:
                p = train_dataset.preprocess
                if getattr(p, "rirs", None) or getattr(p, "noises", None) or \
                        getattr(p, "speech_volume_normalize", None) or \
                        getattr(p, "speech_rms_normalize", False):
                    raise ValueError(
                        "device_cache supports crop-only preprocessing; "
                        "RIR/noise/normalization are per-crop host transforms"
                    )
            from funcodec_tpu.data.device_cache import DeviceCachedCrops

            device_cache = DeviceCachedCrops(
                train_dataset, train_ids, crop_len=o.device_cache_crop,
                seed=o.seed, mesh=self.mesh,
            )
            logging.info(
                "device cache: %d utts staged on device (%.1f MB, t_max=%d, "
                "padding overhead %.2fx), crop=%d on device", len(train_ids),
                device_cache.nbytes() / 1e6, device_cache.t_max,
                device_cache.padding_overhead, o.device_cache_crop,
            )

        for epoch in range(start_epoch, o.max_epoch + 1):
            self.reporter.set_epoch(epoch)
            batches = list(train_batches_base)
            batches = shuffle_batches_for_epoch(batches, o.seed, epoch)
            if o.num_iters_per_epoch:
                reps = -(-o.num_iters_per_epoch // max(len(batches), 1))
                batches = (batches * reps)[: o.num_iters_per_epoch]
            if device_cache is not None:
                loader = device_cache.epoch_loader(batches, epoch)
            else:
                loader = PrefetchLoader(
                    train_dataset, batches, collate_fn, num_workers=o.num_workers
                )
            state, train_stats = self.train_one_epoch(state, loader, epoch, rng)

            v_batches = unsorted_batches(valid_ids, o.batch_size, drop_last=False)
            v_loader = PrefetchLoader(
                valid_dataset, v_batches, collate_fn, num_workers=o.num_workers
            )
            self.validate(state, v_loader, epoch, rng)
            self._save_epoch(state, epoch)
            self._emit_tb(epoch)
            keys_of_interest = (
                "generator_loss", "generator_recon_loss",
                "generator_multi_spectral_recon_loss", "discriminator_loss",
            )
            valid_stats = self.reporter.stats[epoch].get("valid", {})
            logging.info(
                "epoch %d done: train=%s valid=%s", epoch,
                {k: round(train_stats[k], 4) for k in keys_of_interest if k in train_stats},
                {k: round(valid_stats[k], 4) for k in keys_of_interest if k in valid_stats},
            )
            if o.patience is not None and self.reporter.check_early_stopping(
                o.patience, phase, key, mode
            ):
                logging.info("early stopping at epoch %d", epoch)
                break
            if o.max_update is not None and int(state.step) >= o.max_update:
                break
        return state
