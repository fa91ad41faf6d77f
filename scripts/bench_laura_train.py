"""Laura LM training-step throughput on real TPU at the recipe point.

The reference trains the 84M LauraTTS LM with Adam lr 1e-3, batch_bins
10240 codec frames on one A100 (egs/LibriTTS/text2speech_laura/README.md).
This times our jitted train step (LauraTrainer._step_fn, fp32 and bf16
mixed precision) at B x T_codec ~ 10240 with 30 s utterances (750 groups)
and a typical text length, reporting steps/s and codec-groups/s trained.
Appends to /tmp/laura_train_bench.log.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

LOG = "/tmp/laura_train_bench.log"


from _benchlib import make_logger  # noqa: E402

log = make_logger(LOG)


def main():
    import jax
    import jax.numpy as jnp

    from bench_laura_decode import CONFIG
    from funcodec_tpu.tasks.text2audio import build_laura_model
    from funcodec_tpu.train.laura_trainer import LauraTrainer, LauraTrainerOptions

    model = build_laura_model(CONFIG)
    n_params = sum(
        np.prod(x.shape) for x in jax.tree_util.tree_leaves(model.init(jax.random.PRNGKey(0)))
    )
    log(f"params: {n_params/1e6:.2f}M  devices: {jax.devices()}")

    Tc, Lt = 752, 48  # 30 s of 25 Hz codec groups (bucketed), text length
    # knee from the axon-crash bisect (artifacts/axon_repro_r3.json):
    # B=24 compiles, B=28 kills the remote compile helper
    batches = [int(b) for b in os.environ.get("LAURA_B", "14,24").split(",")]
    want = (os.environ.get("LAURA_TAGS", "").split(",")
            if os.environ.get("LAURA_TAGS") else None)
    results = {}
    for tag, dtype in (("fp32", "float32"), ("bf16", "bfloat16")):
        if want and tag not in want:
            continue
        for B in batches:
            opts = LauraTrainerOptions(
                output_dir="/tmp/laura_train_bench", max_epoch=1,
                train_dtype=dtype, scheduler=None,
            )
            trainer = LauraTrainer(model, opts)
            state = trainer.init_state(jax.random.PRNGKey(0))
            step = trainer._step_fn()
            rng = np.random.RandomState(0)
            batch = {
                "text": jnp.asarray(rng.randn(B, Lt, 512).astype(np.float32)),
                "text_lengths": jnp.full((B,), Lt, jnp.int32),
                "codec": jnp.asarray(rng.randint(0, 1024, (B, Tc, 32))),
                "codec_lengths": jnp.full((B,), Tc, jnp.int32),
            }
            key = jax.random.PRNGKey(7)
            try:
                t0 = time.perf_counter()
                state, stats = step(state, batch, key)
                float(stats["loss"])
                warm = time.perf_counter() - t0
                n = 5
                t0 = time.perf_counter()
                for _ in range(n):
                    state, stats = step(state, batch, key)
                float(stats["loss"])
                dt = (time.perf_counter() - t0) / n
            except Exception as e:  # noqa: BLE001
                log(f"{tag} B={B}: FAILED {type(e).__name__}: {str(e)[:200]}")
                continue
            groups = B * Tc
            log(
                f"{tag} B={B} (bins={groups}): {dt*1e3:.0f} ms/step "
                f"(warmup {warm:.0f}s) -> {1/dt:.2f} steps/s, "
                f"{groups/dt:.0f} groups/s trained "
                f"({groups/25/dt:.0f} audio_s/s), loss={float(stats['loss']):.3f}"
            )
            results[f"{tag}_b{B}_steps_per_s"] = 1 / dt
            results[f"{tag}_b{B}_groups_per_s"] = groups / dt

    with open("/tmp/laura_train_bench.json", "w") as f:
        json.dump(results, f, indent=2)
    log("DONE " + json.dumps(results))


if __name__ == "__main__":
    main()
