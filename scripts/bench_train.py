"""GAN training-step throughput on real TPU at the recipe operating point.

The reference trains EnCodec nq32ds320 at batch 16 x 40960 samples on 2
GPUs for 600k steps (encodec_16k_n32_600k_step.yaml:53-80, run.sh:6-7).
This measures one-chip v5e steps/s (both turns, full losses, EMA codebooks)
at B=16 and at larger batches to show the TPU headroom, fp32 and bf16-
matmul (precision='bfloat16'-style params stay fp32; XLA default matmul).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

LOG = "/tmp/bench_train.log"


def log(msg):
    line = f"[{time.strftime('%H:%M:%S')}] {msg}"
    print(line, flush=True)
    with open(LOG, "a") as f:
        f.write(line + "\n")


def main():
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _build_flagship
    from funcodec_tpu.train.step import (
        create_gan_train_state,
        make_gan_train_step,
        make_optimizer,
    )

    log(f"devices: {jax.devices()}")
    # BT_REMAT=1: rematerialize SEANet resblocks in the backward (A/B for the
    # HBM-bound step; see seanet.REMAT_RESBLOCKS). Key suffix "_remat".
    remat = os.environ.get("BT_REMAT", "0") == "1"
    if remat:
        import funcodec_tpu.models.seanet as seanet_mod

        seanet_mod.REMAT_RESBLOCKS = True
        log("REMAT_RESBLOCKS=True")
    model, disc = _build_flagship(kmeans_init=True)
    params, rvq_state = model.init(jax.random.PRNGKey(0))
    disc_params = disc.init(jax.random.PRNGKey(1))
    # steady state: all codebooks inited so steps take the fast RVQ branch
    # (real runs leave the kmeans branch once every layer has been active)
    rvq_state = rvq_state.replace(
        inited=jnp.ones_like(rvq_state.inited),
        embed=jnp.asarray(
            np.random.RandomState(2).randn(*rvq_state.embed.shape), jnp.float32
        ),
        cluster_size=jnp.ones_like(rvq_state.cluster_size),
    )
    opt_g = make_optimizer(lr=3e-4, betas=(0.5, 0.9))
    opt_d = make_optimizer(lr=3e-4, betas=(0.5, 0.9))

    T = 40960  # speech_max_length
    results = {}
    # shared = one generator forward per step (production default);
    # twofwd = exact reference two-forward semantics
    # BT_TAGS / BT_BS restrict the grid (each cell is a 1-10 min axon remote
    # compile); default = the full round-3 grid
    want_tags = os.environ.get("BT_TAGS", "").split(",") if os.environ.get("BT_TAGS") else None
    want_bs = ([int(b) for b in os.environ.get("BT_BS", "").split(",")]
               if os.environ.get("BT_BS") else (16, 32, 64))
    for tag, compute_dtype, shared in (
        ("fp32_twofwd", None, False),
        ("fp32_shared", None, True),
        ("bf16_twofwd", jnp.bfloat16, False),
        ("bf16_shared", jnp.bfloat16, True),
    ):
        if want_tags and tag not in want_tags:
            continue
        step = jax.jit(
            make_gan_train_step(
                model, disc, opt_g, opt_d, compute_dtype=compute_dtype,
                shared_forward=shared,
            )
        )
        for B in want_bs:
            state = create_gan_train_state(
                params, disc_params, rvq_state, opt_g, opt_d
            )
            speech = jnp.asarray(
                np.random.RandomState(0).randn(B, T).astype(np.float32) * 0.1
            )
            rng = jax.random.PRNGKey(7)
            try:
                t0 = time.perf_counter()
                state, stats = step(state, {"speech": speech}, rng)
                float(stats["generator_loss"])
                warm = time.perf_counter() - t0
                n = 5
                t0 = time.perf_counter()
                for _ in range(n):
                    state, stats = step(state, {"speech": speech}, rng)
                float(stats["generator_loss"])
                dt = (time.perf_counter() - t0) / n
            except Exception as e:
                log(f"{tag} B={B}: FAILED {type(e).__name__}: {str(e)[:200]}")
                continue
            audio_s = B * T / 16000
            log(
                f"{tag} B={B}: {dt*1e3:.0f} ms/step (warmup {warm:.0f}s) -> "
                f"{1/dt:.2f} steps/s, {audio_s/dt:.0f} audio_s/s trained, "
                f"gen_loss={float(stats['generator_loss']):.3f}"
            )
            suffix = "_remat" if remat else ""
            results[f"{tag}_b{B}{suffix}_steps_per_s"] = 1 / dt
            results[f"{tag}_b{B}{suffix}_audio_s_per_s"] = audio_s / dt

    # merge-update so successive restricted runs (BT_BS/BT_TAGS/BT_REMAT)
    # accumulate into one file instead of clobbering earlier cells
    merged = {}
    if os.path.exists("/tmp/bench_train.json"):
        try:
            merged = json.load(open("/tmp/bench_train.json"))
        except Exception:
            merged = {}
    merged.update(results)
    with open("/tmp/bench_train.json", "w") as f:
        json.dump(merged, f, indent=2)
    log("DONE " + json.dumps(results))


if __name__ == "__main__":
    main()
