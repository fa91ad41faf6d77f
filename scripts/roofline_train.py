"""Training-step roofline + gen-turn decomposition (VERDICT r2 item 7).

Applies the serving methodology (XLA compiled cost analysis + measured step
times) to the GAN train step: reports train MFU / HBM utilization at the
recipe point, and decomposes the generator turn to explain the adv/
feat-match slice the round-2 profile left unexplained (139 ms of the 402 ms
fp32 gen turn).

Reads measured steps/s from /tmp/bench_train.json (scripts/bench_train.py)
when present; writes /tmp/roofline_train.json.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

LOG = "/tmp/roofline_train.log"
PEAK_TFLOPS_BF16 = 197.0  # v5e
PEAK_TFLOPS_FP32 = 197.0  # v5e fp32 matmuls multiply in bf16 at DEFAULT precision
PEAK_GBS = 819.0


def log(msg):
    line = f"[{time.strftime('%H:%M:%S')}] {msg}"
    print(line, flush=True)
    with open(LOG, "a") as f:
        f.write(line + "\n")


def cost(jitted, *args):
    an = jitted.lower(*args).compile().cost_analysis()
    if isinstance(an, list):
        an = an[0]
    return float(an.get("flops", 0.0)), float(an.get("bytes accessed", 0.0))


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    from __graft_entry__ import _build_flagship
    from funcodec_tpu.train.step import (
        cast_floating,
        create_gan_train_state,
        make_gan_train_step,
        make_optimizer,
    )

    # default: the recipe operating point; RL_B=64 reruns the decomposition
    # at the headline train-bench batch (VERDICT r3 weak 6)
    B, T = int(os.environ.get("RL_B", "16")), 40960
    model, disc = _build_flagship(kmeans_init=True)
    params, rvq_state = model.init(jax.random.PRNGKey(0))
    disc_params = disc.init(jax.random.PRNGKey(1))
    rvq_state = rvq_state.replace(
        inited=jnp.ones_like(rvq_state.inited),
        embed=jnp.asarray(
            np.random.RandomState(2).randn(*rvq_state.embed.shape), jnp.float32
        ),
        cluster_size=jnp.ones_like(rvq_state.cluster_size),
    )
    opt_g = make_optimizer(lr=3e-4, betas=(0.5, 0.9))
    opt_d = make_optimizer(lr=3e-4, betas=(0.5, 0.9))
    state = create_gan_train_state(params, disc_params, rvq_state, opt_g, opt_d)
    speech = jnp.asarray(
        np.random.RandomState(0).randn(B, T).astype(np.float32) * 0.1
    )
    rng = jax.random.PRNGKey(7)
    key = jax.random.PRNGKey(3)

    results = {"B": B, "T": T}

    # ---- full step cost (shared + twofwd, bf16) ----
    for tag, shared in (("shared", True), ("twofwd", False)):
        step = jax.jit(
            make_gan_train_step(
                model, disc, opt_g, opt_d,
                compute_dtype=jnp.bfloat16, shared_forward=shared,
            )
        )
        f, b = cost(step, state, {"speech": speech}, rng)
        results[f"step_{tag}"] = {"tflops": f / 1e12, "gbytes": b / 1e9}
        log(f"step bf16 {tag}: {f/1e12:.2f} TFLOP, {b/1e9:.1f} GB accessed, "
            f"AI={f/b:.0f} FLOP/B")

    # ---- gen-turn decomposition (fp32 to match the round-2 profile) ----
    # Each stage is a value_and_grad with the gradient consumed (no DCE).
    # The fp32 stages exceed the axon remote-compile buffer knee above
    # B~32-48 (artifacts/axon_repro_r3.json), so they are skippable for
    # large-batch utilization reruns: RL_DECOMP=0 keeps only the bf16
    # full-step costs + measured utilization.
    if os.environ.get("RL_DECOMP", "1") == "0":
        log("RL_DECOMP=0: skipping fp32 gen-turn decomposition")
        _finish(results, B)
        return
    c_speech = speech
    orig = speech.astype(jnp.float32)

    def consume(loss_and_grads):
        (loss, _), grads = loss_and_grads
        import optax

        return loss + optax.global_norm(grads)

    def recon_only(params):
        recon, aux = model._reconstruct(params, rvq_state, c_speech, key)
        loss = jnp.mean(jnp.abs(orig - recon.astype(jnp.float32)))
        return loss + aux["commit_loss"], aux

    def recon_mel(params):
        recon, aux = model._reconstruct(params, rvq_state, c_speech, key)
        recon = recon.astype(jnp.float32)
        loss = (
            jnp.mean(jnp.abs(orig - recon))
            + model._multi_spectral_loss(orig, recon)
        )
        return loss + aux["commit_loss"], aux

    def full_gen(params):
        return model.forward_generator(
            params, disc_params, disc, rvq_state, c_speech, key
        )

    def disc_turn(dp):
        recon, aux = model._reconstruct(
            jax.tree_util.tree_map(lax.stop_gradient, params),
            rvq_state, c_speech, key,
        )
        fake = lax.stop_gradient(recon.astype(jnp.float32))
        return model._discriminator_losses(
            dp, disc, orig, fake, jnp.float32(0.0), None
        )

    def disc_fwd_only(dp, x):
        outs = disc(dp, x)
        return sum(jnp.sum(jnp.abs(l.astype(jnp.float32))) for l, _ in outs)

    stages = {
        "gen_recon_l1_fwdbwd": jax.jit(
            lambda p: consume(jax.value_and_grad(recon_only, has_aux=True)(p))
        ),
        "gen_recon_l1_mel_fwdbwd": jax.jit(
            lambda p: consume(jax.value_and_grad(recon_mel, has_aux=True)(p))
        ),
        "gen_full_fwdbwd": jax.jit(
            lambda p: consume(jax.value_and_grad(full_gen, has_aux=True)(p))
        ),
    }
    for name, fn in stages.items():
        f, b = cost(fn, params)
        results[name] = {"tflops": f / 1e12, "gbytes": b / 1e9}
        log(f"{name}: {f/1e12:.2f} TFLOP, {b/1e9:.1f} GB")

    f, b = cost(
        jax.jit(lambda dp: consume(jax.value_and_grad(disc_turn, has_aux=True)(dp))),
        disc_params,
    )
    results["disc_turn_fwdbwd"] = {"tflops": f / 1e12, "gbytes": b / 1e9}
    log(f"disc_turn_fwdbwd: {f/1e12:.2f} TFLOP, {b/1e9:.1f} GB")

    f, b = cost(jax.jit(disc_fwd_only), disc_params, orig)
    results["disc_fwd_single"] = {"tflops": f / 1e12, "gbytes": b / 1e9}
    log(f"disc fwd (one input): {f/1e12:.2f} TFLOP, {b/1e9:.1f} GB")

    # adv + feat-match incremental cost = full gen turn minus recon+mel
    adv_fm_tf = results["gen_full_fwdbwd"]["tflops"] - results["gen_recon_l1_mel_fwdbwd"]["tflops"]
    adv_fm_gb = results["gen_full_fwdbwd"]["gbytes"] - results["gen_recon_l1_mel_fwdbwd"]["gbytes"]
    results["adv_featmatch_incremental"] = {"tflops": adv_fm_tf, "gbytes": adv_fm_gb}
    log(f"adv/feat-match incremental: {adv_fm_tf:.2f} TFLOP, {adv_fm_gb:.1f} GB "
        f"(disc fwd x2 + bwd-through-fake)")

    _finish(results, B)


def _finish(results, B):
    # ---- measured utilization (keys from scripts/bench_train.py at this B) ----
    bench = {}
    if os.path.exists("/tmp/bench_train.json"):
        bench = json.load(open("/tmp/bench_train.json"))
    for tag in ("shared", "twofwd"):
        k = f"bf16_{tag}_b{B}_steps_per_s"
        if k in bench:
            dt = 1.0 / bench[k]
            tf = results[f"step_{tag}"]["tflops"]
            gb = results[f"step_{tag}"]["gbytes"]
            results[f"util_bf16_{tag}_b{B}"] = {
                "ms_per_step": dt * 1e3,
                "mfu_pct": tf / dt / PEAK_TFLOPS_BF16 * 100,
                "hbm_util_pct": gb / dt / PEAK_GBS * 100,
            }
            log(f"bf16 {tag} B={B}: {dt*1e3:.0f} ms -> MFU "
                f"{tf/dt/PEAK_TFLOPS_BF16*100:.1f}%, HBM "
                f"{gb/dt/PEAK_GBS*100:.1f}% of peak")

    with open("/tmp/roofline_train.json", "w") as f:
        json.dump(results, f, indent=2)
    log("DONE")


if __name__ == "__main__":
    main()
