"""Phase breakdown of the GAN training step on real TPU.

Training runs ~66x slower per audio-second than inference (94 vs 6200
audio_s/s) — far more than fwd/bwd turn-count accounting explains. This
times the step's constituent phases as separate jitted calls at the recipe
operating point (B=32 x 40960, fp32 and bf16) to find the dominator:

  gen_fwd       generator forward (enc+rvq+dec+losses incl disc adv pass)
  gen_grad      value_and_grad of the same
  disc_grad     discriminator turn value_and_grad
  convs_grad    enc+dec conv stacks only, L1 loss (no RVQ/disc/mel)
  mel_grad      L1 + 6-scale mel-spectral loss only, grad wrt recon
  disc_fwd      discriminator forward on real+fake
  full_step     the actual make_gan_train_step step (reference number)

Appends to /tmp/profile_train.log.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

LOG = "/tmp/profile_train.log"


from _benchlib import make_logger  # noqa: E402

log = make_logger(LOG)


from _benchlib import timeit  # noqa: E402


def main():
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _build_flagship
    from funcodec_tpu.train.step import (
        cast_floating,
        create_gan_train_state,
        make_gan_train_step,
        make_optimizer,
    )

    log(f"devices: {jax.devices()}")
    model, disc = _build_flagship(kmeans_init=True)
    params, rvq_state = model.init(jax.random.PRNGKey(0))
    disc_params = disc.init(jax.random.PRNGKey(1))

    B, T = 32, 40960
    speech = jnp.asarray(
        np.random.RandomState(0).randn(B, T).astype(np.float32) * 0.1
    )
    # steady-state RVQ buffers: every codebook inited (with dropout, layers
    # init lazily on first activity; timing-wise only the branch matters)
    rvq_state = rvq_state.replace(
        inited=jnp.ones_like(rvq_state.inited),
        embed=jnp.asarray(
            np.random.RandomState(9).randn(*rvq_state.embed.shape), jnp.float32
        ),
        cluster_size=jnp.ones_like(rvq_state.cluster_size),
    )
    results = {}

    for tag, dtype in (("fp32", None), ("bf16", jnp.bfloat16)):
        p = cast_floating(params, dtype)
        dp = cast_floating(disc_params, dtype)
        sp = cast_floating(speech, dtype)

        def rec(name, dt):
            results[f"{tag}_{name}"] = dt
            log(f"{tag} {name}: {dt*1e3:.1f} ms")

        # 1. generator forward (full losses)
        @jax.jit
        def gen_fwd(p, dp, st, sp):
            loss, out = model.forward_generator(
                p, dp, disc, st, sp, jax.random.PRNGKey(3)
            )
            return loss

        rec("gen_fwd", timeit(gen_fwd, p, dp, rvq_state, sp))

        def grad_norm_sum(grads):
            import jax as _jax

            return sum(
                jnp.sum(jnp.abs(g.astype(jnp.float32)))
                for g in _jax.tree_util.tree_leaves(grads)
            )

        # 2. generator grad (grads must be consumed or XLA DCEs the backward)
        @jax.jit
        def gen_grad(p, dp, st, sp):
            def loss_fn(p):
                loss, out = model.forward_generator(
                    p, dp, disc, st, sp, jax.random.PRNGKey(3)
                )
                return loss

            val, grads = jax.value_and_grad(loss_fn)(p)
            return val + 0.0 * grad_norm_sum(grads)

        rec("gen_grad", timeit(gen_grad, p, dp, rvq_state, sp))

        # 2b. reconstruct-only grad: enc + RVQ(train) + dec, L1 loss
        @jax.jit
        def recon_grad(p, st, sp):
            def loss_fn(p):
                recon, aux = model._reconstruct(
                    p, st, sp, jax.random.PRNGKey(3)
                )
                n = min(recon.shape[1], sp.shape[1])
                return jnp.mean(
                    jnp.abs(recon[:, :n].astype(jnp.float32)
                            - sp[:, :n].astype(jnp.float32))
                )

            val, grads = jax.value_and_grad(loss_fn)(p)
            return val + 0.0 * grad_norm_sum(grads)

        rec("recon_grad", timeit(recon_grad, p, rvq_state, sp))

        # 2c. RVQ training forward alone on the encoder output
        @jax.jit
        def rvq_fwd(p, st, sp):
            emb = model.encoder(p["encoder"], sp)
            q, codes, commit, subq, new_state = model.quantizer.train_forward(
                p["quantizer"], st, emb, jax.random.PRNGKey(3)
            )
            return jnp.sum(jnp.abs(q.astype(jnp.float32)))

        try:
            rec("enc_plus_rvq_fwd", timeit(rvq_fwd, p, rvq_state, sp))
        except Exception as e:  # noqa: BLE001
            log(f"{tag} enc_plus_rvq_fwd: SKIP {type(e).__name__}: {str(e)[:120]}")

        # 3. discriminator grad
        @jax.jit
        def disc_grad(p, dp, st, sp):
            def loss_fn(dp):
                loss, out = model.forward_discriminator(
                    p, dp, disc, st, sp, jax.random.PRNGKey(3),
                    jnp.float32(0.0),
                )
                return loss

            val, grads = jax.value_and_grad(loss_fn)(dp)
            return val + 0.0 * grad_norm_sum(grads)

        rec("disc_grad", timeit(disc_grad, p, dp, rvq_state, sp))

        # 4. conv stacks only: enc+dec, L1 loss
        @jax.jit
        def convs_grad(p, sp):
            def loss_fn(p):
                emb = model.encoder(p["encoder"], sp)
                rec_ = model.decoder(p["decoder"], emb)
                n = min(rec_.shape[1], sp.shape[1])
                return jnp.mean(
                    jnp.abs(rec_[:, :n, 0].astype(jnp.float32)
                            - sp[:, :n].astype(jnp.float32))
                )

            val, grads = jax.value_and_grad(loss_fn)(
                {"encoder": p["encoder"], "decoder": p["decoder"]}
            )
            return val + 0.0 * grad_norm_sum(grads)

        rec("convs_grad", timeit(convs_grad, p, sp))

        # 5. recon losses only (L1 + 6-scale mel), grad wrt recon
        @jax.jit
        def mel_grad(sp, fake):
            def loss_fn(fake):
                o = sp.astype(jnp.float32)
                f = fake.astype(jnp.float32)
                return jnp.mean(jnp.abs(o - f)) + model._multi_spectral_loss(o, f)

            val, g = jax.value_and_grad(loss_fn)(fake)
            return val + 0.0 * jnp.sum(jnp.abs(g.astype(jnp.float32)))

        rec("mel_grad", timeit(mel_grad, sp, sp * 0.5))

        # 6. discriminator forward on real+fake
        @jax.jit
        def disc_fwd(dp, sp):
            outs_r = disc(dp, sp)
            outs_f = disc(dp, sp * 0.5)
            return sum(
                jnp.sum(l.astype(jnp.float32)) for l, _ in outs_r + outs_f
            )

        rec("disc_fwd", timeit(disc_fwd, dp, sp))

        # 7. full step
        opt_g = make_optimizer(lr=3e-4, betas=(0.5, 0.9))
        opt_d = make_optimizer(lr=3e-4, betas=(0.5, 0.9))
        step = jax.jit(
            make_gan_train_step(model, disc, opt_g, opt_d, compute_dtype=dtype)
        )
        state = create_gan_train_state(params, disc_params, rvq_state, opt_g, opt_d)

        def run_step(state, batch, rng):
            s, stats = step(state, batch, rng)
            return stats["generator_loss"]

        rec(
            "full_step",
            timeit(run_step, state, {"speech": speech}, jax.random.PRNGKey(7)),
        )

    with open("/tmp/profile_train.json", "w") as f:
        json.dump(results, f, indent=2)
    log("DONE " + json.dumps(results))


if __name__ == "__main__":
    main()
