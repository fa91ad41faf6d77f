"""Minimal repro + bisect for the axon remote-compile crashes (VERDICT r2 #8).

Three large-jit shapes kill the axon remote compile helper (HTTP 500 from
the tunnel service; the XLA program never comes back):

  - FreqCodec 2D (mag_phase gr8) encode+decode at B=256 (round 2)
  - Laura LM train step at B=28 fp32 (round 2)
  - GAN shared-forward train step fp32 B=64 (round 3, scripts/bench_train.py)

This script isolates each compile attempt in a subprocess (a helper crash
must not take the sweep down), bisects the failing batch dimension to the
pass/fail boundary, and records client-side HLO size stats for every
attempt so the failure can be correlated with program size. Results go to
/tmp/axon_repro.json; human log to /tmp/axon_repro.log.

Run ONLY on a quiet TPU (the service is shared with any in-flight run).

Usage:
  python scripts/axon_compile_repro.py            # orchestrate full sweep
  python scripts/axon_compile_repro.py gan --batch 64 --dtype float32 --shared 1
  python scripts/axon_compile_repro.py freq --batch 256
  python scripts/axon_compile_repro.py laura --batch 28
"""

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "scripts"))

LOG = "/tmp/axon_repro.log"
OUT = "/tmp/axon_repro.json"


def log(msg):
    line = f"[{time.strftime('%H:%M:%S')}] {msg}"
    print(line, flush=True)
    with open(LOG, "a") as f:
        f.write(line + "\n")


def _hlo_stats(lowered):
    txt = lowered.as_text()
    return {
        "hlo_chars": len(txt),
        # one stablehlo op per " = " binding line — proxy for program size
        "hlo_ops": txt.count(" = "),
    }


def _attempt(lowered):
    """Lower stats + compile; returns a result dict (never raises)."""
    stats = _hlo_stats(lowered)
    t0 = time.perf_counter()
    try:
        lowered.compile()
        stats.update(ok=True, compile_s=round(time.perf_counter() - t0, 1))
    except Exception as e:  # noqa: BLE001
        stats.update(
            ok=False,
            compile_s=round(time.perf_counter() - t0, 1),
            err=f"{type(e).__name__}: {str(e)[:300]}",
        )
    return stats


def case_gan(batch, dtype, shared):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from __graft_entry__ import _build_flagship
    from funcodec_tpu.train.step import (
        create_gan_train_state,
        make_gan_train_step,
        make_optimizer,
    )

    model, disc = _build_flagship(kmeans_init=True)
    params, rvq_state = model.init(jax.random.PRNGKey(0))
    disc_params = disc.init(jax.random.PRNGKey(1))
    opt_g = make_optimizer(lr=3e-4, betas=(0.5, 0.9))
    opt_d = make_optimizer(lr=3e-4, betas=(0.5, 0.9))
    step = jax.jit(
        make_gan_train_step(
            model, disc, opt_g, opt_d,
            compute_dtype=jnp.dtype(dtype), shared_forward=bool(shared),
        )
    )
    state = create_gan_train_state(params, disc_params, rvq_state, opt_g, opt_d)
    speech = jnp.zeros((batch, 40960), jnp.float32)
    return _attempt(step.lower(state, {"speech": speech}, jax.random.PRNGKey(7)))


def case_freq(batch):
    import jax
    import jax.numpy as jnp

    from bench_freqcodec import freq_config
    from funcodec_tpu.tasks.codec import build_codec_model

    model, _ = build_codec_model(freq_config(8))
    params, rvq_state = model.init(jax.random.PRNGKey(0))

    @jax.jit
    def run(params, state, x):
        out = model.inference(params, state, x, need_recon=True)
        return out["recon_speech"], out["code_indices"][0]

    x = jnp.zeros((batch, 160000), jnp.float32)
    return _attempt(run.lower(params, rvq_state, x))


def case_laura(batch, dtype="float32"):
    import jax
    import jax.numpy as jnp

    from bench_laura_decode import CONFIG
    from funcodec_tpu.tasks.text2audio import build_laura_model
    from funcodec_tpu.train.laura_trainer import LauraTrainer, LauraTrainerOptions

    model = build_laura_model(CONFIG)
    opts = LauraTrainerOptions(
        output_dir="/tmp/axon_repro_laura", max_epoch=1,
        train_dtype=dtype, scheduler=None,
    )
    trainer = LauraTrainer(model, opts)
    state = trainer.init_state(jax.random.PRNGKey(0))
    step = trainer._step_fn()
    Tc, Lt = 752, 48
    batch_d = {
        "text": jnp.zeros((batch, Lt, 512), jnp.float32),
        "text_lengths": jnp.full((batch,), Lt, jnp.int32),
        "codec": jnp.zeros((batch, Tc, 32), jnp.int32),
        "codec_lengths": jnp.full((batch,), Tc, jnp.int32),
    }
    return _attempt(step.lower(state, batch_d, jax.random.PRNGKey(7)))


def _run_sub(case, **kw):
    """One compile attempt in a fresh subprocess with a hard timeout."""
    args = [sys.executable, os.path.abspath(__file__), case]
    for k, v in kw.items():
        args += [f"--{k}", str(v)]
    t0 = time.perf_counter()
    try:
        p = subprocess.run(
            args, capture_output=True, text=True, timeout=900, cwd=REPO
        )
        tail = p.stdout.strip().splitlines()
        res = json.loads(tail[-1]) if tail else {}
        if p.returncode != 0 and "ok" not in res:
            res = {"ok": False,
                   "err": f"rc={p.returncode}: {p.stderr.strip()[-300:]}"}
    except subprocess.TimeoutExpired:
        res = {"ok": False, "err": "timeout 900s",
               "compile_s": round(time.perf_counter() - t0, 1)}
    except Exception as e:  # noqa: BLE001
        res = {"ok": False, "err": f"{type(e).__name__}: {str(e)[:200]}"}
    res["case"] = {"name": case, **kw}
    log(f"{case} {kw}: ok={res.get('ok')} ops={res.get('hlo_ops')} "
        f"chars={res.get('hlo_chars')} t={res.get('compile_s')}s "
        f"{res.get('err', '')}")
    return res


def orchestrate():
    results = []
    # 1. GAN shared fp32: bench showed B=32 passes, B=64 fails -> bisect;
    #    controls: two-forward fp32 B=64 (passes in bench) + shared bf16 B=64
    for b in (32, 48, 56, 64):
        results.append(_run_sub("gan", batch=b, dtype="float32", shared=1))
        if not results[-1].get("ok"):
            break
    results.append(_run_sub("gan", batch=64, dtype="float32", shared=0))
    results.append(_run_sub("gan", batch=64, dtype="bfloat16", shared=1))
    # 2. FreqCodec 2D: B=64 passes, B=256 fails -> probe the middle
    for b in (128, 192, 256):
        results.append(_run_sub("freq", batch=b))
        if not results[-1].get("ok"):
            break
    # 3. Laura train fp32: B=14 passes, B=28 fails -> probe the middle
    for b in (20, 24, 28):
        results.append(_run_sub("laura", batch=b))
        if not results[-1].get("ok"):
            break
    with open(OUT, "w") as f:
        json.dump(results, f, indent=2)
    log(f"DONE -> {OUT}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("case", nargs="?", default=None,
                    choices=[None, "gan", "freq", "laura"])
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--dtype", default="float32")
    ap.add_argument("--shared", type=int, default=1)
    args = ap.parse_args()
    if args.case is None:
        orchestrate()
        return
    if args.case == "gan":
        res = case_gan(args.batch, args.dtype, args.shared)
    elif args.case == "freq":
        res = case_freq(args.batch)
    else:
        res = case_laura(args.batch, args.dtype)
    print(json.dumps(res))


if __name__ == "__main__":
    main()
