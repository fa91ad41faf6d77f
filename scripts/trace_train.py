"""Trace-backed decomposition of the B=64 bf16 train-step residual.

VERDICT r4 weak #4: the shared GAN step at B=64 bf16 measures 583 ms against
a 363 ms HBM floor (artifacts/roofline_train_b64_r4.json) and the 1.6x
residual was *adjudicated* ("dispatch gaps + RVQ scan serial latency"), never
shown in a trace. This captures a jax.profiler trace of N consecutive steps
at exactly the roofline's operating point and decomposes device time into
named interval groups straight from the XLA-op timeline:

  by_hlo_category   conv fusions / loop (elementwise) fusions / reduces ...
  by_source         funcodec_tpu file:line attribution (from op metadata),
                    each with time, HBM bytes_accessed, achieved GB/s
  by_phase          fwd vs bwd (jvp vs transpose(jvp) in the tf_op path)
  device_idle       wall minus exact busy union: dispatch gaps + host time

Writes artifacts/trace_train_b64_r5.json (merge) and leaves the raw trace
under --out for Perfetto. Usage:
  python scripts/trace_train.py [--batch 64] [--steps 5] [--out /tmp/trace_b64]
"""

import argparse
import glob
import gzip
import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

LOG = "/tmp/trace_train.log"


def log(msg):
    line = f"[{time.strftime('%H:%M:%S')}] {msg}"
    print(line, flush=True)
    with open(LOG, "a") as f:
        f.write(line + "\n")




def capture(args):
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _build_flagship
    from funcodec_tpu.train.step import (
        create_gan_train_state, make_gan_train_step, make_optimizer,
    )

    model, disc = _build_flagship(kmeans_init=True)
    params, rvq_state = model.init(jax.random.PRNGKey(0))
    disc_params = disc.init(jax.random.PRNGKey(1))
    rvq_state = rvq_state.replace(
        inited=jnp.ones_like(rvq_state.inited),
        embed=jnp.asarray(
            np.random.RandomState(2).randn(*rvq_state.embed.shape),
            jnp.float32),
        cluster_size=jnp.ones_like(rvq_state.cluster_size),
    )
    opt_g = make_optimizer(lr=3e-4, betas=(0.5, 0.9))
    opt_d = make_optimizer(lr=3e-4, betas=(0.5, 0.9))
    state = create_gan_train_state(params, disc_params, rvq_state, opt_g, opt_d)
    step = jax.jit(make_gan_train_step(
        model, disc, opt_g, opt_d, compute_dtype=jnp.bfloat16,
        shared_forward=True))
    B, T = args.batch, 40960
    speech = jnp.asarray(
        np.random.RandomState(0).randn(B, T).astype(np.float32) * 0.1)
    rng = jax.random.PRNGKey(7)

    t0 = time.perf_counter()
    state, stats = step(state, {"speech": speech}, rng)
    float(stats["generator_loss"])
    log(f"compile+first step: {time.perf_counter()-t0:.0f}s")
    # steady-state wall (stats fetched once at the end, like stats_interval)
    t0 = time.perf_counter()
    for _ in range(args.steps):
        state, stats = step(state, {"speech": speech}, rng)
    float(stats["generator_loss"])
    wall_per_step = (time.perf_counter() - t0) / args.steps
    log(f"steady: {wall_per_step*1e3:.1f} ms/step (B={B})")

    jax.profiler.start_trace(args.out)
    t0 = time.perf_counter()
    for _ in range(args.steps):
        state, stats = step(state, {"speech": speech}, rng)
    float(stats["generator_loss"])
    traced_wall = time.perf_counter() - t0
    jax.profiler.stop_trace()
    log(f"traced {args.steps} steps in {traced_wall:.2f}s -> {args.out}")
    return wall_per_step, traced_wall


def decompose(args, wall_per_step, traced_wall):
    paths = sorted(glob.glob(
        os.path.join(args.out, "plugins/profile/*/*.trace.json.gz")))
    if not paths:
        log("NO trace.json.gz found; dirs: "
            + str(glob.glob(os.path.join(args.out, "plugins/profile/*/*"))))
        return None
    with gzip.open(paths[-1], "rt") as f:
        trace = json.load(f)
    events = trace.get("traceEvents", [])
    pid_names, tid_names = {}, {}
    for e in events:
        if e.get("ph") == "M":
            if e.get("name") == "process_name":
                pid_names[e["pid"]] = e["args"].get("name", "")
            elif e.get("name") == "thread_name":
                tid_names[(e["pid"], e["tid"])] = e["args"].get("name", "")
    log(f"processes: {pid_names}")
    # the finest device lane is "XLA Ops" (one complete event per executed
    # HLO); its events carry bytes_accessed / model_flops / source metadata
    ops = [e for e in events
           if e.get("ph") == "X" and "dur" in e
           and tid_names.get((e["pid"], e["tid"])) == "XLA Ops"]
    if not ops:
        log("no 'XLA Ops' lane found; lanes: " + str(set(tid_names.values())))
        return None
    n_steps = args.steps
    tot_t = tot_b = tot_f = 0
    by_src, b_src = {}, {}
    by_cat, b_cat = {}, {}
    by_phase = {}
    intervals = []
    for e in ops:
        a = e.get("args") or {}
        t = e["dur"]
        b = int(a.get("bytes_accessed", 0))
        fl = int(a.get("model_flops", 0) or 0)
        tot_t += t
        tot_b += b
        tot_f += fl
        intervals.append((e["ts"], e["ts"] + t))
        src = re.sub(r"^/root/repo/", "", a.get("source", "?"))
        by_src[src] = by_src.get(src, 0) + t
        b_src[src] = b_src.get(src, 0) + b
        cat = a.get("hlo_category", "?")
        by_cat[cat] = by_cat.get(cat, 0) + t
        b_cat[cat] = b_cat.get(cat, 0) + b
        tf = a.get("tf_op", "")
        ph = "bwd" if "transpose(" in tf else "fwd"
        by_phase[ph] = by_phase.get(ph, 0) + t
    # exact device-busy union (ops can overlap across parallel cores/streams)
    intervals.sort()
    union, cur_s, cur_e = 0, None, None
    for s, e in intervals:
        if cur_e is None or s > cur_e:
            if cur_e is not None:
                union += cur_e - cur_s
            cur_s, cur_e = s, e
        else:
            cur_e = max(cur_e, e)
    if cur_e is not None:
        union += cur_e - cur_s
    total_span = intervals[-1][1] - intervals[0][0] if intervals else 0
    ms = lambda us: round(us / 1e3 / n_steps, 2)
    res = {
        "batch": args.batch,
        "steps_traced": n_steps,
        "wall_ms_per_step": round(wall_per_step * 1e3, 1),
        "traced_wall_ms_per_step": round(traced_wall / n_steps * 1e3, 1),
        "device_busy_union_ms_per_step": ms(union),
        "device_idle_ms_per_step": round(
            wall_per_step * 1e3 - union / 1e3 / n_steps, 1),
        "ops_per_step": round(len(ops) / n_steps),
        "hbm_bytes_gb_per_step": round(tot_b / n_steps / 1e9, 2),
        "model_tflops_per_step": round(tot_f / n_steps / 1e12, 2),
        "achieved_hbm_gb_per_s": round(tot_b / tot_t / 1e3, 0) if tot_t else 0,
        "by_hlo_category_ms_per_step": {
            k: ms(v) for k, v in sorted(by_cat.items(), key=lambda kv: -kv[1])},
        "by_phase_ms_per_step": {k: ms(v) for k, v in by_phase.items()},
        "by_source_ms_per_step": {
            k: {"ms": ms(v), "gb": round(b_src[k] / n_steps / 1e9, 2),
                "gb_per_s": round(b_src[k] / v / 1e3, 0) if v else 0}
            for k, v in sorted(by_src.items(), key=lambda kv: -kv[1])[:20]},
    }
    return res


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--steps", type=int, default=5)
    ap.add_argument("--out", default="/tmp/trace_b64")
    ap.add_argument("--json", default="artifacts/trace_train_b64_r5.json")
    ap.add_argument("--parse-only", action="store_true",
                    help="skip capture; parse an existing --out dir")
    ap.add_argument("--wall-ms", type=float, default=0.0,
                    help="steady wall ms/step for --parse-only")
    args = ap.parse_args()
    if args.parse_only:
        wall, traced = args.wall_ms / 1e3, args.wall_ms / 1e3 * args.steps
    else:
        wall, traced = capture(args)
    res = decompose(args, wall, traced)
    if res is None:
        sys.exit(1)
    os.makedirs(os.path.dirname(args.json), exist_ok=True)
    with open(args.json, "w") as f:
        json.dump(res, f, indent=2)
    log("DONE " + json.dumps(
        {k: v for k, v in res.items() if not isinstance(v, dict)}))
    log("by_source: " + json.dumps(res["by_source_ms_per_step"]))


if __name__ == "__main__":
    main()
