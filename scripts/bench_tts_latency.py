"""Online-arrival TTS serving: request latency under load, session vs lockstep.

The throughput A/B (bench_tts_serving.py) submits every request up front —
the scenario maximally favorable to lockstep batching. Production serving is
ONLINE: requests arrive over time and the metric users feel is completion
latency. This bench replays one Poisson arrival trace through two servers on
the same chip and model:

  * session:  LauraServingSession — a request is admitted the moment a slot
              is free and leaves the moment it finishes.
  * lockstep: batch-formation serving on decode_codec_batch — wait until B
              requests are queued or the oldest has waited `max_wait`, then
              decode the batch to its LONGEST row's cap (the standard static
              server; the reference itself is batch-1 with no KV cache and
              strictly worse, laura_model.py:501-548).

Offered load is set relative to the session's measured capacity
(~3.9k groups/s at 16 slots, artifacts/tts_serving_r5.json). Reports mean /
p50 / p90 completion latency + makespan. Writes /tmp/tts_latency.json.

Env: TL_N (64) requests, TL_B (16) slots, TL_LOAD (0.6) offered/capacity,
TL_WAIT (2.0) lockstep max batch wait s, TL_SEG (25) segment steps.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from scripts._benchlib import make_logger

log = make_logger("/tmp/tts_latency.log")

N_REQ = int(os.environ.get("TL_N", 64))
SLOTS = int(os.environ.get("TL_B", 16))
LOAD = float(os.environ.get("TL_LOAD", 0.6))
MAX_WAIT = float(os.environ.get("TL_WAIT", 2.0))
SEG = int(os.environ.get("TL_SEG", 25))
CAP_LO, CAP_HI, CAP_STEP = 50, 250, 50
LT = 40
CAPACITY_GROUPS_PER_S = 3900.0  # measured, artifacts/tts_serving_r5.json


def pct(xs, p):
    return float(np.percentile(np.asarray(xs), p))


def main():
    import jax
    import jax.numpy as jnp

    from funcodec_tpu.tasks.text2audio import build_laura_model
    from funcodec_tpu.models.tts_serving import LauraServingSession
    from scripts.bench_laura_decode import CONFIG

    model = build_laura_model(CONFIG)
    params = model.init(jax.random.PRNGKey(0))
    params = jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x,
        params,
    )
    rng = np.random.RandomState(0)
    caps = rng.choice(np.arange(CAP_LO, CAP_HI + 1, CAP_STEP), N_REQ)
    texts = [rng.randn(LT, CONFIG["input_size"]).astype(np.float32)
             for _ in range(N_REQ)]
    mean_cap = float(caps.mean())
    rate = LOAD * CAPACITY_GROUPS_PER_S / mean_cap  # requests/s
    gaps = rng.exponential(1.0 / rate, N_REQ)
    gaps[0] = 0.0
    arrivals = np.cumsum(gaps)
    log(f"workload: {N_REQ} reqs, Poisson {rate:.1f} req/s "
        f"(load {LOAD:.0%} of {CAPACITY_GROUPS_PER_S:.0f} groups/s), "
        f"caps {CAP_LO}-{CAP_HI}, horizon {arrivals[-1]:.1f}s")

    results = {"n_req": N_REQ, "slots": SLOTS, "load": LOAD,
               "req_per_s": rate, "max_wait_s": MAX_WAIT,
               "segment_steps": SEG}

    # ---- session server ----
    sess = LauraServingSession(
        model, params, num_slots=SLOTS, max_new=CAP_HI,
        prefix_budget=LT + 8, sampling=False, segment_steps=SEG,
    )
    sess.submit("warm", texts[0], jax.random.PRNGKey(1), max_new=CAP_LO)
    sess.drain()

    lat = {}
    t0 = time.perf_counter()
    nxt = 0
    done = {}
    while len(done) < N_REQ:
        now = time.perf_counter() - t0
        while nxt < N_REQ and arrivals[nxt] <= now:
            sess.submit(f"u{nxt}", texts[nxt],
                        jax.random.PRNGKey(100 + nxt),
                        max_new=int(caps[nxt]))
            nxt += 1
        if nxt < N_REQ and not any(
            u is not None for u in sess._slot_uid
        ) and not sess._queue:
            time.sleep(min(0.005, max(0.0, arrivals[nxt] - now)))
            continue
        for uid in sess.poll():
            done[uid] = time.perf_counter() - t0
    makespan = time.perf_counter() - t0
    for i in range(N_REQ):
        lat[i] = done[f"u{i}"] - arrivals[i]
    ls = sorted(lat.values())
    log(f"session: makespan {makespan:.2f}s, latency mean {np.mean(ls):.2f}s "
        f"p50 {pct(ls,50):.2f}s p90 {pct(ls,90):.2f}s max {ls[-1]:.2f}s")
    results["session"] = {
        "makespan_s": makespan, "lat_mean_s": float(np.mean(ls)),
        "lat_p50_s": pct(ls, 50), "lat_p90_s": pct(ls, 90),
        "lat_max_s": float(ls[-1]),
    }

    # ---- lockstep batch-formation server ----
    # warm every (B<=SLOTS, max cap bucket) signature off the clock: batches
    # can be partial when max_wait expires, so warm full-B at each cap and
    # the residual sizes seen in simulation are compiled on the fly is
    # avoided by always padding the batch to SLOTS rows (standard practice:
    # pad with dummy rows rather than compile per batch size).
    warm_text = jnp.asarray(np.stack(texts[:SLOTS])).astype(jnp.bfloat16)
    warm_tl = jnp.asarray([LT] * SLOTS)
    for bm in sorted(set(int(c) for c in caps)):
        t0c = time.perf_counter()
        model.decode_codec_batch(
            params, warm_text, warm_tl, max_length=bm, sampling=False,
            key=jax.random.PRNGKey(9),
        )
        log(f"warmed lockstep B={SLOTS} max_length={bm} "
            f"({time.perf_counter()-t0c:.0f}s)")

    lat2 = {}
    t0 = time.perf_counter()
    nxt = 0
    queue = []  # (idx, arrival)
    n_done = 0
    while n_done < N_REQ:
        now = time.perf_counter() - t0
        while nxt < N_REQ and arrivals[nxt] <= now:
            queue.append(nxt)
            nxt += 1
        fire = len(queue) >= SLOTS or (
            queue and now - arrivals[queue[0]] >= MAX_WAIT
        ) or (queue and nxt >= N_REQ)
        if not fire:
            time.sleep(0.005)
            continue
        batch = queue[:SLOTS]
        queue = queue[len(batch):]
        bmax = int(max(caps[j] for j in batch))
        tb = np.stack([texts[j] for j in batch])
        if len(batch) < SLOTS:  # pad to the compiled batch size
            tb = np.concatenate(
                [tb, np.repeat(tb[:1], SLOTS - len(batch), 0)], 0
            )
        model.decode_codec_batch(
            params, jnp.asarray(tb).astype(jnp.bfloat16),
            jnp.asarray([LT] * SLOTS), max_length=bmax, sampling=False,
            key=jax.random.PRNGKey(9),
        )
        fin = time.perf_counter() - t0
        for j in batch:
            lat2[j] = fin - arrivals[j]
        n_done += len(batch)
    makespan2 = time.perf_counter() - t0
    ls2 = sorted(lat2.values())
    log(f"lockstep: makespan {makespan2:.2f}s, latency mean {np.mean(ls2):.2f}s "
        f"p50 {pct(ls2,50):.2f}s p90 {pct(ls2,90):.2f}s max {ls2[-1]:.2f}s")
    results["lockstep"] = {
        "makespan_s": makespan2, "lat_mean_s": float(np.mean(ls2)),
        "lat_p50_s": pct(ls2, 50), "lat_p90_s": pct(ls2, 90),
        "lat_max_s": float(ls2[-1]),
    }
    results["latency_p50_improvement"] = (
        results["lockstep"]["lat_p50_s"] / results["session"]["lat_p50_s"]
    )
    results["latency_p90_improvement"] = (
        results["lockstep"]["lat_p90_s"] / results["session"]["lat_p90_s"]
    )
    with open("/tmp/tts_latency.json", "w") as f:
        json.dump(results, f, indent=2)
    log("DONE " + json.dumps(results))


if __name__ == "__main__":
    main()
