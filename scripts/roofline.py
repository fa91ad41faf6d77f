"""Roofline analysis of the flagship inference at the bench point.

Pulls XLA's compiled cost analysis (flops, bytes accessed) for the
end-to-end encode+decode jit and per-phase jits at B=256 x 10 s bf16,
computes effective TF/s and HBM GB/s vs v5e peaks (197 TF/s bf16,
819 GB/s HBM), and writes /tmp/roofline.json.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

LOG = "/tmp/roofline.log"
PEAK_TFLOPS = 197.0  # v5e bf16
PEAK_GBS = 819.0  # v5e HBM


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

    import funcodec_tpu.quant.rvq as rvq_mod
    from __graft_entry__ import _build_flagship

    rvq_mod.PALLAS_RVQ = True
    B, SECONDS, SR = 256, 10, 16000
    T = SECONDS * SR

    model, _ = _build_flagship(kmeans_init=False)
    params, rvq_state = model.init(jax.random.PRNGKey(0))
    to_bf16 = lambda tree: jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x, tree
    )
    params = to_bf16(params)
    speech = jnp.asarray(
        np.random.RandomState(0).randn(B, T).astype(np.float32) * 0.1
    ).astype(jnp.bfloat16)

    @jax.jit
    def e2e(params, state, speech):
        out = model.inference(params, state, speech, need_recon=True)
        return (
            jnp.sum(jnp.abs(out["recon_speech"].astype(jnp.float32))),
            out["code_indices"][0],
        )

    @jax.jit
    def enc_only(params, speech):
        emb = model.encoder(params["encoder"], speech)
        return jnp.sum(jnp.abs(emb.astype(jnp.float32))), emb

    results = {}
    f, b = cost(e2e, params, rvq_state, speech)
    results["e2e"] = {"tflops": f / 1e12, "gbytes": b / 1e9}
    log(f"e2e: {f/1e12:.2f} TFLOP, {b/1e9:.1f} GB accessed")

    f, b = cost(enc_only, params, speech)
    results["encoder"] = {"tflops": f / 1e12, "gbytes": b / 1e9}
    log(f"encoder: {f/1e12:.2f} TFLOP, {b/1e9:.1f} GB accessed")

    # measured phase times from the profile run
    try:
        with open("/tmp/prof_phase.json") as fjson:
            phase = json.load(fjson)
    except Exception:
        phase = {}
    results["measured"] = phase

    if phase:
        dt = phase.get("e2e_bf16_pallas")
        e = results["e2e"]
        results["derived"] = {
            "achieved_tflops": e["tflops"] / dt,
            "mfu_pct": 100.0 * e["tflops"] / dt / PEAK_TFLOPS,
            "achieved_gbs": e["gbytes"] / dt,
            "hbm_util_pct": 100.0 * e["gbytes"] / dt / PEAK_GBS,
            "compute_roofline_ms": 1e3 * e["tflops"] / PEAK_TFLOPS,
            "hbm_roofline_ms": 1e3 * e["gbytes"] / PEAK_GBS,
            "measured_ms": 1e3 * dt,
        }
        log(json.dumps(results["derived"], indent=2))

    with open("/tmp/roofline.json", "w") as fjson:
        json.dump(results, fjson, indent=2)
    log("DONE")


if __name__ == "__main__":
    main()
