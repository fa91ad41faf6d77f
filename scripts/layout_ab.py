"""A/B: NWC vs NCW conv layouts for the SEANet encoder stage shapes.

Hypothesis from the roofline: with (B, T, C) channels-last, C sits on the
128-lane axis, so C=32/64 stages pad 4x/2x in HBM — traffic waste on a
bandwidth-bound model. (B, C, T) puts T on lanes (no padding) and C on
sublanes (pad 32->32, fine).

Times a representative encoder conv chain (stage convs + resblocks at the
flagship ds320 shapes, B=256, 10 s) in both layouts, bf16.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

LOG = "/tmp/layout_ab.log"


def log(msg):
    line = f"[{time.strftime('%H:%M:%S')}] {msg}"
    print(line, flush=True)
    with open(LOG, "a") as f:
        f.write(line + "\n")


# (C_in, C_out, k, stride, T_in) for the ds320 encoder:
# init conv, then per stage [res k3, res k1, down k2*r stride r] with C doubling
LAYERS = []
T = 160000
C = 32
LAYERS.append((1, C, 7, 1, T))
for r in (2, 4, 5, 8):  # reversed ratios
    LAYERS.append((C, C // 2, 3, 1, T))
    LAYERS.append((C // 2, C, 1, 1, T))
    LAYERS.append((C, 2 * C, 2 * r, r, T))
    C, T = 2 * C, T // r
LAYERS.append((C, 128, 7, 1, T))


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    B = 256
    log(f"devices {jax.devices()}")

    def make_chain(layout):
        weights = []
        rng = np.random.RandomState(0)
        for cin, cout, k, s, _t in LAYERS:
            w = rng.randn(k, cin, cout).astype(np.float32) * 0.05
            weights.append(jnp.asarray(w, jnp.bfloat16))

        if layout == "NWC":
            def chain(x, ws):
                for (cin, cout, k, s, _t), w in zip(LAYERS, ws):
                    pad = (k - s)
                    x = lax.conv_general_dilated(
                        x, w, (s,), [(pad // 2 + pad % 2, pad // 2)],
                        dimension_numbers=("NWC", "WIO", "NWC"),
                    )
                    x = jax.nn.elu(x)
                return jnp.sum(jnp.abs(x.astype(jnp.float32)))
            x0 = jnp.asarray(
                np.random.RandomState(1).randn(B, 160000, 1).astype(np.float32)
            ).astype(jnp.bfloat16)
        else:
            def chain(x, ws):
                for (cin, cout, k, s, _t), w in zip(LAYERS, ws):
                    pad = (k - s)
                    x = lax.conv_general_dilated(
                        x, jnp.transpose(w, (2, 1, 0)), (s,),
                        [(pad // 2 + pad % 2, pad // 2)],
                        dimension_numbers=("NCW", "OIW", "NCW"),
                    )
                    x = jax.nn.elu(x)
                return jnp.sum(jnp.abs(x.astype(jnp.float32)))
            x0 = jnp.asarray(
                np.random.RandomState(1).randn(B, 1, 160000).astype(np.float32)
            ).astype(jnp.bfloat16)
        return jax.jit(chain), x0, weights

    results = {}
    for layout in ("NWC", "NCW"):
        fn, x0, ws = make_chain(layout)
        for _ in range(2):
            float(fn(x0, ws))
        best = float("inf")
        for _ in range(6):
            t0 = time.perf_counter()
            float(fn(x0, ws))
            best = min(best, time.perf_counter() - t0)
        results[layout] = best
        log(f"{layout}: {best*1e3:.1f} ms")

    with open("/tmp/layout_ab.json", "w") as f:
        json.dump(results, f)
    log("DONE " + json.dumps(results))


if __name__ == "__main__":
    main()
