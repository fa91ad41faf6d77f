"""Microbenchmark: is the MS-STFT disc tower's 328 ms/step conv time a
32-channel lane-padding problem?

Trace artifacts/trace_train_b64_r5.json attributes 56% of the B=64 train
step to discriminators.py:69 convs running at 200 GB/s / <=21% MXU, with
C in {2,32} underfilling the 128-lane MXU contraction. The candidate fix
is a frequency space-to-depth: block adjacent F bins into channels so the
tower runs at 64 (block=2) or 128 (block=4) channels. This probe times the
raw lax.conv_general_dilated calls at the real shapes before we build the
full (exactness-preserving) tower transform:

  A  conv1 as-is:      x (B,T,513,32)  W (3,9,32,32)  stride (1,2) dil (d,1)
  B  conv1 blocked2:   x (B,T,261,64)  W (3,6,64,64)  stride (1,2)  [1.33x FLOPs]
  C  conv1 blocked4:   x (B,T,132,128) W (3,5,128,128) stride (1,2) [2.2x FLOPs]
  D  conv0 as-is:      x (B,T,513,2)   W (3,9,2,32)   stride (1,1)
  E  conv0 blocked2:   x (B,T,261,4)   W (3,5,4,64)   stride (1,1)
  F  concat probe:     one conv at 2B vs two convs at B (real+fake batching)

Each timed fwd-only and fwd+bwd (grad wrt input and weights), reps
amortized inside one jit via lax.fori_loop (NOTES_ROUND2: the tunnel adds
~38 ms per dispatched call; never time single sub-50ms calls).

Usage: python scripts/disc_conv_probe.py [--batch 64] [--t 160] [--reps 20]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

LOG = "/tmp/disc_conv_probe.log"


def log(msg):
    line = f"[{time.strftime('%H:%M:%S')}] {msg}"
    print(line, flush=True)
    with open(LOG, "a") as f:
        f.write(line + "\n")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--t", type=int, default=160)  # frames at n_fft=1024/hop=256, 2.56 s
    ap.add_argument("--reps", type=int, default=20)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from jax import lax

    B, T, reps = args.batch, args.t, args.reps
    rng = np.random.RandomState(0)

    def conv_fn(stride, dil, pad):
        def f(x, w):
            return lax.conv_general_dilated(
                x, w, window_strides=stride, padding=pad,
                rhs_dilation=dil, dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
        return f

    def timed(name, f, x, w, bwd):
        """Time reps of f (optionally fwd+bwd) amortized inside one jit."""
        # epsilon-couple each iteration to the carry so XLA can neither
        # constant-fold (0.0 *) nor hoist the loop-invariant conv (LICM)
        eps = jnp.asarray(1e-8)
        if bwd:
            g = jax.grad(lambda x, w: jnp.sum(f(x, w).astype(jnp.float32)), argnums=(0, 1))

            def body(i, carry):
                x, w, acc = carry
                dx, dw = g(x, w)
                # keep BOTH grads alive: dw perturbs w, dx feeds the carry
                return (x, w + (eps * acc).astype(w.dtype) * dw[:1, :1, :1, :1],
                        acc + jnp.float32(1.0)
                        + dx[0, 0, 0, 0].astype(jnp.float32) * jnp.float32(1e-8))
        else:
            def body(i, carry):
                x, w, acc = carry
                y = f(x, w + (eps * acc).astype(w.dtype))
                return (x, w, acc + jnp.sum(y[0, 0, 0, :1].astype(jnp.float32)))

        @jax.jit
        def run(x, w):
            return lax.fori_loop(0, reps, body, (x, w, jnp.float32(0.0)))

        out = run(x, w)  # compile + warm
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        out = run(x, w)
        jax.block_until_ready(out)
        ms = (time.perf_counter() - t0) * 1e3 / reps
        log(f"  {name}: {ms:.3f} ms/call ({'fwd+bwd' if bwd else 'fwd'})")
        return ms

    results = {"batch": B, "t_frames": T, "reps": reps}
    dt = jnp.bfloat16

    # A/B/C: the strided (3,9) dil-time conv at the three block factors.
    # Logical output bins 257 in every variant; FLOPs scale 1 / 1.33 / 2.2.
    for dil_t in (1, 2, 4):
        pt = dil_t  # (3-1)*dil_t//2
        shapes = {
            "as_is": ((B, T, 513, 32), (3, 9, 32, 32), (1, 2), [(pt, pt), (4, 4)]),
            "blocked2": ((B, T, 261, 64), (3, 6, 64, 64), (1, 2), [(pt, pt), (2, 3)]),
            "blocked4": ((B, T, 132, 128), (3, 5, 128, 128), (1, 2), [(pt, pt), (1, 2)]),
        }
        for name, (xs, ws, stride, pad) in shapes.items():
            x = jnp.asarray(rng.randn(*xs), dt)
            w = jnp.asarray(rng.randn(*ws) * 0.05, dt)
            f = conv_fn(stride, ((dil_t, 1)), pad)
            key = f"conv1_d{dil_t}_{name}"
            results[key + "_fwd_ms"] = timed(key, f, x, w, bwd=False)
            results[key + "_fwdbwd_ms"] = timed(key, f, x, w, bwd=True)

    # D/E: the first conv (C_in=2), stride 1
    for name, (xs, ws, stride, pad) in {
        "as_is": ((B, T, 513, 2), (3, 9, 2, 32), (1, 1), [(1, 1), (4, 4)]),
        "blocked2": ((B, T, 261, 4), (3, 5, 4, 64), (1, 1), [(1, 1), (2, 2)]),
    }.items():
        x = jnp.asarray(rng.randn(*xs), dt)
        w = jnp.asarray(rng.randn(*ws) * 0.05, dt)
        f = conv_fn(stride, (1, 1), pad)
        key = f"conv0_{name}"
        results[key + "_fwd_ms"] = timed(key, f, x, w, bwd=False)
        results[key + "_fwdbwd_ms"] = timed(key, f, x, w, bwd=True)

    # F: real+fake as one 2B conv vs two B convs
    x2 = jnp.asarray(rng.randn(2 * B, T, 513, 32), dt)
    w = jnp.asarray(rng.randn(3, 9, 32, 32) * 0.05, dt)
    f = conv_fn((1, 2), (1, 1), [(1, 1), (4, 4)])
    results["concat_2B_fwd_ms"] = timed("concat_2B", f, x2, w, bwd=False)

    def two_calls(x, w):
        a = f(x[:B], w)
        b = f(x[B:], w)
        return a + b

    results["two_calls_B_fwd_ms"] = timed("two_calls_B", two_calls, x2, w, bwd=False)

    log(json.dumps(results))
    with open("/tmp/disc_conv_probe.json", "w") as fh:
        json.dump(results, fh, indent=1)


if __name__ == "__main__":
    main()
