"""Shared helpers for the measurement scripts in scripts/.

Centralizes the axon-safe timing conventions (see .claude/skills/verify):
- a scalar host fetch is the sync fence (block_until_ready does not
  synchronize over the axon tunnel);
- best-of-N over whole jitted calls, never per-op;
- for sub-50 ms ops, amortize the ~30-40 ms dispatch+fetch floor by
  repeating the op N times inside ONE jit via lax.fori_loop, passing the
  array as a traced ARGUMENT (a closure capture burns it into the
  executable as a constant).
"""

import time

import numpy as np


def make_logger(path):
    """Returns log(msg) that prints and appends timestamped lines to path."""

    def log(msg):
        line = f"[{time.strftime('%H:%M:%S')}] {msg}"
        print(line, flush=True)
        with open(path, "a") as f:
            f.write(line + "\n")

    return log


def _fence(out):
    """Host-fetch a scalar from fn's output to fence async dispatch."""
    if isinstance(out, tuple):
        out = out[0]
    return float(np.asarray(out))


def timeit(fn, *args, warmup=2, iters=6):
    """Best-of-N wall time of fn(*args); valid for ops >> the ~38 ms axon
    dispatch floor (e2e-scale calls)."""
    for _ in range(warmup):
        _fence(fn(*args))
    best = float("inf")
    for _ in range(iters):
        t0 = time.perf_counter()
        _fence(fn(*args))
        best = min(best, time.perf_counter() - t0)
    return best


def timeit_amortized(make_loop, n_reps, x, warmup=2, iters=4):
    """make_loop(n) -> jitted fn(x) chaining the op n times with a data
    dependency; returns seconds per single op. For sub-50 ms ops."""
    fn = make_loop(n_reps)
    for _ in range(warmup):
        _fence(fn(x))
    best = float("inf")
    for _ in range(iters):
        t0 = time.perf_counter()
        _fence(fn(x))
        best = min(best, time.perf_counter() - t0)
    return best / n_reps
