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
