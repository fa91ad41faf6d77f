"""Test harness config: CPU backend with 8 virtual devices, fp32 matmuls.

Multi-device sharding tests run on an emulated 8-device CPU mesh
(xla_force_host_platform_device_count), which the PyTorch reference cannot do
(it needs real GPUs per process). Must run before jax is imported anywhere.
"""

import os

# NOTE: this environment's sitecustomize imports jax at interpreter startup,
# so env vars alone are too late — use runtime config updates (safe as long
# as no backend has been initialized yet, which sitecustomize does not do).
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
jax.config.update("jax_default_matmul_precision", "highest")
assert jax.devices()[0].platform == "cpu", jax.devices()

import sys  # noqa: E402

REFERENCE_ROOT = "/root/reference"
if REFERENCE_ROOT not in sys.path:
    sys.path.insert(0, REFERENCE_ROOT)

import pytest  # noqa: E402


@pytest.fixture()
def torch():
    """Per-test torch with a fixed seed: each test's RNG stream must be
    independent of which other tests ran before it (a session-scoped seed
    made parity tests flip on near-tie argmaxes whenever a new torch-
    consuming test was added earlier in the collection order)."""
    import torch as _torch

    _torch.manual_seed(0)
    return _torch
