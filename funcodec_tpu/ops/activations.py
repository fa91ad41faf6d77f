"""Activation functions used across the codec stacks.

Behavioral reference: funcodec/modules/activations.py:5-30 (snake),
plus the torch activations reachable through get_activation (ELU, LeakyReLU,
ReLU, Tanh, GELU, ...).
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp


def snake(x: jnp.ndarray, alpha: jnp.ndarray) -> jnp.ndarray:
    """x + (1/(alpha+1e-9)) * sin^2(alpha*x), per-channel learnable alpha.

    Reference: activations.py:6-13. `alpha` broadcasts over (B, T, C) with
    shape (C,) — channels-last here vs. the reference's (1, C, 1).
    """
    s = jnp.sin(alpha * x)
    return x + s * s / (alpha + 1e-9)


def init_snake(channels: int) -> Dict[str, jnp.ndarray]:
    return {"alpha": jnp.ones((channels,), jnp.float32)}


def elu(x: jnp.ndarray, alpha: float = 1.0) -> jnp.ndarray:
    return jax.nn.elu(x, alpha)


def leaky_relu(x: jnp.ndarray, negative_slope: float = 0.01) -> jnp.ndarray:
    return jax.nn.leaky_relu(x, negative_slope)


_ACTS = {
    "elu": elu,
    "relu": jax.nn.relu,
    "leakyrelu": leaky_relu,
    "leaky_relu": leaky_relu,
    "gelu": jax.nn.gelu,
    "tanh": jnp.tanh,
    "sigmoid": jax.nn.sigmoid,
    "silu": jax.nn.silu,
    "swish": jax.nn.silu,
    "prelu": None,  # needs params; handled by the caller
    "snake": None,  # needs params; handled by the caller
}


def get_activation_fn(name: str, **kwargs):
    """Resolve an activation by (torch) name; mirrors activations.py:24-30.

    Returns a pure fn of x. Parametric activations (snake) are handled by the
    layer modules, which carry their parameters explicitly.
    """
    key = name.lower()
    if key == "snake":
        raise ValueError("snake is parametric; use snake(x, alpha)")
    fn = _ACTS.get(key)
    if fn is None:
        raise ValueError(f"unknown activation {name}")
    if key == "elu":
        alpha = kwargs.get("alpha", 1.0)
        return lambda x: elu(x, alpha)
    if key in ("leakyrelu", "leaky_relu"):
        slope = kwargs.get("negative_slope", 0.01)
        return lambda x: leaky_relu(x, slope)
    return fn
