"""Sequence models for the SEANet bottleneck: residual multi-layer LSTM.

Behavioral reference: funcodec/modules/normed_modules/lstm.py:12-28 (SLSTM:
stacked torch.nn.LSTM with a residual skip from input to output).

TPU design: the input projection x @ W_ih is hoisted out of the recurrence as
one large batched matmul over the whole sequence (MXU-friendly); only the
h @ W_hh recurrence runs inside ``lax.scan``. Gate order follows torch LSTM:
[input, forget, cell(g), output].
"""

from __future__ import annotations

import math
from typing import Dict, List

import jax
import jax.numpy as jnp
from jax import lax

Params = Dict[str, jnp.ndarray]


def init_lstm(key, input_size: int, hidden_size: int, num_layers: int) -> List[Params]:
    """torch LSTM init: all weights/biases U(-1/sqrt(H), 1/sqrt(H)).

    Weight layout here: w_ih (in, 4H), w_hh (H, 4H) — transposed from torch
    for right-multiplication on channels-last activations.
    """
    params = []
    bound = 1.0 / math.sqrt(hidden_size)
    for layer in range(num_layers):
        in_size = input_size if layer == 0 else hidden_size
        keys = jax.random.split(key, 5)
        key = keys[0]
        u = lambda k, shape: jax.random.uniform(
            k, shape, jnp.float32, minval=-bound, maxval=bound
        )
        params.append(
            {
                "w_ih": u(keys[1], (in_size, 4 * hidden_size)),
                "w_hh": u(keys[2], (hidden_size, 4 * hidden_size)),
                "b_ih": u(keys[3], (4 * hidden_size,)),
                "b_hh": u(keys[4], (4 * hidden_size,)),
            }
        )
    return params


def _lstm_layer(p: Params, x: jnp.ndarray, carry=None):
    """One LSTM layer over (B, T, C) -> ((B, T, H), final (h, c)).

    `carry` is an optional initial (h, c) — the streaming-session state
    (models/streaming.py); None starts from zeros (whole-utterance mode).
    """
    B = x.shape[0]
    H = p["w_hh"].shape[0]
    # Hoist the input projection: one big (B*T, in) @ (in, 4H) matmul.
    gates_x = x @ p["w_ih"] + (p["b_ih"] + p["b_hh"])
    gates_x = jnp.swapaxes(gates_x, 0, 1)  # (T, B, 4H) for scan

    w_hh = p["w_hh"]

    def step(carry, gx):
        h, c = carry
        gates = gx + h @ w_hh
        i, f, g, o = jnp.split(gates, 4, axis=-1)
        i = jax.nn.sigmoid(i)
        f = jax.nn.sigmoid(f)
        g = jnp.tanh(g)
        o = jax.nn.sigmoid(o)
        c = f * c + i * g
        h = o * jnp.tanh(c)
        return (h, c), h

    if carry is None:
        carry = (
            jnp.zeros((B, H), x.dtype),
            jnp.zeros((B, H), x.dtype),
        )
    final, ys = lax.scan(step, carry, gates_x)
    return jnp.swapaxes(ys, 0, 1), final  # (B, T, H), (h, c)


def apply_slstm(params: List[Params], x: jnp.ndarray, skip: bool = True) -> jnp.ndarray:
    """Stacked LSTM with residual skip (lstm.py:22-28). x: (B, T, C)."""
    y = x
    for p in params:
        y, _ = _lstm_layer(p, y)
    if skip:
        y = y + x
    return y


def apply_slstm_streaming(
    params: List[Params], x: jnp.ndarray, carries, skip: bool = True
):
    """apply_slstm with explicit per-layer (h, c) carries for chunked
    streaming: feeding chunks through this with threaded carries is exactly
    the whole-utterance apply_slstm. carries: list of (h, c) per layer."""
    y = x
    new_carries = []
    for p, c in zip(params, carries):
        y, nc = _lstm_layer(p, y, carry=c)
        new_carries.append(nc)
    if skip:
        y = y + x
    return y, new_carries
