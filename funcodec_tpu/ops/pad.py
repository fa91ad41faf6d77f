"""Streamable-convolution padding arithmetic.

These pure functions define the bit-exact frame alignment of the SEANet
conv stacks. Behavioral reference: funcodec/modules/normed_modules/conv.py
(get_extra_padding_for_conv1d :57-64, pad1d :82-99, unpad1d :123-129,
pad2d :102-120, unpad2d :132-141). All shape math here is static Python
arithmetic so XLA sees fixed shapes.
"""

from __future__ import annotations

import math
from typing import Tuple

import jax.numpy as jnp


def conv_padding_total(kernel_size: int, stride: int, dilation: int = 1) -> int:
    """Total padding needed so an input of length T maps to ceil(T/stride) frames.

    Matches conv.py:249: ``(kernel_size - 1) * dilation - (stride - 1)``.
    """
    return (kernel_size - 1) * dilation - (stride - 1)


def extra_padding_for_conv1d(
    length: int, kernel_size: int, stride: int, padding_total: int = 0
) -> int:
    """Extra right-padding so the last conv window is full (conv.py:57-64)."""
    n_frames = (length - kernel_size + padding_total) / stride + 1
    ideal_length = (math.ceil(n_frames) - 1) * stride + (kernel_size - padding_total)
    return ideal_length - length


def split_padding(padding_total: int, causal: bool) -> Tuple[int, int]:
    """(left, right) split of `padding_total`, before any extra padding.

    Causal: everything on the left (conv.py:251-253). Non-causal: asymmetric
    split with the extra sample on the left for odd totals (conv.py:255-257).
    """
    if causal:
        return padding_total, 0
    padding_right = padding_total // 2
    return padding_total - padding_right, padding_right


def pad1d_time(
    x: jnp.ndarray,
    paddings: Tuple[int, int],
    mode: str = "zero",
    value: float = 0.0,
) -> jnp.ndarray:
    """Pad the time axis (axis 1 of a (B, T, C) array).

    ``reflect`` mode reproduces the reference's small-input fixup
    (conv.py:82-99): if T <= max(pad), zero-extend on the right before
    reflecting, then drop the extension afterwards.
    """
    padding_left, padding_right = paddings
    assert padding_left >= 0 and padding_right >= 0, paddings
    ndim = x.ndim
    assert ndim >= 2, "expected (B, T, C)-like array with time on axis 1"
    widths = [(0, 0)] * ndim

    if mode == "reflect":
        length = x.shape[1]
        max_pad = max(padding_left, padding_right)
        extra_pad = 0
        if length <= max_pad:
            extra_pad = max_pad - length + 1
            w = list(widths)
            w[1] = (0, extra_pad)
            x = jnp.pad(x, w)
        w = list(widths)
        w[1] = (padding_left, padding_right)
        padded = jnp.pad(x, w, mode="reflect")
        end = padded.shape[1] - extra_pad
        return padded[:, :end]
    else:
        w = list(widths)
        w[1] = (padding_left, padding_right)
        if mode == "zero":
            return jnp.pad(x, w)
        if mode == "constant":
            return jnp.pad(x, w, constant_values=value)
        if mode == "replicate":
            return jnp.pad(x, w, mode="edge")
        raise ValueError(f"unknown pad mode {mode}")


def unpad1d_time(x: jnp.ndarray, paddings: Tuple[int, int]) -> jnp.ndarray:
    """Remove (left, right) padding from the time axis (axis 1). conv.py:123-129."""
    padding_left, padding_right = paddings
    assert padding_left >= 0 and padding_right >= 0, paddings
    assert (padding_left + padding_right) <= x.shape[1]
    end = x.shape[1] - padding_right
    return x[:, padding_left:end]


def pad2d_freq_time(
    x: jnp.ndarray,
    padding_time: Tuple[int, int],
    padding_freq: Tuple[int, int],
    mode: str = "zero",
) -> jnp.ndarray:
    """Pad a (B, F, T, C) array on freq (axis 1) and time (axis 2).

    Reflect mode applies the same small-input fixup on both axes
    (conv.py:102-120).
    """
    assert x.ndim == 4, x.shape
    if mode == "reflect":
        f_len, t_len = x.shape[1], x.shape[2]
        max_t, max_f = max(padding_time), max(padding_freq)
        extra_t = max_t - t_len + 1 if t_len <= max_t else 0
        extra_f = max_f - f_len + 1 if f_len <= max_f else 0
        if extra_t or extra_f:
            x = jnp.pad(x, [(0, 0), (0, extra_f), (0, extra_t), (0, 0)])
        padded = jnp.pad(
            x,
            [(0, 0), padding_freq, padding_time, (0, 0)],
            mode="reflect",
        )
        f_end = padded.shape[1] - extra_f
        t_end = padded.shape[2] - extra_t
        return padded[:, :f_end, :t_end]
    else:
        return jnp.pad(x, [(0, 0), padding_freq, padding_time, (0, 0)])


def unpad2d_freq_time(
    x: jnp.ndarray,
    padding_time: Tuple[int, int],
    padding_freq: Tuple[int, int],
) -> jnp.ndarray:
    """Remove padding from a (B, F, T, C) array (conv.py:132-141)."""
    tl, tr = padding_time
    fl, fr = padding_freq
    assert min(padding_time) >= 0 and min(padding_freq) >= 0
    f_end = x.shape[1] - fr
    t_end = x.shape[2] - tr
    return x[:, fl:f_end, tl:t_end]
