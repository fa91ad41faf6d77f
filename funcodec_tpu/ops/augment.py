"""Feature augmentation + normalization: SpecAug masks, MaskAlongAxis,
utterance MVN.

Behavioral reference: funcodec/models/specaug/specaug.py:13-100 (freq/time
masks; time-warp is intentionally not supported on TPU — it needs
data-dependent interpolation and the shipped Laura configs don't enable
SpecAug at all), funcodec/layers/mask_along_axis.py
(MaskAlongAxisVariableMaxWidth :206, used by the Encodec context loss),
funcodec/layers/utterance_mvn.py.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def mask_along_axis(
    x: jnp.ndarray,  # (B, T, D)
    key: jax.Array,
    axis: int,  # 1 = time, 2 = freq/feature
    width_range: Tuple[int, int],
    num_mask: int,
) -> jnp.ndarray:
    """Zero `num_mask` random spans along `axis` per batch row."""
    B = x.shape[0]
    L = x.shape[axis]
    k_w, k_s = jax.random.split(key)
    widths = jax.random.randint(k_w, (B, num_mask), width_range[0], max(width_range[1], width_range[0] + 1))
    starts = jax.random.randint(k_s, (B, num_mask), 0, max(L - 1, 1))
    pos = jnp.arange(L)[None, None, :]  # (1, 1, L)
    in_span = (pos >= starts[..., None]) & (pos < (starts + widths)[..., None])
    mask = jnp.any(in_span, axis=1)  # (B, L) True where masked
    shape = [B, 1, 1]
    shape[axis] = L
    return jnp.where(mask.reshape(shape), 0.0, x)


def mask_along_axis_variable_max_width(
    x: jnp.ndarray,  # (B, T, D)
    key: jax.Array,
    mask_width_ratio_range: Tuple[float, float] = (0.0, 0.05),
    num_mask: int = 2,
    axis: int = 1,
    return_mask: bool = False,
):
    """MaskAlongAxisVariableMaxWidth (mask_along_axis.py:206): widths drawn up
    to ratio*L. Returns (masked, mask (B, L, 1)) when return_mask."""
    B = x.shape[0]
    L = x.shape[axis]
    lo = int(mask_width_ratio_range[0] * L)
    hi = max(int(mask_width_ratio_range[1] * L), lo + 1)
    k_w, k_s = jax.random.split(key)
    widths = jax.random.randint(k_w, (B, num_mask), lo, hi)
    starts = jax.random.randint(k_s, (B, num_mask), 0, max(L - 1, 1))
    pos = jnp.arange(L)[None, None, :]
    in_span = (pos >= starts[..., None]) & (pos < (starts + widths)[..., None])
    mask = jnp.any(in_span, axis=1)  # (B, L)
    shape = [B, 1, 1]
    shape[axis] = L
    out = jnp.where(mask.reshape(shape), 0.0, x)
    if return_mask:
        return out, mask[..., None]
    return out


def spec_aug(
    x: jnp.ndarray,  # (B, T, D)
    key: jax.Array,
    apply_freq_mask: bool = True,
    freq_mask_width_range: Tuple[int, int] = (0, 20),
    num_freq_mask: int = 2,
    apply_time_mask: bool = True,
    time_mask_width_range: Optional[Tuple[int, int]] = None,
    time_mask_width_ratio_range: Optional[Tuple[float, float]] = None,
    num_time_mask: int = 2,
) -> jnp.ndarray:
    """SpecAug without time-warp (specaug.py:13-100)."""
    k1, k2 = jax.random.split(key)
    if apply_freq_mask:
        x = mask_along_axis(x, k1, axis=2, width_range=freq_mask_width_range,
                            num_mask=num_freq_mask)
    if apply_time_mask:
        if time_mask_width_ratio_range is not None:
            x = mask_along_axis_variable_max_width(
                x, k2, time_mask_width_ratio_range, num_time_mask, axis=1
            )
        else:
            wr = time_mask_width_range or (0, 100)
            x = mask_along_axis(x, k2, axis=1, width_range=wr, num_mask=num_time_mask)
    return x


def utterance_mvn(
    x: jnp.ndarray,  # (B, T, D)
    lengths: Optional[jnp.ndarray] = None,
    norm_means: bool = True,
    norm_vars: bool = False,
    eps: float = 1.0e-20,
) -> jnp.ndarray:
    """Per-utterance mean/variance normalization (layers/utterance_mvn.py)."""
    if lengths is None:
        mean = jnp.mean(x, axis=1, keepdims=True)
        var = jnp.mean((x - mean) ** 2, axis=1, keepdims=True)
    else:
        valid = (jnp.arange(x.shape[1])[None, :] < lengths[:, None])[..., None]
        denom = jnp.maximum(jnp.sum(valid, axis=1, keepdims=True), 1)
        mean = jnp.sum(x * valid, axis=1, keepdims=True) / denom
        var = jnp.sum(((x - mean) * valid) ** 2, axis=1, keepdims=True) / denom
    if norm_means:
        x = x - mean
    if norm_vars:
        x = x / jnp.sqrt(jnp.maximum(var, eps))
    return x
