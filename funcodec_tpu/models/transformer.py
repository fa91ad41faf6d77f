"""Transformer / Conformer encoder stacks (ESPnet semantics) + KV-cache decode.

Behavioral reference:
- attention: funcodec/modules/attention.py (MultiHeadedAttention :16-114,
  RelPositionMultiHeadedAttention :212-310 with the "latest" rel_shift)
- positional encodings: funcodec/modules/embedding.py (PositionalEncoding
  :34-92, RelPositionalEncoding :259-330)
- transformer: funcodec/models/encoder/transformer_encoder.py
  (EncoderLayer :46-140, TransformerEncoder_s0 :385-770)
- conformer: funcodec/models/encoder/conformer_encoder.py
  (EncoderLayer :143-280, ConformerEncoder :282-600)

All functions are pure; masks are boolean with True = attend. Incremental
decoding uses a real KV cache (`apply_encoder_step`) — an upgrade over the
reference, which rebuilds the full prefix every AR step
(laura_model.py:534 "not use state, since has not aligned").
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

Params = Dict[str, Any]

NEG_INF = float(np.finfo(np.float32).min)


# ---------------------------------------------------------------------------
# initializers (torch Linear default: kaiming_uniform(a=sqrt(5)) + bias U)
# ---------------------------------------------------------------------------


def _linear_init(key, d_in, d_out, bias=True):
    k1, k2 = jax.random.split(key)
    bound = 1.0 / math.sqrt(d_in)
    p = {"w": jax.random.uniform(k1, (d_in, d_out), jnp.float32, -bound, bound)}
    if bias:
        p["b"] = jax.random.uniform(k2, (d_out,), jnp.float32, -bound, bound)
    return p


def _apply_linear(p, x):
    y = x @ p["w"]
    if "b" in p:
        y = y + p["b"]
    return y


def _ln_init(dim):
    return {"scale": jnp.ones((dim,)), "bias": jnp.zeros((dim,))}


def _apply_ln(p, x, eps=1e-12):
    # torch LayerNorm default eps=1e-5; ESPnet LayerNorm uses default 1e-12
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.mean((x32 - mean) ** 2, axis=-1, keepdims=True)
    return ((x32 - mean) * lax.rsqrt(var + eps) * p["scale"] + p["bias"]).astype(x.dtype)


def _softmax32(scores):
    """Attention softmax as an fp32 island: under bf16 mixed-precision
    training the exp/sum must not accumulate in bf16."""
    return jax.nn.softmax(scores.astype(jnp.float32), axis=-1).astype(scores.dtype)


def _xavier_uniform(key, shape):
    fan_in, fan_out = shape[-1], shape[-2] if len(shape) >= 2 else shape[-1]
    a = math.sqrt(6.0 / (fan_in + fan_out))
    return jax.random.uniform(key, shape, jnp.float32, -a, a)


# ---------------------------------------------------------------------------
# positional encodings
# ---------------------------------------------------------------------------


def sinusoidal_pe(length: int, d_model: int) -> np.ndarray:
    """ESPnet PositionalEncoding table (embedding.py:57-79)."""
    position = np.arange(length, dtype=np.float32)[:, None]
    div_term = np.exp(
        np.arange(0, d_model, 2, dtype=np.float32) * -(math.log(10000.0) / d_model)
    )
    pe = np.zeros((length, d_model), np.float32)
    pe[:, 0::2] = np.sin(position * div_term)
    pe[:, 1::2] = np.cos(position * div_term)
    return pe


def rel_pe(length: int, d_model: int) -> np.ndarray:
    """RelPositionalEncoding table, positions length-1 .. -(length-1)
    (embedding.py:282-311). Shape (2*length-1, d_model)."""
    position = np.arange(length, dtype=np.float32)[:, None]
    div_term = np.exp(
        np.arange(0, d_model, 2, dtype=np.float32) * -(math.log(10000.0) / d_model)
    )
    pe_pos = np.zeros((length, d_model), np.float32)
    pe_neg = np.zeros((length, d_model), np.float32)
    pe_pos[:, 0::2] = np.sin(position * div_term)
    pe_pos[:, 1::2] = np.cos(position * div_term)
    pe_neg[:, 0::2] = np.sin(-position * div_term)
    pe_neg[:, 1::2] = np.cos(-position * div_term)
    return np.concatenate([pe_pos[::-1], pe_neg[1:]], axis=0)


def apply_abs_pos(x: jnp.ndarray, scaled_alpha: Optional[jnp.ndarray] = None):
    """x*sqrt(d) + pe (embedding.py:80-92); scaled variant uses alpha.

    The PE table follows x's dtype: a fp32 table added to a bf16 stream
    would silently promote every downstream matmul back to fp32 and undo
    mixed precision (jax promotion semantics)."""
    d = x.shape[-1]
    pe = jnp.asarray(sinusoidal_pe(x.shape[1], d)).astype(x.dtype)
    if scaled_alpha is not None:
        return x + scaled_alpha * pe
    return x * math.sqrt(d) + pe


def apply_rel_pos(x: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Returns (x*sqrt(d), pos_emb (1, 2T-1, d)) (embedding.py:314-330).
    pos follows x's dtype — see apply_abs_pos."""
    d = x.shape[-1]
    pos = jnp.asarray(rel_pe(x.shape[1], d))[None].astype(x.dtype)
    return x * math.sqrt(d), pos


# ---------------------------------------------------------------------------
# attention
# ---------------------------------------------------------------------------


def init_mha(key, dim: int, heads: int, rel: bool) -> Params:
    ks = jax.random.split(key, 7)
    p = {
        "q": _linear_init(ks[0], dim, dim),
        "k": _linear_init(ks[1], dim, dim),
        "v": _linear_init(ks[2], dim, dim),
        "out": _linear_init(ks[3], dim, dim),
    }
    if rel:
        d_k = dim // heads
        p["pos"] = _linear_init(ks[4], dim, dim, bias=False)
        p["bias_u"] = _xavier_uniform(ks[5], (heads, d_k))
        p["bias_v"] = _xavier_uniform(ks[6], (heads, d_k))
    return p


def _split_heads(x, heads):
    b, t, d = x.shape
    return x.reshape(b, t, heads, d // heads)


def _rel_shift(x: jnp.ndarray) -> jnp.ndarray:
    """Latest rel_shift (attention.py:253-277): (B,H,T1,2T1-1) -> (B,H,T1,T1)."""
    b, h, t1, n = x.shape
    zero_pad = jnp.zeros((b, h, t1, 1), x.dtype)
    x_padded = jnp.concatenate([zero_pad, x], axis=-1)
    x_padded = x_padded.reshape(b, h, n + 1, t1)
    x = x_padded[:, :, 1:].reshape(b, h, t1, n)
    return x[:, :, :, : n // 2 + 1]


def apply_mha(
    p: Params,
    heads: int,
    query: jnp.ndarray,
    key: jnp.ndarray,
    value: jnp.ndarray,
    mask: Optional[jnp.ndarray],
    pos_emb: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Standard or rel-pos multi-head attention (attention.py:98-114, :278-310).

    mask: bool (B, Tq, Tk) or (B, 1, Tk), True = attend.
    """
    d = query.shape[-1]
    d_k = d // heads
    q = _split_heads(_apply_linear(p["q"], query), heads)  # (B,Tq,H,dk)
    k = _split_heads(_apply_linear(p["k"], key), heads)
    v = _split_heads(_apply_linear(p["v"], value), heads)

    if pos_emb is not None:
        pe = _split_heads(_apply_linear(p["pos"], pos_emb), heads)  # (1,2T-1,H,dk)
        q_u = jnp.swapaxes(q + p["bias_u"], 1, 2)  # (B,H,Tq,dk)
        q_v = jnp.swapaxes(q + p["bias_v"], 1, 2)
        k_t = jnp.swapaxes(k, 1, 2)
        matrix_ac = q_u @ jnp.swapaxes(k_t, -2, -1)
        matrix_bd = q_v @ jnp.swapaxes(jnp.swapaxes(pe, 1, 2), -2, -1)
        matrix_bd = _rel_shift(matrix_bd)
        scores = (matrix_ac + matrix_bd[..., : k.shape[1]]) / math.sqrt(d_k)
    else:
        scores = jnp.einsum("bqhd,bkhd->bhqk", q, k) / math.sqrt(d_k)

    if mask is not None:
        m = mask[:, None]  # (B,1,Tq|1,Tk)
        scores = jnp.where(m, scores, NEG_INF)
        attn = _softmax32(scores)
        attn = jnp.where(m, attn, 0.0)
    else:
        attn = _softmax32(scores)

    ctx = jnp.einsum("bhqk,bkhd->bqhd", attn, v)
    ctx = ctx.reshape(ctx.shape[0], ctx.shape[1], d)
    return _apply_linear(p["out"], ctx)


# ---------------------------------------------------------------------------
# encoder layers
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class TransformerConfig:
    """Covers both TransformerEncoder_s0 and ConformerEncoder topologies."""

    input_size: int
    attention_dim: int = 256
    attention_heads: int = 4
    linear_units: int = 2048
    num_blocks: int = 6
    dropout_rate: float = 0.1
    positional_dropout_rate: float = 0.1
    attention_dropout_rate: float = 0.0
    input_layer: str = "linear"  # linear | linear_relu | embed | none
    pos_enc_type: str = "abs_pos"  # abs_pos | rel_pos | none
    normalize_before: bool = True
    activation: str = "relu"  # relu | swish (FFN)
    macaron_style: bool = False
    use_cnn_module: bool = False
    cnn_module_kernel: int = 31
    vocab_size: int = 0  # for input_layer == "embed"

    @property
    def rel(self) -> bool:
        return self.pos_enc_type == "rel_pos"


def _ffn_init(key, dim, hidden):
    k1, k2 = jax.random.split(key)
    return {"w1": _linear_init(k1, dim, hidden), "w2": _linear_init(k2, hidden, dim)}


def _apply_ffn(p, x, activation="relu"):
    h = _apply_linear(p["w1"], x)
    h = jax.nn.relu(h) if activation == "relu" else jax.nn.silu(h)
    return _apply_linear(p["w2"], h)


def init_encoder(key, cfg: TransformerConfig) -> Params:
    p: Params = {}
    key, k_embed = jax.random.split(key)
    if cfg.input_layer in ("linear", "linear_relu"):
        p["embed_linear"] = _linear_init(k_embed, cfg.input_size, cfg.attention_dim)
        p["embed_norm"] = _ln_init(cfg.attention_dim)
    elif cfg.input_layer == "embed":
        p["embed_table"] = (
            jax.random.normal(k_embed, (cfg.vocab_size, cfg.attention_dim)) * 1.0
        )
    layers = []
    for _ in range(cfg.num_blocks):
        key, k1, k2, k3, k4 = jax.random.split(key, 5)
        lp: Params = {
            "attn": init_mha(k1, cfg.attention_dim, cfg.attention_heads, cfg.rel),
            "norm_mha": _ln_init(cfg.attention_dim),
            "ff": _ffn_init(k2, cfg.attention_dim, cfg.linear_units),
            "norm_ff": _ln_init(cfg.attention_dim),
        }
        if cfg.macaron_style:
            lp["ff_macaron"] = _ffn_init(k3, cfg.attention_dim, cfg.linear_units)
            lp["norm_ff_macaron"] = _ln_init(cfg.attention_dim)
        if cfg.use_cnn_module:
            key, kc1, kc2 = jax.random.split(key, 3)
            size, kk = cfg.attention_dim, cfg.cnn_module_kernel
            bound1 = 1.0 / math.sqrt(size)
            lp["conv"] = {
                "pw1": {
                    "w": jax.random.uniform(kc1, (1, size, 2 * size), jnp.float32, -bound1, bound1),
                    "b": jnp.zeros((2 * size,)),
                },
                "dw": {
                    "w": jax.random.uniform(kc2, (kk, 1, size), jnp.float32, -1.0 / math.sqrt(kk), 1.0 / math.sqrt(kk)),
                    "b": jnp.zeros((size,)),
                },
                "bn_scale": jnp.ones((size,)),
                "bn_bias": jnp.zeros((size,)),
                "bn_mean": jnp.zeros((size,)),
                "bn_var": jnp.ones((size,)),
                "pw2": {
                    "w": jax.random.uniform(jax.random.fold_in(kc2, 1), (1, size, size), jnp.float32, -bound1, bound1),
                    "b": jnp.zeros((size,)),
                },
            }
            lp["norm_conv"] = _ln_init(cfg.attention_dim)
            lp["norm_final"] = _ln_init(cfg.attention_dim)
        layers.append(lp)
    p["layers"] = layers
    if cfg.normalize_before:
        p["after_norm"] = _ln_init(cfg.attention_dim)
    return p


def _apply_conv_module(p, x, activation="swish"):
    """Conformer convolution module (conformer_encoder.py:56-140), eval-mode
    BatchNorm with imported running stats. x: (B, T, C)."""
    y = lax.conv_general_dilated(
        x, p["pw1"]["w"], (1,), [(0, 0)], dimension_numbers=("NWC", "WIO", "NWC")
    ) + p["pw1"]["b"]
    y = jax.nn.glu(y, axis=-1)
    k = p["dw"]["w"].shape[0]
    pad = (k - 1) // 2
    y = lax.conv_general_dilated(
        y, p["dw"]["w"], (1,), [(pad, pad)],
        dimension_numbers=("NWC", "WIO", "NWC"),
        feature_group_count=y.shape[-1],
    ) + p["dw"]["b"]
    y = (y - p["bn_mean"]) * lax.rsqrt(p["bn_var"] + 1e-5) * p["bn_scale"] + p["bn_bias"]
    y = jax.nn.silu(y) if activation == "swish" else jax.nn.relu(y)
    y = lax.conv_general_dilated(
        y, p["pw2"]["w"], (1,), [(0, 0)], dimension_numbers=("NWC", "WIO", "NWC")
    ) + p["pw2"]["b"]
    return y


def _apply_layer(
    cfg: TransformerConfig,
    lp: Params,
    x: jnp.ndarray,
    mask: Optional[jnp.ndarray],
    pos_emb: Optional[jnp.ndarray],
) -> jnp.ndarray:
    ff_scale = 0.5 if cfg.macaron_style else 1.0
    if cfg.macaron_style:
        residual = x
        h = _apply_ln(lp["norm_ff_macaron"], x) if cfg.normalize_before else x
        x = residual + ff_scale * _apply_ffn(lp["ff_macaron"], h, cfg.activation)
        if not cfg.normalize_before:
            x = _apply_ln(lp["norm_ff_macaron"], x)

    residual = x
    h = _apply_ln(lp["norm_mha"], x) if cfg.normalize_before else x
    x_att = apply_mha(
        lp["attn"], cfg.attention_heads, h, h, h, mask, pos_emb=pos_emb
    )
    x = residual + x_att
    if not cfg.normalize_before:
        x = _apply_ln(lp["norm_mha"], x)

    if cfg.use_cnn_module:
        residual = x
        h = _apply_ln(lp["norm_conv"], x) if cfg.normalize_before else x
        x = residual + _apply_conv_module(lp["conv"], h, cfg.activation)
        if not cfg.normalize_before:
            x = _apply_ln(lp["norm_conv"], x)

    residual = x
    h = _apply_ln(lp["norm_ff"], x) if cfg.normalize_before else x
    x = residual + ff_scale * _apply_ffn(lp["ff"], h, cfg.activation)
    if not cfg.normalize_before:
        x = _apply_ln(lp["norm_ff"], x)

    if cfg.use_cnn_module:
        x = _apply_ln(lp["norm_final"], x)
    return x


def apply_embed(cfg: TransformerConfig, p: Params, x: jnp.ndarray):
    """Input layer + positional encoding. Returns (x, pos_emb or None)."""
    if cfg.input_layer in ("linear", "linear_relu"):
        x = _apply_linear(p["embed_linear"], x)
        x = _apply_ln(p["embed_norm"], x)
        if cfg.input_layer == "linear_relu":
            # TransformerEncoder_s0 'linear' has ReLU before pos enc (:457-463)
            x = jax.nn.relu(x)
    elif cfg.input_layer == "embed":
        x = p["embed_table"][x]
    if cfg.pos_enc_type == "abs_pos":
        return apply_abs_pos(x), None
    if cfg.pos_enc_type == "rel_pos":
        return apply_rel_pos(x)
    return x, None


def apply_encoder(
    cfg: TransformerConfig,
    p: Params,
    x: jnp.ndarray,
    mask: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Full encoder forward. x: (B, T, input_size) or int ids for embed."""
    x, pos_emb = apply_embed(cfg, p, x)
    for lp in p["layers"]:
        x = _apply_layer(cfg, lp, x, mask, pos_emb)
    if cfg.normalize_before:
        x = _apply_ln(p["after_norm"], x)
    return x


# ---------------------------------------------------------------------------
# KV-cache incremental decode
# ---------------------------------------------------------------------------


from flax import struct as _struct


@_struct.dataclass
class KVCache:
    """Per-layer key/value caches padded to max_len; `length` is the fill."""

    k: List[jnp.ndarray]  # each (B, max_len, H, dk)
    v: List[jnp.ndarray]
    length: jnp.ndarray  # scalar int32


def init_kv_cache(
    cfg: TransformerConfig, batch: int, max_len: int, dtype=jnp.float32
) -> KVCache:
    h, dk = cfg.attention_heads, cfg.attention_dim // cfg.attention_heads
    zeros = lambda: jnp.zeros((batch, max_len, h, dk), dtype)
    return KVCache(
        k=[zeros() for _ in range(cfg.num_blocks)],
        v=[zeros() for _ in range(cfg.num_blocks)],
        length=jnp.int32(0),
    )


def _rel_pos_for_step(d_model: int, max_len: int) -> jnp.ndarray:
    """pe table indexed so row j = relative distance (max_len-1 - j)."""
    return jnp.asarray(rel_pe(max_len, d_model))


def precompute_rel_proj(cfg: TransformerConfig, p: Params, max_len: int):
    """Per-layer pos-projected relative-PE tables for incremental decode.

    The rel-pos score needs pos-linear(pe[q-k]) per (q, k); projecting the
    whole (2*max_len-1, d) distance table through each layer's `pos` weight
    ONCE (-> (2*max_len-1, H, dk)) turns the per-step work into a gather +
    tiny einsum. Recomputing the projection inside an AR while_loop costs
    ~2*max_len*d^2 FLOPs per layer per token — measured 27 ms/token on the
    84M LauraTTS LM before hoisting + decode-jit memoization, 1.3 ms after.
    """
    if not cfg.rel:
        return None
    d = cfg.attention_dim
    h = cfg.attention_heads
    d_k = d // h
    pe_table = _rel_pos_for_step(d, max_len)  # (2*max_len-1, d)
    return [
        jnp.einsum(
            "td,dhk->thk", pe_table, lp["attn"]["pos"]["w"].reshape(d, h, d_k)
        )
        for lp in p["layers"]
    ]


def apply_encoder_step(
    cfg: TransformerConfig,
    p: Params,
    cache: KVCache,
    x_new: jnp.ndarray,  # (B, n_new, D_in) already embedded+scaled per apply_embed
    attend_mask: Optional[jnp.ndarray] = None,  # (B, n_new, max_len) extra mask
    rel_proj=None,  # optional precompute_rel_proj output
    write_mask: Optional[jnp.ndarray] = None,  # (B,) rows that write+advance
):
    """Incremental forward over n_new positions against the cached prefix.

    The caller is responsible for the input layer / x-scaling; positions of
    the new tokens are cache.length .. cache.length+n_new-1. Relative
    positional scores are computed directly from the rel-pe table (no
    rel_shift needed for gather-style indexing), numerically identical to the
    full forward.

    ``cache.length`` may be a scalar (all rows at the same position — the
    batched-decode path) or a ``(B,)`` vector (PER-ROW positions — the
    continuous-batching serving path, where each slot's stream restarts at
    its own base; models/tts_serving.py). In vector mode ``write_mask``
    optionally gates which rows write their K/V and advance: masked-off rows
    leave the cache and their length untouched (exactly as if they had not
    stepped), which is how dead serving slots ride along in a live batch.
    """
    b, n_new, _ = x_new.shape
    max_len = cache.k[0].shape[1]
    h = cfg.attention_heads
    d = cfg.attention_dim
    d_k = d // h

    start = cache.length
    per_row = getattr(start, "ndim", 0) == 1
    key_pos = jnp.arange(max_len)
    if per_row:
        pos_new = start[:, None] + jnp.arange(n_new)  # (B, n_new)
        # causal validity per row: key slot j visible if j <= q position
        visible = key_pos[None, None, :] <= pos_new[:, :, None]  # (B,n,M)
        if attend_mask is not None:
            visible = jnp.logical_and(visible, attend_mask)
        # scatter indices for the per-row K/V window write
        in_window = jnp.logical_and(
            key_pos[None, :] >= start[:, None],
            key_pos[None, :] < start[:, None] + n_new,
        )  # (B, max_len)
        if write_mask is not None:
            in_window = jnp.logical_and(in_window, write_mask[:, None])
        if n_new > 1:
            src_idx = jnp.clip(key_pos[None, :] - start[:, None], 0, n_new - 1)
            src_idx4 = jnp.broadcast_to(
                src_idx[:, :, None, None], (b, max_len, h, d_k)
            )
    else:
        pos_new = start + jnp.arange(n_new)  # (n_new,)
        # causal validity: key slot j is visible if j < start + q_idx + 1
        visible = key_pos[None, :] <= (pos_new[:, None])  # (n_new, max_len)
        if attend_mask is not None:
            visible = jnp.logical_and(visible[None], attend_mask)
        else:
            visible = jnp.broadcast_to(visible[None], (b, n_new, max_len))

    if cfg.rel and not per_row:
        # relative distance q - k for each (q, k)
        rel_idx = (max_len - 1) - (pos_new[:, None] - key_pos[None, :])
        rel_idx = jnp.clip(rel_idx, 0, 2 * max_len - 2)
        if rel_proj is None:
            pe_table = _rel_pos_for_step(d, max_len)  # (2*max_len-1, d)
            pe = pe_table[rel_idx]  # (n_new, max_len, d)
    if cfg.rel and per_row:
        # per-row distances: gather AFTER the q_v . pe projection (below),
        # so the (2M-1) table is read once instead of per row
        rel_idx = (max_len - 1) - (pos_new[:, :, None] - key_pos[None, None, :])
        rel_idx = jnp.clip(rel_idx, 0, 2 * max_len - 2)  # (B, n, M)
        # the window select is a one-hot CONTRACTION, not a take_along_axis:
        # a (B,h,n,M)-indexed generic gather measured ~19 us per key
        # position per step on v5e (3x the whole rest of the step); the
        # one-hot rides the MXU and is built once for all layers
        rel_onehot = (
            rel_idx[..., None] == jnp.arange(2 * max_len - 1)
        ).astype(x_new.dtype)  # (B, n, M, 2M-1)
    x = x_new
    new_k, new_v = [], []
    for li, lp in enumerate(p["layers"]):
        residual = x
        hdd = _apply_ln(lp["norm_mha"], x) if cfg.normalize_before else x
        ap = lp["attn"]
        q = _split_heads(_apply_linear(ap["q"], hdd), h)  # (B,n,H,dk)
        k_new = _split_heads(_apply_linear(ap["k"], hdd), h)
        v_new = _split_heads(_apply_linear(ap["v"], hdd), h)
        if per_row:
            if n_new == 1:
                # the AR-decode case: every window element IS the new token —
                # a broadcast, not a gather (a (B, M, H, dk)-indexed
                # take_along_axis lowers to a generic XLA gather that
                # measured ~200x slower than the rest of the step on TPU)
                k_scat = jnp.broadcast_to(
                    k_new.astype(cache.k[li].dtype), (b, max_len, h, d_k)
                )
                v_scat = jnp.broadcast_to(
                    v_new.astype(cache.v[li].dtype), (b, max_len, h, d_k)
                )
            else:
                k_scat = jnp.take_along_axis(
                    k_new.astype(cache.k[li].dtype), src_idx4, axis=1
                )
                v_scat = jnp.take_along_axis(
                    v_new.astype(cache.v[li].dtype), src_idx4, axis=1
                )
            w4 = in_window[:, :, None, None]
            k_cache = jnp.where(w4, k_scat, cache.k[li])
            v_cache = jnp.where(w4, v_scat, cache.v[li])
        else:
            k_cache = lax.dynamic_update_slice(
                cache.k[li], k_new.astype(cache.k[li].dtype), (0, start, 0, 0)
            )
            v_cache = lax.dynamic_update_slice(
                cache.v[li], v_new.astype(cache.v[li].dtype), (0, start, 0, 0)
            )
        new_k.append(k_cache)
        new_v.append(v_cache)

        if cfg.rel:
            q_u = q + ap["bias_u"]
            q_v = q + ap["bias_v"]
            scores_ac = jnp.einsum("bnhd,bmhd->bhnm", q_u, k_cache)
            # p-projection of the per-(q,k) relative encodings; prefer the
            # hoisted per-layer table (precompute_rel_proj) — projecting
            # inside an AR loop dominates decode time otherwise
            if per_row:
                if rel_proj is not None:
                    table = rel_proj[li]  # (2M-1, h, dk)
                else:
                    pw = ap["pos"]["w"].reshape(d, h, d_k)
                    pe_table = _rel_pos_for_step(d, max_len)
                    table = jnp.einsum("td,dhk->thk", pe_table, pw)
                # project against the WHOLE distance table, then select each
                # row's window with the precomputed one-hot — table-read-once
                # and MXU-only, vs a (B, n, M, h, dk) per-row pe gather that
                # dwarfs the KV reads
                full = jnp.einsum("bnhd,thd->bhnt", q_v, table)  # (B,h,n,2M-1)
                scores_bd = jnp.einsum("bhnt,bnmt->bhnm", full, rel_onehot)
            else:
                if rel_proj is not None:
                    pe_p = rel_proj[li][rel_idx]  # (n_new, max_len, h, dk)
                else:
                    pw = ap["pos"]["w"].reshape(d, h, d_k)
                    pe_p = jnp.einsum("nmd,dhk->nmhk", pe, pw)
                scores_bd = jnp.einsum("bnhd,nmhd->bhnm", q_v, pe_p)
            scores = (scores_ac + scores_bd) / math.sqrt(d_k)
        else:
            scores = jnp.einsum("bnhd,bmhd->bhnm", q, k_cache) / math.sqrt(d_k)

        scores = jnp.where(visible[:, None], scores, NEG_INF)
        attn = _softmax32(scores)
        attn = jnp.where(visible[:, None], attn, 0.0)
        ctx = jnp.einsum("bhnm,bmhd->bnhd", attn, v_cache).reshape(b, n_new, d)
        x = residual + _apply_linear(ap["out"], ctx)
        if not cfg.normalize_before:
            x = _apply_ln(lp["norm_mha"], x)

        residual = x
        hdd = _apply_ln(lp["norm_ff"], x) if cfg.normalize_before else x
        x = residual + _apply_ffn(lp["ff"], hdd, cfg.activation)
        if not cfg.normalize_before:
            x = _apply_ln(lp["norm_ff"], x)

    if cfg.normalize_before:
        x = _apply_ln(p["after_norm"], x)
    if per_row and write_mask is not None:
        new_len = jnp.where(write_mask, start + n_new, start)
    else:
        new_len = start + n_new
    return x, KVCache(k=new_k, v=new_v, length=new_len)


# ---------------------------------------------------------------------------
# torch checkpoint import
# ---------------------------------------------------------------------------


def import_encoder(sd, prefix: str, cfg: TransformerConfig) -> Params:
    """Import a torch TransformerEncoder_s0/ConformerEncoder state_dict."""
    import numpy as np

    pfx = f"{prefix}." if prefix else ""

    def t(name):
        v = sd[f"{pfx}{name}"]
        if hasattr(v, "detach"):
            v = v.detach().cpu().numpy()
        return jnp.asarray(np.array(v, copy=True))

    def lin(name, bias=True):
        p = {"w": t(f"{name}.weight").T}
        if bias and f"{pfx}{name}.bias" in sd:
            p["b"] = t(f"{name}.bias")
        return p

    def ln(name):
        return {"scale": t(f"{name}.weight"), "bias": t(f"{name}.bias")}

    p: Params = {}
    if cfg.input_layer in ("linear", "linear_relu"):
        p["embed_linear"] = lin("embed.0")
        p["embed_norm"] = ln("embed.1")
    elif cfg.input_layer == "embed":
        p["embed_table"] = t("embed.0.weight")

    layers = []
    for i in range(cfg.num_blocks):
        base = f"encoders.{i}"
        attn = {
            "q": lin(f"{base}.self_attn.linear_q"),
            "k": lin(f"{base}.self_attn.linear_k"),
            "v": lin(f"{base}.self_attn.linear_v"),
            "out": lin(f"{base}.self_attn.linear_out"),
        }
        if cfg.rel:
            attn["pos"] = lin(f"{base}.self_attn.linear_pos", bias=False)
            attn["bias_u"] = t(f"{base}.self_attn.pos_bias_u")
            attn["bias_v"] = t(f"{base}.self_attn.pos_bias_v")
        lp: Params = {"attn": attn}
        # transformer layers use norm1/norm2; conformer uses norm_mha/norm_ff
        if f"{pfx}{base}.norm1.weight" in sd:
            lp["norm_mha"] = ln(f"{base}.norm1")
            lp["norm_ff"] = ln(f"{base}.norm2")
        else:
            lp["norm_mha"] = ln(f"{base}.norm_mha")
            lp["norm_ff"] = ln(f"{base}.norm_ff")
        lp["ff"] = {
            "w1": lin(f"{base}.feed_forward.w_1"),
            "w2": lin(f"{base}.feed_forward.w_2"),
        }
        if cfg.macaron_style:
            lp["ff_macaron"] = {
                "w1": lin(f"{base}.feed_forward_macaron.w_1"),
                "w2": lin(f"{base}.feed_forward_macaron.w_2"),
            }
            lp["norm_ff_macaron"] = ln(f"{base}.norm_ff_macaron")
        if cfg.use_cnn_module:
            lp["conv"] = {
                "pw1": {
                    "w": t(f"{base}.conv_module.pointwise_conv1.weight").transpose(2, 1, 0),
                    "b": t(f"{base}.conv_module.pointwise_conv1.bias"),
                },
                "dw": {
                    "w": t(f"{base}.conv_module.depthwise_conv.weight").transpose(2, 1, 0),
                    "b": t(f"{base}.conv_module.depthwise_conv.bias"),
                },
                "bn_scale": t(f"{base}.conv_module.norm.weight"),
                "bn_bias": t(f"{base}.conv_module.norm.bias"),
                "bn_mean": t(f"{base}.conv_module.norm.running_mean"),
                "bn_var": t(f"{base}.conv_module.norm.running_var"),
                "pw2": {
                    "w": t(f"{base}.conv_module.pointwise_conv2.weight").transpose(2, 1, 0),
                    "b": t(f"{base}.conv_module.pointwise_conv2.bias"),
                },
            }
            lp["norm_conv"] = ln(f"{base}.norm_conv")
            lp["norm_final"] = ln(f"{base}.norm_final")
        layers.append(lp)
    p["layers"] = layers
    if cfg.normalize_before:
        p["after_norm"] = ln("after_norm")
    return p


def make_pad_mask_bool(lengths: jnp.ndarray, maxlen: int) -> jnp.ndarray:
    """(B, maxlen) True where VALID (inverse of ESPnet make_pad_mask)."""
    return jnp.arange(maxlen)[None, :] < lengths[:, None]


def causal_mask(lengths: jnp.ndarray, maxlen: int) -> jnp.ndarray:
    """(B, T, T) causal & padding mask (nets_utils subsequent_mask semantics)."""
    valid = make_pad_mask_bool(lengths, maxlen)  # (B, T)
    tri = jnp.tril(jnp.ones((maxlen, maxlen), bool))
    return valid[:, None, :] & tri[None]
