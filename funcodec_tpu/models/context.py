"""Encodec context loss: HuBERT-style masked prediction / context LM over
the first quantizer's codes.

Behavioral reference: funcodec/models/codec_basic.py
(build_context_model :244-275, build_context_mask :277-285,
_context_lm_loss :410-424, _cal_context_loss :426-469). Two variants:

- masked prediction (ce_loss_weight): mask time spans of the encoder output,
  run a context model, classify each frame against the first codebook via
  negative squared distance logits;
- context LM (lm_loss_weight): shift-by-one causal prediction of the next
  frame's code.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax

from funcodec_tpu.models.transformer import (
    TransformerConfig,
    apply_encoder,
    causal_mask,
    init_encoder,
    make_pad_mask_bool,
)
from funcodec_tpu.ops.augment import mask_along_axis_variable_max_width
from funcodec_tpu.ops.rnn import apply_slstm, init_lstm


@dataclasses.dataclass(frozen=True)
class ContextConfig:
    """context_loss_conf subset (codec_basic.py:224-238)."""

    model: str = "transformer"  # transformer | lstm
    odim: int = 128
    attention_heads: int = 8
    linear_units: int = 2048
    num_blocks: int = 6
    lstm_layers: int = 4
    use_quant_for_context: bool = False
    mask_pred_weight: Optional[float] = None
    ce_loss_weight: float = 0.0
    lm_loss_weight: float = 0.0
    contrast_loss_weight: float = 0.0
    mask_ratio_range: Tuple[float, float] = (0.0, 0.05)
    num_mask: int = 2

    def transformer_cfg(self) -> TransformerConfig:
        return TransformerConfig(
            input_size=self.odim,
            attention_dim=self.odim,
            attention_heads=self.attention_heads,
            linear_units=self.linear_units,
            num_blocks=self.num_blocks,
            input_layer="linear_relu",
            pos_enc_type="abs_pos",
        )


class ContextModule:
    def __init__(self, cfg: ContextConfig):
        self.cfg = cfg
        self.tfm_cfg = cfg.transformer_cfg() if cfg.model == "transformer" else None

    def init(self, key):
        if self.cfg.model == "transformer":
            return init_encoder(key, self.tfm_cfg)
        return init_lstm(key, self.cfg.odim, self.cfg.odim, self.cfg.lstm_layers)

    def _run(self, params, x, causal: bool):
        if self.cfg.model == "transformer":
            B, T, _ = x.shape
            lengths = jnp.full((B,), T, jnp.int32)
            mask = causal_mask(lengths, T) if causal else make_pad_mask_bool(lengths, T)[:, None, :]
            return apply_encoder(self.tfm_cfg, params, x, mask)
        return apply_slstm(params, x, skip=False)

    @staticmethod
    def _dist_logits(outs, code_emb):
        """-(||o||^2 - 2 o.e + ||e||^2), max-stabilized (codec_basic.py:415-421)."""
        o32 = outs.astype(jnp.float32)
        e32 = code_emb.astype(jnp.float32)  # (bins, D)
        dist = -(
            jnp.sum(o32 * o32, axis=-1, keepdims=True)
            - 2.0 * o32 @ e32.T
            + jnp.sum(e32 * e32, axis=-1)[None, None, :]
        )
        return dist - lax.stop_gradient(jnp.max(dist, axis=-1, keepdims=True))

    def loss(
        self,
        params,
        enc_out: jnp.ndarray,  # (B, T, D) encoder output
        indices0: jnp.ndarray,  # (B, T) first-quantizer codes
        quant0: jnp.ndarray,  # (B, T, D) first-quantizer embeddings
        codebook0: jnp.ndarray,  # (bins, D) first codebook
        key,
    ):
        """Returns (loss, pred_acc) — _cal_context_loss (codec_basic.py:426-469)."""
        cfg = self.cfg
        if cfg.use_quant_for_context:
            enc_out = enc_out + lax.stop_gradient(quant0 - enc_out)

        if cfg.lm_loss_weight > 0:
            # causal next-frame prediction (codec_basic.py:410-424)
            padded = jnp.pad(enc_out, [(0, 0), (1, 0), (0, 0)])[:, :-1]
            outs = self._run(params, padded, causal=True)
            dist = self._dist_logits(outs, codebook0)
            pred_acc = jnp.mean((jnp.argmax(dist, -1) == indices0).astype(jnp.float32))
            logp = jax.nn.log_softmax(dist, axis=-1)
            nll = -jnp.take_along_axis(logp, indices0[..., None], axis=-1)[..., 0]
            return jnp.mean(nll) * cfg.lm_loss_weight, pred_acc

        masked, loss_mask = mask_along_axis_variable_max_width(
            enc_out, key, cfg.mask_ratio_range, cfg.num_mask, axis=1, return_mask=True
        )
        outs = self._run(params, masked, causal=False)
        dist = self._dist_logits(outs, codebook0)
        pred_acc = jnp.mean((jnp.argmax(dist, -1) == indices0).astype(jnp.float32))
        logp = jax.nn.log_softmax(dist, axis=-1)
        ce = -jnp.take_along_axis(logp, indices0[..., None], axis=-1)[..., 0]  # (B, T)
        if cfg.mask_pred_weight is None:
            loss = jnp.mean(ce)
        else:
            m = loss_mask[..., 0].astype(jnp.float32)
            masked_loss = jnp.sum(ce * m) / jnp.maximum(jnp.sum(m), 1e-12)
            unmasked_loss = jnp.sum(ce * (1 - m)) / jnp.maximum(jnp.sum(1 - m), 1e-12)
            loss = masked_loss * cfg.mask_pred_weight + unmasked_loss * (1 - cfg.mask_pred_weight)
        return loss * cfg.ce_loss_weight, pred_acc
