"""LauraGPT-style text-to-audio generation model.

Behavioral reference: funcodec/models/audio_generation/laura_model.py
(QuantizerCodebook :16-55, LauraGenModel :58-579) and
funcodec/lm/transformer_lm.py (TransformerEmbedLM :96-317).

Two stages:
1. a decoder-only codec LM over [sos, text, task_id, codec_emb] predicting the
   first `predict_nq` token groups with a flattened (codebook_size+1)*nq
   softmax (the text prefix attends bidirectionally inside the causal mask);
2. a non-autoregressive "codec encoder" predicting dense codec embeddings
   from text + (scheduled-sampled) first-nq probabilities, trained with L1+L2
   regression to frozen-codebook targets.

TPU design: ragged [sos|text|task|codec] sequences are built with vectorized
scatters (no per-sample Python), and AR decoding runs through a real KV cache
(`transformer.apply_encoder_step`) instead of the reference's full-prefix
recompute per token (laura_model.py:534) — O(T) attention state reuse.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any, Dict, List, Optional, Union

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from funcodec_tpu.models import transformer as tfm
from funcodec_tpu.models.transformer import (
    KVCache,
    TransformerConfig,
    apply_encoder,
    apply_encoder_step,
    causal_mask,
    init_encoder,
    init_kv_cache,
    make_pad_mask_bool,
)

Params = Dict[str, Any]


# ---------------------------------------------------------------------------
# ragged helpers (vectorized replacements for pad_list loops)
# ---------------------------------------------------------------------------


def ragged_concat(
    segments: List[jnp.ndarray],  # each (B, Li_max, D) or (B, 1, D) fixed
    lengths: List[jnp.ndarray],  # each (B,) actual lengths
    total_max: int,
) -> jnp.ndarray:
    """Per-row concat of variable-length segments into (B, total_max, D)."""
    B = segments[0].shape[0]
    D = segments[0].shape[-1]
    # segments may mix dtypes under bf16 mixed precision (cast activations
    # vs fp32 embeddings): scatter into the promoted dtype
    dtype = jnp.result_type(*(s.dtype for s in segments))
    out = jnp.zeros((B, total_max + 1, D), dtype)
    offset = jnp.zeros((B,), jnp.int32)
    b_idx = jnp.arange(B)[:, None]
    for seg, ln in zip(segments, lengths):
        Li = seg.shape[1]
        j = jnp.arange(Li)[None, :]  # (1, Li)
        valid = j < ln[:, None]
        dest = jnp.where(valid, offset[:, None] + j, total_max)
        out = out.at[b_idx, dest].add(
            jnp.where(valid[..., None], seg.astype(dtype), 0.0)
        )
        offset = offset + ln.astype(jnp.int32)
    return out[:, :total_max]


def gather_window(x: jnp.ndarray, starts: jnp.ndarray, window: int) -> jnp.ndarray:
    """out[b, j] = x[b, starts[b] + j] for j < window (clipped)."""
    B, T = x.shape[0], x.shape[1]
    j = jnp.arange(window)[None, :]
    idx = jnp.clip(starts[:, None] + j, 0, T - 1)
    return jnp.take_along_axis(
        x, idx.reshape(B, window, *([1] * (x.ndim - 2))), axis=1
    ) if x.ndim > 2 else jnp.take_along_axis(x, idx, axis=1)


# ---------------------------------------------------------------------------
# configuration
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class LauraConfig:
    """Mirrors LauraGenModel kwargs (laura_model.py:66-146)."""

    input_size: int = 512  # text embedding dim fed to the text encoder
    vocab_size: int = 0  # >0 -> token inputs with an embedding table
    num_quantizers: int = 32
    codebook_size: int = 1024
    codebook_dim: int = 128
    predict_nq: int = 2
    codec_sampling_ratio: float = 0.0
    lsm_weight: float = 0.0
    length_normalized_loss: bool = True
    ignore_id: int = -1
    pos_emb_type: str = "split"  # split | uni (for the codec_encoder inputs)
    lm_pe_type: str = "uni"  # uni | split (TransformerEmbedLM pe_type)

    @property
    def lm_out_voc_size(self) -> int:
        return (self.codebook_size + 1) * self.predict_nq

    @property
    def sos_eos(self) -> int:
        return 0

    @property
    def task_id(self) -> int:
        return 1


class LauraGenModel:
    def __init__(
        self,
        cfg: LauraConfig,
        text_encoder_cfg: Optional[TransformerConfig],
        codec_encoder_cfg: TransformerConfig,
        codec_lm_cfg: TransformerConfig,
        input_aug_conf: Optional[dict] = None,
        output_aug_conf: Optional[dict] = None,
        input_normalize: bool = False,
    ):
        self.cfg = cfg
        self.text_encoder_cfg = text_encoder_cfg
        self.codec_encoder_cfg = codec_encoder_cfg
        # LM input is codebook_dim-dimensional embeddings
        self.codec_lm_cfg = codec_lm_cfg
        # Training-time LM input regularizers (transformer_lm.py:171-184):
        # SpecAug over the text-embedding prefix / codec-embedding suffix,
        # optional utterance MVN on the prefix.
        self.input_aug_conf = input_aug_conf
        self.output_aug_conf = output_aug_conf
        self.input_normalize = input_normalize

    # -- init ----------------------------------------------------------------

    def init(self, key) -> Params:
        cfg = self.cfg
        keys = jax.random.split(key, 8)
        p: Params = {}
        if self.text_encoder_cfg is not None:
            p["text_encoder"] = init_encoder(keys[0], self.text_encoder_cfg)
            text_out = self.text_encoder_cfg.attention_dim
        else:
            text_out = cfg.input_size
        p["text_enc_out_layer"] = tfm._linear_init(keys[1], text_out, cfg.codebook_dim)
        if cfg.vocab_size > 0:
            p["token_embedding"] = (
                jax.random.normal(keys[2], (cfg.vocab_size, cfg.input_size)) * 1.0
            )
        p["lm_embedding"] = jax.random.normal(keys[3], (2, cfg.codebook_dim)) * 1.0
        p["codec_lm"] = init_encoder(keys[4], self.codec_lm_cfg)
        if cfg.lm_pe_type == "split":
            p["lm_input_layer"] = tfm._linear_init(
                jax.random.fold_in(keys[4], 1), cfg.codebook_dim,
                self.codec_lm_cfg.attention_dim,
            )
        p["lm_decoder"] = tfm._linear_init(
            keys[5], self.codec_lm_cfg.attention_dim, cfg.lm_out_voc_size
        )
        p["codec_encoder"] = init_encoder(keys[6], self.codec_encoder_cfg)
        p["codec_encoder_out_layer"] = tfm._linear_init(
            keys[7], self.codec_encoder_cfg.attention_dim, cfg.codebook_dim
        )
        # frozen codebooks, grafted from a codec checkpoint via --init_param
        p["quantizer_codebook"] = jnp.zeros(
            (cfg.num_quantizers, cfg.codebook_size, cfg.codebook_dim), jnp.float32
        )
        return p

    # -- pieces ---------------------------------------------------------------

    def calc_dense_vector(
        self, params: Params, codec: jnp.ndarray, codec_lengths: jnp.ndarray
    ) -> jnp.ndarray:
        """Sum of frozen codebook vectors (QuantizerCodebook.forward :41-55).
        codec: (B, T, nq) -> (B, T, D), zero past codec_lengths."""
        embed = lax.stop_gradient(params["quantizer_codebook"])
        nq = codec.shape[-1]
        mask = make_pad_mask_bool(codec_lengths, codec.shape[1])[..., None]  # (B,T,1)
        codec = jnp.where(mask, codec, 0)

        def gather_q(embed_q, idx_q):
            return embed_q[idx_q]  # (B, T, D)

        subs = jax.vmap(gather_q)(
            embed[:nq], jnp.moveaxis(codec, -1, 0)
        )  # (nq, B, T, D)
        dense = jnp.sum(subs, axis=0)
        return dense * mask

    def encode_text(self, params, text, text_lengths):
        """Text encoder + projection to codebook_dim (laura_model.py:174-189)."""
        cfg = self.cfg
        if cfg.vocab_size > 0:
            valid = text != cfg.ignore_id
            ids = jnp.where(valid, text, 0)
            text = params["token_embedding"][ids] * valid[..., None]
        if self.text_encoder_cfg is not None:
            mask = make_pad_mask_bool(text_lengths, text.shape[1])[:, None, :]
            h = apply_encoder(self.text_encoder_cfg, params["text_encoder"], text, mask)
            h = tfm._apply_linear(params["text_enc_out_layer"], h)
        else:
            if text.shape[-1] == cfg.codebook_dim:
                h = text
            else:
                h = tfm._apply_linear(params["text_enc_out_layer"], text)
        return h, text_lengths

    def _aug_segment(self, seg, lengths, conf, key):
        """SpecAug one LM segment, restricted to valid rows, with identity
        gradients (transformer_lm.py:218-236 mutates under no_grad, so values
        change but the autograd graph is untouched). Mask spans are drawn over
        the padded buffer rather than per-sample exact-length slices — same
        regularizer, vectorized."""
        from funcodec_tpu.ops import augment as aug_ops

        kwargs = {
            k: tuple(v) if isinstance(v, list) else v
            for k, v in conf.items()
            if k not in ("apply_time_warp", "time_warp_window", "time_warp_mode")
        }
        auged = aug_ops.spec_aug(seg, key, **kwargs)
        valid = make_pad_mask_bool(lengths, seg.shape[1])[..., None]
        auged = jnp.where(valid, auged, seg)
        return seg + lax.stop_gradient(auged - seg)

    def build_llm_io(
        self,
        params,
        text: jnp.ndarray,  # (B, Lt, D)
        text_lengths: jnp.ndarray,
        codec: Optional[jnp.ndarray] = None,  # (B, Lc, nq)
        codec_lengths: Optional[jnp.ndarray] = None,
        aug_key=None,  # training only: enables input/output aug + MVN
    ):
        """[sos, text, task] (+ codec embs) inputs (laura_model.py:191-239)."""
        cfg = self.cfg
        B, Lt = text.shape[0], text.shape[1]
        if aug_key is not None:
            k_in, k_out = jax.random.split(aug_key)
            if self.input_aug_conf is not None:
                text = self._aug_segment(text, text_lengths, self.input_aug_conf, k_in)
            if self.input_normalize:
                from funcodec_tpu.ops.augment import utterance_mvn

                normed = utterance_mvn(text, text_lengths)
                valid = make_pad_mask_bool(text_lengths, Lt)[..., None]
                normed = jnp.where(valid, normed, text)
                text = text + lax.stop_gradient(normed - text)
        sos = jnp.broadcast_to(
            params["lm_embedding"][cfg.sos_eos][None, None], (B, 1, cfg.codebook_dim)
        )
        task = jnp.broadcast_to(
            params["lm_embedding"][cfg.task_id][None, None], (B, 1, cfg.codebook_dim)
        )
        ones = jnp.ones((B,), jnp.int32)
        segments = [sos, text, task]
        seg_lens = [ones, text_lengths.astype(jnp.int32), ones]
        total = 2 + Lt
        if codec is not None:
            codec_emb = self.calc_dense_vector(params, codec, codec_lengths)
            if aug_key is not None and self.output_aug_conf is not None:
                # reference aug length: input_lengths - speech_len - 2 = Lc - 1
                codec_emb = self._aug_segment(
                    codec_emb, codec_lengths - 1, self.output_aug_conf, k_out
                )
            segments.append(codec_emb)
            seg_lens.append(codec_lengths.astype(jnp.int32))
            total += codec.shape[1]
        llm_inputs = ragged_concat(segments, seg_lens, total)
        llm_lengths = text_lengths + 2
        if codec is not None:
            llm_lengths = llm_lengths + codec_lengths
        return llm_inputs, llm_lengths

    def _apply_split_pe(self, params, inputs, speech_lengths):
        """pe_type='split' input transform (transformer_lm.py:212-253):
        absolute positions restart at the codec segment; the <task_id> slot
        (position == speech_len) is left untouched; then input_layer Linear."""
        B, T, D = inputs.shape
        pe = jnp.asarray(tfm.sinusoidal_pe(T, D))
        pos = jnp.arange(T)[None, :]  # (1, T)
        L = speech_lengths[:, None]  # (B, 1)
        prefix = pos < L
        suffix = pos > L
        pe_idx = jnp.where(prefix, pos, jnp.maximum(pos - L - 1, 0))
        posed = inputs * math.sqrt(D) + pe[pe_idx]
        out = jnp.where((prefix | suffix)[..., None], posed, inputs)
        return tfm._apply_linear(params["lm_input_layer"], out)

    def _lm_forward(self, params, inputs, input_lengths, speech_lengths):
        """Codec LM forward with bidirectional text prefix
        (transformer_lm.py:194-260)."""
        T = inputs.shape[1]
        mask = causal_mask(input_lengths, T)  # (B, T, T)
        # unmask the [sos, text] prefix (transformer_lm.py:209-211)
        pos = jnp.arange(T)
        bidir = (pos[None, None, :] < speech_lengths[:, None, None]) & (
            pos[None, :, None] < speech_lengths[:, None, None]
        )
        mask = mask | bidir
        # keep padded rows/cols masked
        valid = make_pad_mask_bool(input_lengths, T)
        mask = mask & valid[:, None, :] & valid[:, :, None]
        if self.cfg.lm_pe_type == "split":
            inputs = self._apply_split_pe(params, inputs, speech_lengths)
        h = apply_encoder(self.codec_lm_cfg, params["codec_lm"], inputs, mask)
        return tfm._apply_linear(params["lm_decoder"], h)

    def nll(self, params, text, text_lengths, codec, codec_lengths, aug_key=None):
        """First-nq LM loss pieces (laura_model.py:241-294).

        Returns (nll (B, Lc+1, nq), logits (B, Lc+1, nq, V), target, y_lengths).
        """
        cfg = self.cfg
        B, Lc = codec.shape[0], codec.shape[1]
        inputs, input_lengths = self.build_llm_io(
            params, text, text_lengths, codec, codec_lengths, aug_key=aug_key
        )
        y = self._lm_forward(params, inputs, input_lengths, text_lengths + 1)
        V = cfg.codebook_size + 1
        y = y.reshape(B, -1, cfg.predict_nq, V)

        # logits at positions text_len+1 .. text_len+1+codec_len (inclusive)
        logits = gather_window(
            y.reshape(B, y.shape[1], -1), text_lengths + 1, Lc + 1
        ).reshape(B, Lc + 1, cfg.predict_nq, V)

        # targets: codec tokens then <eos>=codebook_size (laura_model.py:233-238)
        eos_row = jnp.full((B, 1, cfg.predict_nq), cfg.codebook_size, jnp.int32)
        padded_codec = jnp.concatenate(
            [codec.astype(jnp.int32), eos_row], axis=1
        )  # (B, Lc+1, nq)
        pos = jnp.arange(Lc + 1)[None, :, None]
        is_eos = pos == codec_lengths[:, None, None]
        target = jnp.where(is_eos, cfg.codebook_size + cfg.sos_eos, padded_codec)
        target = jnp.where(pos <= codec_lengths[:, None, None], target, 0)

        # label-smoothed CE (losses/label_smoothing_loss.py: KLDiv form)
        logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        smoothing = cfg.lsm_weight
        confidence = 1.0 - smoothing
        off_value = smoothing / (V - 1)
        true_logp = jnp.take_along_axis(logp, target[..., None], axis=-1)[..., 0]
        nll = -(confidence * true_logp + off_value * (jnp.sum(logp, axis=-1) - true_logp))
        if smoothing > 0:
            # KL(targets || p) adds the (constant) negative entropy of targets
            ent = -(
                confidence * math.log(confidence + 1e-20)
                + (V - 1) * off_value * math.log(off_value + 1e-20)
            )
            nll = nll - ent
        y_lengths = codec_lengths + 1
        valid = make_pad_mask_bool(y_lengths, Lc + 1)[..., None]
        nll = jnp.where(valid, nll, 0.0)
        return nll, logits, target, y_lengths

    def prob_sampler(self, params, logits, codec, codec_lengths, key):
        """Scheduled sampling with straight-through one-hot
        (laura_model.py:352-396). logits: (B, Lc, nq, bins)."""
        cfg = self.cfg
        B, Lc = logits.shape[0], logits.shape[1]
        valid = make_pad_mask_bool(codec_lengths, Lc)[:, :, None, None]
        # fp32 softmax island (exp/sum must not accumulate in bf16 under
        # mixed-precision training; see transformer._softmax32)
        soft = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(
            logits.dtype
        )
        pred_token = jnp.argmax(soft, axis=-1)
        hard = jax.nn.one_hot(pred_token, cfg.codebook_size, dtype=soft.dtype)
        pred_prob = soft + lax.stop_gradient(hard - soft)
        if cfg.codec_sampling_ratio == 0.0:
            return pred_prob * valid
        gt = jax.nn.one_hot(
            jnp.clip(codec, 0, cfg.codebook_size - 1), cfg.codebook_size,
            dtype=soft.dtype,
        )
        if cfg.codec_sampling_ratio == 1.0:
            return gt * valid
        correct = pred_token == codec
        sampling_mask = (
            jax.random.uniform(key, correct.shape) > cfg.codec_sampling_ratio
        )
        use_pred = jnp.logical_or(correct, jnp.logical_and(~correct, sampling_mask))
        prob = jnp.where(use_pred[..., None], pred_prob, gt)
        return prob * valid

    def cal_codec_emb(self, params, text, text_lengths, codec_prob, codec_lengths):
        """Non-AR dense embedding prediction (laura_model.py:296-332).
        codec_prob: (B, Lc, nq, bins)."""
        cfg = self.cfg
        embed = lax.stop_gradient(params["quantizer_codebook"])  # (NQ, bins, D)
        first_nq_emb = jnp.einsum(
            "blnv,nvd->bld", codec_prob, embed[: cfg.predict_nq]
        )
        if cfg.pos_emb_type == "split":
            text_in = tfm.apply_abs_pos(text)
            codec_in = tfm.apply_abs_pos(first_nq_emb)
        else:
            text_in, codec_in = text, first_nq_emb
        total = text.shape[1] + first_nq_emb.shape[1]
        model_inputs = ragged_concat(
            [text_in, codec_in],
            [text_lengths.astype(jnp.int32), codec_lengths.astype(jnp.int32)],
            total,
        )
        in_lengths = text_lengths + codec_lengths
        mask = make_pad_mask_bool(in_lengths, total)[:, None, :]
        h = apply_encoder(
            self.codec_encoder_cfg, params["codec_encoder"], model_inputs, mask
        )
        h = tfm._apply_linear(params["codec_encoder_out_layer"], h)
        outs = gather_window(h, text_lengths, first_nq_emb.shape[1])
        valid = make_pad_mask_bool(codec_lengths, outs.shape[1])[..., None]
        return outs * valid, codec_lengths

    def calc_reg_loss(self, prediction, target, lengths):
        """Masked 0.5*L1 + 0.5*(0.5*L2) (laura_model.py:334-341).

        Reference quirk preserved: `make_pad_mask(length, target)` defaults to
        length_dim=-1, so the mask runs over the FEATURE axis (d < codec_len),
        not time. With real models (codec_len >= codebook_dim=128) this is an
        all-ones mask, i.e. zero-padded time rows count in the denominator.
        """
        d = target.shape[-1]
        feat_mask = (
            jnp.arange(d)[None, None, :] < lengths[:, None, None]
        ).astype(jnp.float32)
        mask = jnp.broadcast_to(feat_mask, target.shape)
        denom = jnp.maximum(jnp.sum(mask), 1.0)
        l1 = jnp.sum(jnp.abs(prediction - target) * mask) / denom
        l2 = 0.5 * jnp.sum((prediction - target) ** 2 * mask) / denom
        return l1 * 0.5 + l2 * 0.5, l1, l2

    # -- training forward -----------------------------------------------------

    def forward(
        self,
        params: Params,
        text: jnp.ndarray,
        text_lengths: jnp.ndarray,
        codec: jnp.ndarray,  # (B, Lc, >=predict_nq)
        codec_lengths: jnp.ndarray,
        key,
    ):
        """Training loss (laura_model.py:398-464)."""
        cfg = self.cfg
        codec = codec.astype(jnp.int32)
        text, text_lengths = self.encode_text(params, text, text_lengths)

        aug_key = None
        if self.input_aug_conf or self.output_aug_conf or self.input_normalize:
            aug_key, key = jax.random.split(key)
        nll, logits, target, target_lengths = self.nll(
            params, text, text_lengths, codec[:, :, : cfg.predict_nq], codec_lengths,
            aug_key=aug_key,
        )
        out_mask = make_pad_mask_bool(target_lengths, nll.shape[1])[..., None]
        total = jnp.sum(out_mask) * cfg.predict_nq
        batch = nll.shape[0] * cfg.predict_nq
        denom = total if cfg.length_normalized_loss else batch
        nll_loss = jnp.sum(nll * out_mask) / jnp.maximum(denom, 1)

        s_key, key = jax.random.split(key)
        prob = self.prob_sampler(
            params,
            logits[:, :-1, :, : cfg.codebook_size],
            codec[:, :, : cfg.predict_nq],
            codec_lengths,
            s_key,
        )
        codec_emb, _ = self.cal_codec_emb(params, text, text_lengths, prob, codec_lengths)

        target_emb = self.calc_dense_vector(params, codec, codec_lengths)
        reg_loss, l1, l2 = self.calc_reg_loss(codec_emb, target_emb, codec_lengths)
        loss = reg_loss + nll_loss

        stats = dict(
            loss=loss, nll_loss=nll_loss, reg_loss=reg_loss,
            reg_l1_loss=l1, reg_l2_loss=l2,
        )
        # per-group accuracy (laura_model.py:452-460). Reference quirk
        # preserved: padded positions carry zero logits and target 0, and
        # th_accuracy only excludes ignore_id (-1), so pads count as correct.
        masked_logits = jnp.where(out_mask[..., None], logits, 0.0)
        pred = jnp.argmax(masked_logits, axis=-1)
        for i in range(cfg.predict_nq):
            stats[f"out_acc_{i+1}"] = jnp.mean(
                (pred[:, :, i] == target[:, :, i]).astype(jnp.float32)
            )
        return loss, stats

    # -- AR decode with KV cache ----------------------------------------------

    def _sample_group(self, key, scores, sampling: Union[bool, int, float]):
        """sampling_ids (laura_model.py:466-499) for one group's scores (V,)."""
        if isinstance(sampling, bool):
            if sampling:
                return jax.random.categorical(key, scores)
            return jnp.argmax(scores)
        if isinstance(sampling, int):
            prob = jax.nn.softmax(scores)
            top_p, top_i = lax.top_k(prob, sampling)
            pick = jax.random.categorical(key, jnp.log(jnp.maximum(top_p, 1e-20)))
            return top_i[pick]
        if isinstance(sampling, float):
            prob = jax.nn.softmax(scores)
            order = jnp.argsort(-prob, stable=True)
            sorted_p = prob[order]
            cum_before = jnp.cumsum(sorted_p) - sorted_p
            keep = cum_before < sampling
            masked = jnp.where(keep, sorted_p, 0.0)
            pick = jax.random.categorical(key, jnp.log(jnp.maximum(masked, 1e-20)))
            return order[pick]
        raise NotImplementedError(type(sampling))

    def decode_codec(
        self,
        params: Params,
        text: jnp.ndarray,  # (1, Lt, D) raw text features
        text_lengths: jnp.ndarray,
        max_length: int = 30 * 25,
        sampling: Union[bool, int, float] = 0.8,
        key=None,
        continual: Optional[np.ndarray] = None,  # (Lp, nq) prompt codec tokens
    ) -> np.ndarray:
        """AR first-nq decoding with a KV cache (laura_model.py:501-548).

        Returns (1, T, predict_nq) int32 tokens (eos removed).
        """
        cfg = self.cfg
        lm_cfg = self.codec_lm_cfg
        key = key if key is not None else jax.random.PRNGKey(0)
        text_h, text_lengths = self.encode_text(params, text, text_lengths)
        Lt = int(text_lengths[0])
        text_h = text_h[:, :Lt]

        # prefix embeddings: [sos, text, task] (+ continual codec prompt)
        inputs, _ = self.build_llm_io(
            params, text_h, jnp.asarray([Lt]),
            codec=jnp.asarray(continual, jnp.int32)[None] if continual is not None and len(continual) else None,
            codec_lengths=jnp.asarray([len(continual)]) if continual is not None and len(continual) else None,
        )

        max_total = inputs.shape[1] + max_length + 1
        cache_dtype = params["lm_decoder"]["w"].dtype
        cache = init_kv_cache(lm_cfg, 1, max_total, dtype=cache_dtype)

        prompt = (
            np.asarray(continual, np.int32).reshape(-1, cfg.predict_nq)
            if continual is not None and len(continual)
            else np.zeros((0, cfg.predict_nq), np.int32)
        )
        P = prompt.shape[0]

        prefill, decode_loop = self._get_b1_decode_fns(max_length, sampling)
        logits, cache = prefill(params, cache, inputs, jnp.asarray([Lt + 1]))
        toks, n = decode_loop(params, cache, logits, key, jnp.int32(P))
        n = int(n)
        out = np.concatenate([prompt, np.asarray(toks)[:n]], axis=0)
        if out.shape[0] == 0:
            return np.zeros((1, 0, cfg.predict_nq), np.int32)
        return out[None]

    def _decode_jit_cache(self):
        # memoized jitted decode functions: defining fresh @jax.jit wrappers
        # per decode_codec call forced a full re-trace of the 12-layer
        # while_loop EVERY call (~8 s on the 84M LM — 50x the actual loop
        # execution). Per-call values (prompt length, speech length, padding
        # masks) are traced ARGUMENTS so one wrapper serves every call.
        if not hasattr(self, "_decode_fns"):
            self._decode_fns: Dict[Any, Any] = {}
        return self._decode_fns

    def _embed_fns(self, max_length: int):
        """(embed_prefill(params, inputs, speech_lengths),
        embed_step(params, dense, codec_pos (B,))) for the lm_pe_type."""
        cfg, lm_cfg = self.cfg, self.codec_lm_cfg
        if cfg.lm_pe_type == "split":
            # split mode: absolute pos restarts at the codec segment; the
            # incremental step applies the token's own position encoding
            def embed_prefill(params, inputs, speech_lengths):
                return self._apply_split_pe(params, inputs, speech_lengths)

            def embed_step(params, dense, codec_pos):
                D = dense.shape[-1]
                # constant table covering prompt_len + max_length positions;
                # codec_pos is a traced (B,) vector of per-row positions
                pe = jnp.asarray(tfm.sinusoidal_pe(max_length + 4096, D))
                posed = dense * math.sqrt(D) + pe[codec_pos][:, None]
                return tfm._apply_linear(params["lm_input_layer"], posed)
        else:
            assert lm_cfg.pos_enc_type in ("rel_pos", "none"), (
                "KV-cache decode supports rel_pos/none/split codec LMs"
            )

            def embed_prefill(params, inputs, speech_lengths):
                return tfm.apply_embed(lm_cfg, params["codec_lm"], inputs)[0]

            def embed_step(params, dense, codec_pos):
                return tfm.apply_embed(lm_cfg, params["codec_lm"], dense)[0]

        return embed_prefill, embed_step

    def _get_b1_decode_fns(self, max_length: int, sampling):
        """Jitted (prefill, decode_loop) for batch-1 decode, memoized per
        (max_length, sampling); shapes are handled by jit retracing."""
        cache_key = ("b1", max_length, sampling)
        fns = self._decode_jit_cache()
        if cache_key in fns:
            return fns[cache_key]

        cfg, lm_cfg = self.cfg, self.codec_lm_cfg
        eos = cfg.codebook_size + cfg.sos_eos
        embed_prefill, embed_step = self._embed_fns(max_length)

        @jax.jit
        def prefill(params, cache, inputs, speech_lengths):
            x = embed_prefill(params, inputs, speech_lengths)
            h, cache = apply_encoder_step(lm_cfg, params["codec_lm"], cache, x)
            logits = tfm._apply_linear(params["lm_decoder"], h[:, -1])
            return logits[0], cache

        def step(params, cache, token_group, codec_pos, rel_proj):
            dense = self.calc_dense_vector(
                params, token_group[None, None, :], jnp.asarray([1])
            )  # (1, 1, D)
            x = embed_step(params, dense, codec_pos[None])
            h, cache = apply_encoder_step(
                lm_cfg, params["codec_lm"], cache, x, rel_proj=rel_proj
            )
            logits = tfm._apply_linear(params["lm_decoder"], h[:, -1])
            return logits[0], cache

        # The whole AR loop runs in ONE on-device while_loop (one dispatch,
        # ~26 ms/dispatch on the axon tunnel). Semantics match the
        # reference's host loop (laura_model.py:521-545): sample a group,
        # stop BEFORE emitting if any member is <eos>, else feed it back at
        # codec position P+i (split-pe positions restart at the codec
        # segment).
        @jax.jit
        def decode_loop(params, cache, logits0, key0, prompt_len):
            # loop-invariant: rel-PE tables projected once, gathered per step
            max_total = cache.k[0].shape[1]
            rel_proj = tfm.precompute_rel_proj(
                lm_cfg, params["codec_lm"], max_total
            )

            def sample_groups(k, logits):
                scores = logits.reshape(cfg.predict_nq, -1)
                ks = jax.random.split(k, cfg.predict_nq)
                return jax.vmap(
                    lambda kk, s: self._sample_group(kk, s, sampling)
                )(ks, scores).astype(jnp.int32)

            def cond(st):
                i, done = st[0], st[1]
                return jnp.logical_and(i < max_length, jnp.logical_not(done))

            def body(st):
                i, done, toks, logits, cache, k = st
                k, sub = jax.random.split(k)
                group = sample_groups(sub, logits)
                is_eos = jnp.any(group == eos)
                toks = lax.cond(
                    is_eos, lambda t: t, lambda t: t.at[i].set(group), toks
                )
                logits2, cache2 = lax.cond(
                    is_eos,
                    lambda args: (logits, args[1]),
                    lambda args: step(
                        params, args[1], args[0], prompt_len + i, rel_proj
                    ),
                    (group, cache),
                )
                return (i + jnp.where(is_eos, 0, 1), is_eos, toks, logits2, cache2, k)

            toks0 = jnp.zeros((max_length, cfg.predict_nq), jnp.int32)
            i, _, toks, _, _, _ = lax.while_loop(
                cond, body,
                (jnp.int32(0), jnp.bool_(False), toks0, logits0, cache, key0),
            )
            return toks, i

        fns[cache_key] = (prefill, decode_loop)
        return fns[cache_key]

    def decode_codec_batch(
        self,
        params: Params,
        text: jnp.ndarray,  # (B, Lt_max, D) raw text features (or (B, Lt) ids)
        text_lengths: jnp.ndarray,  # (B,)
        max_length: int = 30 * 25,
        sampling: Union[bool, int, float] = 0.8,
        key=None,
        continual: Optional[np.ndarray] = None,  # (B, Lp_max, nq) prompt tokens
        continual_lengths: Optional[np.ndarray] = None,  # (B,)
    ) -> List[np.ndarray]:
        """Batched AR decode: B utterances advance one shared-KV-cache
        while_loop together (one dispatch for the whole batch).

        The reference decodes strictly batch-1 (laura_model.py:501-548);
        batching is the TPU-native upgrade. Ragged prefixes (per-row text and
        prompt lengths) are LEFT-aligned into the cache: row i occupies cache
        slots [maxP - P_i, maxP), so every row's last prefix token sits at
        slot maxP-1 and generated tokens share slots maxP+t across rows —
        relative-position attention distances between valid tokens stay
        exact, and the left-pad slots are masked out of every attention.

        Returns a list of (T_i, predict_nq) int32 arrays (prompt included,
        eos removed), one per row — identical semantics to decode_codec row
        by row.
        """
        cfg = self.cfg
        lm_cfg = self.codec_lm_cfg
        key = key if key is not None else jax.random.PRNGKey(0)
        text_h, text_lengths = self.encode_text(params, text, text_lengths)
        B = text_h.shape[0]
        text_lengths = jnp.asarray(text_lengths, jnp.int32)

        if continual is not None:
            codec = jnp.asarray(continual, jnp.int32)
            cl = jnp.asarray(continual_lengths, jnp.int32)
            inputs, llm_lengths = self.build_llm_io(
                params, text_h, text_lengths, codec=codec, codec_lengths=cl
            )
            prompts = np.asarray(codec)
            prompt_lens = np.asarray(cl)
        else:
            cl = jnp.zeros((B,), jnp.int32)
            inputs, llm_lengths = self.build_llm_io(params, text_h, text_lengths)
            prompts = np.zeros((B, 0, cfg.predict_nq), np.int32)
            prompt_lens = np.zeros((B,), np.int32)

        maxP = inputs.shape[1]
        max_total = maxP + max_length + 1

        if cfg.lm_pe_type == "split":
            emb = self._apply_split_pe(params, inputs, text_lengths + 1)
        else:
            assert lm_cfg.pos_enc_type in ("rel_pos", "none"), (
                "KV-cache decode supports rel_pos/none/split codec LMs"
            )
            emb = tfm.apply_embed(lm_cfg, params["codec_lm"], inputs)[0]

        # left-align the ragged prefixes (see docstring)
        shift = (maxP - llm_lengths).astype(jnp.int32)  # (B,)
        emb = jax.vmap(lambda row, s: jnp.roll(row, s, axis=0))(emb, shift)

        key_pos = jnp.arange(max_total)
        valid_key = key_pos[None, :] >= shift[:, None]  # (B, max_total)

        cache = init_kv_cache(
            lm_cfg, B, max_total, dtype=params["lm_decoder"]["w"].dtype
        )

        prefill_and_loop = self._get_batch_decode_fn(max_length, sampling)
        toks, counts = prefill_and_loop(params, cache, emb, key, valid_key, cl)
        toks, counts = np.asarray(toks), np.asarray(counts)
        out = []
        for b in range(B):
            out.append(
                np.concatenate(
                    [prompts[b, : prompt_lens[b]], toks[b, : counts[b]]], axis=0
                ).astype(np.int32)
            )
        return out

    def _get_batch_decode_fn(self, max_length: int, sampling):
        """Jitted batched prefill+loop, memoized per (max_length, sampling);
        per-call masks/prompt-lengths are traced arguments, batch/prefix
        shapes are handled by jit retracing."""
        cache_key = ("batch", max_length, sampling)
        fns = self._decode_jit_cache()
        if cache_key in fns:
            return fns[cache_key]

        cfg, lm_cfg = self.cfg, self.codec_lm_cfg
        eos = cfg.codebook_size + cfg.sos_eos
        _embed_prefill, embed_step = self._embed_fns(max_length)

        @jax.jit
        def prefill_and_loop(params, cache, emb, key0, valid_key, cl):
            B, maxP = emb.shape[0], emb.shape[1]
            max_total = cache.k[0].shape[1]
            rel_proj = tfm.precompute_rel_proj(
                lm_cfg, params["codec_lm"], max_total
            )

            def sample_rows(k, logits):
                # logits (B, (V+extra)*nq) -> tokens (B, nq)
                scores = logits.reshape(B, cfg.predict_nq, -1)
                ks = jax.random.split(k, B * cfg.predict_nq).reshape(
                    B, cfg.predict_nq, 2
                )
                return jax.vmap(
                    jax.vmap(lambda kk, s: self._sample_group(kk, s, sampling))
                )(ks, scores).astype(jnp.int32)

            def step(cache, groups, codec_pos):
                dense = self.calc_dense_vector(
                    params, groups[:, None, :], jnp.ones((B,), jnp.int32)
                )  # (B, 1, D)
                x = embed_step(params, dense, codec_pos)
                h, cache = apply_encoder_step(
                    lm_cfg, params["codec_lm"], cache, x,
                    attend_mask=valid_key[:, None, :], rel_proj=rel_proj,
                )
                logits = tfm._apply_linear(params["lm_decoder"], h[:, -1])
                return logits, cache

            h, cache2 = apply_encoder_step(
                lm_cfg, params["codec_lm"], cache, emb,
                attend_mask=jnp.broadcast_to(
                    valid_key[:, None, :], (B, maxP, max_total)
                ),
            )
            logits = tfm._apply_linear(params["lm_decoder"], h[:, -1])  # (B, V)

            def cond(st):
                i, done = st[0], st[1]
                return jnp.logical_and(i < max_length, ~jnp.all(done))

            def body(st):
                i, done, toks, counts, logits, cache, k = st
                k, sub = jax.random.split(k)
                groups = sample_rows(sub, logits)  # (B, nq)
                hits_eos = jnp.any(groups == eos, axis=-1)  # (B,)
                emit = jnp.logical_and(~done, ~hits_eos)
                toks = jnp.where(
                    emit[:, None, None],
                    lax.dynamic_update_slice(
                        toks, groups[:, None, :], (0, i, 0)
                    ),
                    toks,
                )
                counts = counts + emit.astype(jnp.int32)
                done = jnp.logical_or(done, hits_eos)
                # done rows keep stepping (their outputs are ignored); clamp
                # eos ids out of the codebook-embedding range
                safe = jnp.where(
                    jnp.logical_or(done, hits_eos)[:, None],
                    jnp.zeros_like(groups), groups,
                )
                logits2, cache3 = step(cache, safe, cl + i)
                return (i + 1, done, toks, counts, logits2, cache3, k)

            toks0 = jnp.zeros((B, max_length, cfg.predict_nq), jnp.int32)
            state = (
                jnp.int32(0), jnp.zeros((B,), bool), toks0,
                jnp.zeros((B,), jnp.int32), logits, cache2, key0,
            )
            _, _, toks, counts, _, _, _ = lax.while_loop(cond, body, state)
            return toks, counts

        fns[cache_key] = prefill_and_loop
        return fns[cache_key]

    def syn_audio(
        self,
        params: Params,
        codec: jnp.ndarray,  # (1, T, >=predict_nq)
        text: jnp.ndarray,
        text_lengths: jnp.ndarray,
        codec_decoder,
        continual_length: Optional[int] = None,
    ):
        """Non-AR dense prediction -> codec decode_emb (laura_model.py:550-567).

        `codec_decoder` is a callable(emb (1, T, D)) -> waveform.
        """
        cfg = self.cfg
        codec = codec[:, :, : cfg.predict_nq]
        prob = jax.nn.one_hot(
            jnp.clip(codec, 0, cfg.codebook_size - 1), cfg.codebook_size
        )
        codec_lengths = jnp.asarray([codec.shape[1]])
        text_h, text_lengths = self.encode_text(params, text, text_lengths)
        codec_emb, _ = self.cal_codec_emb(
            params, text_h, text_lengths, prob, codec_lengths
        )
        start = continual_length or 0
        return codec_decoder(codec_emb[:, start:])
