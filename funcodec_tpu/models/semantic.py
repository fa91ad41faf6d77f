"""Semantic-augmented codec: Encodec + PPG (phoneme posterior) conditioning.

Behavioral reference: funcodec/models/codec_semantic_aug.py
(CodecSemanticAug :117-769: ppg embedding :178-201, _process_ppg :357-383,
_add_ppg_to_code :385-395, usage modes residual/addition/supervision/concat
in _forward_generator :406-495, classifier loss :396-405).

PPG usage modes:
- "residual": quantize (emb - ppg_emb); decoder input = quantized + ppg_emb
- "addition": quantize emb; decoder input = quantized + ppg_emb
- "concat" (default else-branch): decoder input = conv([ppg_emb; quantized])
- "supervision": plain codec + HuBERT-style phoneme CE on the first quantizer
- "ptts": quantize emb; decoder input = quantized + ppg_emb + utt_level_emb.
  NOTE: the reference calls self.calc_utt_level_emb (codec_semantic_aug.py:435,
  :464) but never defines it anywhere in the repo — the published "ptts" mode
  crashes with AttributeError. We define the utterance-level embedding as the
  time-mean of the pre-quantizer encoder embedding passed through a small
  projection, which matches the evident intent (a per-utterance speaker/style
  vector broadcast over time).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
from jax import lax

from funcodec_tpu.models.encodec import Encodec, EncodecConfig
from funcodec_tpu.models.seanet import apply_layers, init_layers
from funcodec_tpu.ops.conv import ConvSpec


@dataclasses.dataclass(frozen=True)
class SemanticCodecConfig(EncodecConfig):
    ppg_dim: int = 86
    ppg_ds_rate: int = 2
    ppg_ds_type: str = "conv"  # conv | subsample
    ppg_usage_mod: str = "residual"  # residual | addition | concat | supervision | ptts
    ppg_supervision_weight: float = 1.0
    ppg_supervision_loss_weight: float = 1.0


class CodecSemanticAug(Encodec):
    def __init__(self, cfg: SemanticCodecConfig, encoder, quantizer, decoder):
        super().__init__(cfg, encoder, quantizer, decoder)
        self.cfg: SemanticCodecConfig = cfg
        odim = cfg.odim
        # ppg_ds_layer: SConv1d(odim, odim, 7, tgn) -> ELU -> SConv1d(stride ds)
        self.ppg_ds_layers = [
            ("conv", ConvSpec(odim, odim, 7, norm="time_group_norm")),
            ("act", ("ELU", {"alpha": 1.0})),
            ("conv", ConvSpec(odim, odim, cfg.ppg_ds_rate * 2, stride=cfg.ppg_ds_rate, norm="none")),
        ]
        self.ppg_cond_layers = [("conv", ConvSpec(odim * 2, odim, 3, norm="none"))]
        self.ppg_classifier_layers = [
            ("conv", ConvSpec(odim, 512, 5, norm="time_group_norm")),
            ("act", ("ELU", {"alpha": 1.0})),
            ("conv", ConvSpec(512, 512, 3, norm="time_group_norm")),
            ("act", ("ELU", {"alpha": 1.0})),
            ("conv", ConvSpec(512, cfg.ppg_dim, 1, norm="time_group_norm")),
        ]

    def init(self, key):
        params, rvq_state = super().init(key)
        cfg = self.cfg
        keys = jax.random.split(jax.random.fold_in(key, 99), 4)
        params["ppg_embedding"] = (
            jax.random.normal(keys[0], (cfg.ppg_dim, cfg.odim)) * 1.0
        )
        params["ppg_ds_layer"] = init_layers(keys[1], self.ppg_ds_layers)
        params["ppg_cond_layer"] = init_layers(keys[2], self.ppg_cond_layers)
        if cfg.ppg_usage_mod == "supervision":
            params["ppg_classifier"] = init_layers(keys[3], self.ppg_classifier_layers)
        if cfg.ppg_usage_mod == "ptts":
            k = jax.random.fold_in(keys[3], 1)
            bound = 1.0 / jnp.sqrt(cfg.odim)
            params["utt_level_proj"] = {
                "kernel": jax.random.uniform(
                    k, (cfg.odim, cfg.odim), minval=-bound, maxval=bound
                ),
                "bias": jnp.zeros((cfg.odim,)),
            }
        return params, rvq_state

    def _utt_level_emb(self, params, emb: jnp.ndarray) -> jnp.ndarray:
        """Per-utterance style vector: time-mean of the pre-quantizer encoder
        embedding through a linear projection, broadcast over time (the
        reference's calc_utt_level_emb is undefined — see module docstring)."""
        pooled = jnp.mean(emb, axis=1, keepdims=True)  # (B, 1, odim)
        p = params["utt_level_proj"]
        return pooled @ p["kernel"] + p["bias"]

    # -- ppg processing (codec_semantic_aug.py:357-395) -----------------------

    def _process_ppg(self, params, ppg: jnp.ndarray) -> jnp.ndarray:
        """(B, Frames) ids or (B, Frames, ppg_dim) posteriors -> (B, T', odim)."""
        if ppg.ndim == 3:
            ppg_idx = jnp.argmax(ppg, axis=-1)
        else:
            ppg_idx = ppg.astype(jnp.int32)
        emb = params["ppg_embedding"][ppg_idx]  # (B, F, odim)
        if self.cfg.ppg_ds_type == "conv":
            emb = apply_layers(self.ppg_ds_layers, params["ppg_ds_layer"], emb)
        else:
            emb = emb[:, :: self.cfg.ppg_ds_rate]
        return emb

    @staticmethod
    def _match_len(ppg_emb: jnp.ndarray, code_len: int) -> jnp.ndarray:
        """Replicate-pad / trim the time axis to code_len (:387-390)."""
        ppg_len = ppg_emb.shape[1]
        if ppg_len < code_len:
            ppg_emb = jnp.pad(
                ppg_emb, [(0, 0), (0, code_len - ppg_len), (0, 0)], mode="edge"
            )
        return ppg_emb[:, :code_len]

    def _fuse(self, params, ppg_emb, code_embs):
        """concat-mode fusion (:385-395)."""
        x = jnp.concatenate([ppg_emb, code_embs], axis=-1)
        return apply_layers(self.ppg_cond_layers, params["ppg_cond_layer"], x)

    # -- training forward -----------------------------------------------------

    def _reconstruct_with_ppg(
        self, params, rvq_state, speech, ppg, key, training=True
    ):
        cfg = self.cfg
        ppg_emb = self._process_ppg(params, ppg)
        frames = self._encode(params, speech)
        codes, commit_losses, enc_quant_losses = [], [], []
        sup_loss = jnp.float32(0.0)
        state = rvq_state
        for i, (emb, scale) in enumerate(frames):
            seg = self._match_len(ppg_emb, emb.shape[1])
            sub_key = jax.random.fold_in(key, i)

            def quantize(x):
                nonlocal state
                if training:
                    q, idx, commit, subq, state = self.quantizer.train_forward(
                        params["quantizer"], state, x, sub_key
                    )
                else:
                    q, idx, subq = self.quantizer.inference(
                        params["quantizer"], state, x
                    )
                    commit = jnp.float32(0.0)
                return q, idx, commit, subq

            if cfg.ppg_usage_mod == "residual":
                q, idx, commit, _ = quantize(emb - seg)
                decoder_in = q + seg
            elif cfg.ppg_usage_mod == "addition":
                q, idx, commit, _ = quantize(emb)
                decoder_in = q + seg
            elif cfg.ppg_usage_mod == "ptts":
                q, idx, commit, _ = quantize(emb)
                decoder_in = q + seg + self._utt_level_emb(params, emb)
            elif cfg.ppg_usage_mod == "supervision":
                q, idx, commit, subq = quantize(emb)
                decoder_in = q
                sup_loss = sup_loss + self._ppg_class_loss(params, subq[0], emb, ppg)
            else:  # concat
                q, idx, commit, _ = quantize(emb)
                decoder_in = self._fuse(params, seg, q)
            commit_losses.append(commit)
            mse = jnp.mean((decoder_in.astype(jnp.float32) - emb.astype(jnp.float32)) ** 2)
            enc_quant_losses.append(mse**2)
            codes.append((decoder_in, scale))
        recon = self._decode(params, codes)[..., : speech.shape[-1]]
        aux = dict(
            commit_loss=jnp.sum(jnp.stack(commit_losses)),
            enc_quant_loss=jnp.sum(jnp.stack(enc_quant_losses)),
            ppg_supervision_loss=sup_loss,
            rvq_state=state,
        )
        return recon, aux

    def _ppg_class_loss(self, params, quantized, enc_out, ppg):
        """HuBERT-style phoneme CE on the first quantizer (:396-405)."""
        cfg = self.cfg
        sg = lax.stop_gradient
        x = enc_out + sg(quantized - enc_out)
        w = cfg.ppg_supervision_weight
        x = x * w + sg(x * (1.0 - w))
        logits = apply_layers(self.ppg_classifier_layers, params["ppg_classifier"], x)
        labels = (
            jnp.argmax(ppg, axis=-1) if ppg.ndim == 3 else ppg.astype(jnp.int32)
        )[:, :: cfg.ppg_ds_rate]
        t = min(logits.shape[1], labels.shape[1])
        logp = jax.nn.log_softmax(logits[:, :t].astype(jnp.float32), axis=-1)
        nll = -jnp.take_along_axis(logp, labels[:, :t, None], axis=-1)[..., 0]
        return jnp.mean(nll)

    def forward_generator_ppg(
        self, params, disc_params, discriminator, rvq_state,
        speech, ppg, key, precision=None, training=True,
    ):
        """Generator turn with PPG conditioning (same losses as Encodec +
        supervision CE)."""
        cfg = self.cfg
        orig = speech.astype(jnp.float32)
        recon, aux = self._reconstruct_with_ppg(
            params, rvq_state, speech, ppg, key, training=training
        )
        recon = recon.astype(jnp.float32)
        recon_loss = jnp.mean(jnp.abs(orig - recon))
        multi_spectral = self._multi_spectral_loss(orig, recon)

        disc_sg = jax.tree_util.tree_map(lax.stop_gradient, disc_params)
        fake_outs = discriminator(disc_sg, recon, precision=precision)
        real_outs = discriminator(disc_sg, lax.stop_gradient(orig), precision=precision)
        adv, feat = [], []
        for (rl, rf), (fl, ff) in zip(real_outs, fake_outs):
            adv.append(jnp.mean(jax.nn.relu(1.0 - fl)))
            for a, b in zip(rf, ff):
                feat.append(jnp.mean(jnp.abs(lax.stop_gradient(a) - b)))
        adversarial_loss = jnp.mean(jnp.stack(adv))
        feat_match_loss = jnp.mean(jnp.stack(feat))

        gen_loss = (
            recon_loss * cfg.recon_loss_weight
            + multi_spectral * cfg.multi_spectral_recon_loss_weight
            + adversarial_loss * cfg.adversarial_loss_weight
            + feat_match_loss * cfg.feat_match_loss_weight
        )
        loss = (
            gen_loss
            + aux["commit_loss"]
            + aux["enc_quant_loss"] * cfg.enc_quant_loss_weight
            + aux["ppg_supervision_loss"] * cfg.ppg_supervision_loss_weight
        )
        stats = dict(
            generator_loss=loss,
            generator_recon_loss=recon_loss,
            generator_multi_spectral_recon_loss=multi_spectral,
            generator_adv_loss=adversarial_loss,
            generator_feat_match_loss=feat_match_loss,
            generator_commit_loss=aux["commit_loss"],
            generator_enc_quant_loss=aux["enc_quant_loss"],
            ppg_supervision_loss=aux["ppg_supervision_loss"],
        )
        out = dict(stats=stats, rvq_state=aux["rvq_state"],
                   gen_loss=lax.stop_gradient(gen_loss), real=orig, fake=recon)
        return loss, out

    def inference_ppg(
        self, params, rvq_state, speech, ppg,
        need_recon=True, bit_width=None, use_scale=True,
    ):
        """PPG-conditioned inference (codec_semantic_aug.py:686+)."""
        cfg = self.cfg
        ppg_emb = self._process_ppg(params, ppg)
        frames = self._encode(params, speech)
        codes, idxs = [], []
        for emb, scale in frames:
            seg = self._match_len(ppg_emb, emb.shape[1])
            if cfg.ppg_usage_mod == "residual":
                q, indices, _ = self.quantizer.inference(
                    params["quantizer"], rvq_state, emb - seg, bandwidth=bit_width
                )
                decoder_in = q + seg
            elif cfg.ppg_usage_mod == "addition":
                q, indices, _ = self.quantizer.inference(
                    params["quantizer"], rvq_state, emb, bandwidth=bit_width
                )
                decoder_in = q + seg
            elif cfg.ppg_usage_mod == "ptts":
                q, indices, _ = self.quantizer.inference(
                    params["quantizer"], rvq_state, emb, bandwidth=bit_width
                )
                decoder_in = q + seg + self._utt_level_emb(params, emb)
            elif cfg.ppg_usage_mod == "supervision":
                q, indices, _ = self.quantizer.inference(
                    params["quantizer"], rvq_state, emb, bandwidth=bit_width
                )
                decoder_in = q
            else:
                q, indices, _ = self.quantizer.inference(
                    params["quantizer"], rvq_state, emb, bandwidth=bit_width
                )
                decoder_in = self._fuse(params, seg, q)
            codes.append((decoder_in, scale if use_scale else None))
            idxs.append(indices)
        recon = None
        if need_recon:
            recon = self._decode(params, codes)[..., : speech.shape[-1]]
        return dict(recon_speech=recon, code_indices=idxs, code_embeddings=codes)
