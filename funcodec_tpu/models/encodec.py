"""EnCodec-style GAN codec: normalize -> encode -> RVQ -> decode -> overlap-add.

Behavioral reference: funcodec/models/codec_basic.py (Encodec :119-839,
_linear_overlap_add :77-116, _encode/_encode_frame :334-380,
_decode/_decode_frame :382-408, inference modes :670-836).

Waveforms are (B, T) mono (input_size=1 in every shipped config); latents are
(B, T', D). Segmentation offsets are static Python ints, so each distinct
input length compiles once; shipped configs use segment_dur=None (one frame).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax

from funcodec_tpu.models.quantizer import Quantizer
from funcodec_tpu.models.seanet import SEANetDecoder, SEANetEncoder
from funcodec_tpu.ops.stft import audio_to_mel
from funcodec_tpu.quant.rvq import RVQState


@dataclasses.dataclass(frozen=True)
class EncodecConfig:
    """Model-level knobs (codec_basic.py:125-151)."""

    input_size: int = 1
    odim: int = 128
    target_sample_hz: int = 16_000
    audio_normalize: bool = True
    segment_dur: Optional[float] = None
    overlap_ratio: Optional[float] = 0.01
    # loss weights (used by the training step)
    recon_loss_weight: float = 1.0
    multi_spectral_recon_loss_weight: float = 1.0
    adversarial_loss_weight: float = 1.0 / 9
    feat_match_loss_weight: float = 100.0 / 9
    enc_quant_loss_weight: float = 1.0
    multi_spectral_window_powers_of_two: Tuple[int, ...] = (5, 6, 7, 8, 9, 10)
    multi_spectral_n_mels: int = 64
    use_power_spec_loss: bool = False
    bypass_quantizer: bool = False
    codec_domain: str = "time"
    # context loss (codec_basic.py:224-238); None disables it
    context_loss_weight: float = 0.0
    context_loss_conf: Optional[Tuple[Tuple[str, Any], ...]] = None

    @property
    def segment_length(self) -> Optional[int]:
        if self.segment_dur is None:
            return None
        return int(self.segment_dur * self.target_sample_hz)

    @property
    def segment_stride(self) -> Optional[int]:
        sl = self.segment_length
        if sl is None:
            return None
        return max(1, int((1 - (self.overlap_ratio or 0.0)) * sl))


def linear_overlap_add(frames: List[jnp.ndarray], stride: int) -> jnp.ndarray:
    """Triangular-window overlap-add (codec_basic.py:77-116). frames: [(B, L)]."""
    assert frames
    dtype = frames[0].dtype
    shape = frames[0].shape[:-1]
    total_size = stride * (len(frames) - 1) + frames[-1].shape[-1]
    frame_length = frames[0].shape[-1]
    t = jnp.linspace(0.0, 1.0, frame_length + 2, dtype=dtype)[1:-1]
    weight = 0.5 - jnp.abs(t - 0.5)

    sum_weight = jnp.zeros((total_size,), dtype)
    out = jnp.zeros(shape + (total_size,), dtype)
    offset = 0
    for frame in frames:
        fl = frame.shape[-1]
        out = out.at[..., offset : offset + fl].add(weight[:fl] * frame)
        sum_weight = sum_weight.at[offset : offset + fl].add(weight[:fl])
        offset += stride
    return out / sum_weight


class Encodec:
    """Functional EnCodec assembly. Params pytree: {encoder, quantizer, decoder}."""

    def __init__(
        self,
        cfg: EncodecConfig,
        encoder: SEANetEncoder,
        quantizer: Quantizer,
        decoder: SEANetDecoder,
    ):
        self.cfg = cfg
        self.encoder = encoder
        self.quantizer = quantizer
        self.decoder = decoder
        self.sample_rate = cfg.target_sample_hz
        self.context = None
        if cfg.context_loss_weight > 0 and cfg.context_loss_conf is not None:
            from funcodec_tpu.models.context import ContextConfig, ContextModule

            conf = dict(cfg.context_loss_conf)
            conf.setdefault("odim", cfg.odim)
            self.context = ContextModule(ContextConfig(**conf))

    # -- init ---------------------------------------------------------------

    def init(self, key) -> Tuple[Dict[str, Any], RVQState]:
        k_enc, k_q, k_dec = jax.random.split(key, 3)
        q_params, rvq_state = self.quantizer.init(k_q)
        params = {
            "encoder": self.encoder.init(k_enc),
            "quantizer": q_params,
            "decoder": self.decoder.init(k_dec),
        }
        if self.context is not None:
            params["context"] = self.context.init(jax.random.fold_in(key, 7))
        return params, rvq_state

    # -- encode / decode ------------------------------------------------------

    def _segments(self, length: int) -> List[Tuple[int, int]]:
        """Static (offset, end) list (codec_basic.py:344-359)."""
        seg = self.cfg.segment_length
        if seg is None:
            return [(0, length)]
        stride = self.cfg.segment_stride or 1
        return [(off, min(off + seg, length)) for off in range(0, length, stride)]

    def _encode_frame(self, params, x: jnp.ndarray, precision=None):
        """(B, T) -> (emb (B, T', D), scale (B, 1) or None). codec_basic.py:361-380."""
        if self.cfg.audio_normalize:
            volume = jnp.sqrt(jnp.mean(x.astype(jnp.float32) ** 2, axis=-1, keepdims=True))
            scale = 1e-8 + volume  # (B, 1)
            x = x / scale.astype(x.dtype)
        else:
            scale = None
        emb = self.encoder(params["encoder"], x, precision=precision)
        return emb, scale

    def _encode(self, params, x: jnp.ndarray, precision=None):
        return [
            self._encode_frame(params, x[:, off:end], precision=precision)
            for off, end in self._segments(x.shape[-1])
        ]

    def _decode_frame(self, params, emb: jnp.ndarray, scale, precision=None):
        """(B, T', D) -> (B, T). codec_basic.py:398-408."""
        out = self.decoder(params["decoder"], emb, precision=precision)
        out = out[..., 0]  # (B, T, 1) -> (B, T)
        if scale is not None:
            out = out * scale.astype(out.dtype)
        return out

    def _decode(self, params, frames, precision=None):
        decoded = [
            self._decode_frame(params, emb, scale, precision=precision)
            for emb, scale in frames
        ]
        if self.cfg.segment_length is None:
            assert len(decoded) == 1
            return decoded[0]
        return linear_overlap_add(decoded, self.cfg.segment_stride or 1)

    # -- inference modes (codec_basic.py:670-836) ----------------------------

    def inference(
        self,
        params,
        rvq_state: RVQState,
        speech: jnp.ndarray,  # (B, T)
        need_recon: bool = True,
        bit_width: Optional[int] = None,
        use_scale: bool = True,
        precision=None,
    ) -> Dict[str, Any]:
        """Full encode->quantize->decode (codec_basic.py:670-718)."""
        codes, code_idxs, all_sub_quants = [], [], []
        frames = self._encode(params, speech, precision=precision)
        for emb, scale in frames:
            if self.cfg.bypass_quantizer:
                code_embs, indices, sub_quants = emb, None, None
            else:
                code_embs, indices, sub_quants = self.quantizer.inference(
                    params["quantizer"], rvq_state, emb, bandwidth=bit_width
                )
            codes.append((code_embs, scale if use_scale else None))
            code_idxs.append(indices)
            all_sub_quants.append(sub_quants)
        recon = None
        if need_recon:
            recon = self._decode(params, codes, precision=precision)[
                ..., : speech.shape[-1]
            ]
        return dict(
            recon_speech=recon,
            code_indices=code_idxs,
            code_embeddings=codes,
            sub_quants=all_sub_quants,
        )

    def inference_encoding(
        self,
        params,
        rvq_state: RVQState,
        speech: jnp.ndarray,
        need_recon: bool = False,
        bit_width: Optional[int] = None,
        use_scale: bool = True,
        precision=None,
    ) -> Dict[str, Any]:
        """Encode to token ids (codec_basic.py:720-764). Uses the greedy
        encode path (identical tokens to inference; skips sub-quant embs)."""
        codes, code_idxs = [], []
        frames = self._encode(params, speech, precision=precision)
        for emb, scale in frames:
            indices = self.quantizer.encode(
                params["quantizer"], rvq_state, emb, bandwidth=bit_width
            )
            code_idxs.append(indices)
            if need_recon:
                quantized = self.quantizer.decode(
                    params["quantizer"], rvq_state, indices
                )
                codes.append((quantized, scale if use_scale else None))
        recon = None
        if need_recon:
            recon = self._decode(params, codes, precision=precision)[
                ..., : speech.shape[-1]
            ]
        return dict(recon_speech=recon, code_indices=code_idxs, code_embeddings=codes)

    def inference_decoding(
        self,
        params,
        rvq_state: RVQState,
        token_idx: jnp.ndarray,  # (B, T, n_q)
        need_recon: bool = True,
        precision=None,
    ) -> Dict[str, Any]:
        """Token ids -> waveform (codec_basic.py:766-802); no scale at decode."""
        tokens = jnp.transpose(token_idx, (2, 0, 1))  # (n_q, B, T)
        code_embs = self.quantizer.decode(params["quantizer"], rvq_state, tokens)
        codes = [(code_embs, None)]
        recon = None
        if need_recon:
            recon = self._decode(params, codes, precision=precision)
        return dict(recon_speech=recon, code_indices=None, code_embeddings=codes)

    def inference_decoding_emb(
        self, params, rvq_state: RVQState, emb: jnp.ndarray, precision=None
    ) -> Dict[str, Any]:
        """Dense code embeddings (B, T, D) -> waveform (codec_basic.py:804-836)."""
        recon = self._decode(params, [(emb, None)], precision=precision)
        return dict(recon_speech=recon, code_indices=None, code_embeddings=[(emb, None)])

    # -- training forwards (codec_basic.py:471-668) ---------------------------

    def _reconstruct(self, params, rvq_state, speech, key, precision=None, training=True):
        """Shared encode->RVQ->decode. Returns (recon, aux).

        training=False (validation) uses the eval quantizer: no EMA updates,
        no dropout — matching model.eval() semantics in the reference trainer.
        """
        frames = self._encode(params, speech, precision=precision)
        codes = []
        commit_losses = []
        enc_quant_losses = []
        all_indices, all_sub_quants, all_embs = [], [], []
        state = rvq_state
        for i, (emb, scale) in enumerate(frames):
            sub_key = jax.random.fold_in(key, i)
            if training:
                quant_out, indices, commit, sub_quants, state = self.quantizer.train_forward(
                    params["quantizer"], state, emb, sub_key
                )
            else:
                quant_out, indices, sub_quants = self.quantizer.inference(
                    params["quantizer"], state, emb
                )
                commit = jnp.float32(0.0)
            commit_losses.append(commit)
            # MSE then squared (codec_basic.py:509)
            mse = jnp.mean((quant_out.astype(jnp.float32) - emb.astype(jnp.float32)) ** 2)
            enc_quant_losses.append(mse**2)
            codes.append((quant_out, scale))
            all_indices.append(indices)
            all_sub_quants.append(sub_quants)
            all_embs.append(emb)
        recon = self._decode(params, codes, precision=precision)[..., : speech.shape[-1]]
        aux = dict(
            commit_loss=jnp.sum(jnp.stack(commit_losses)),
            enc_quant_loss=jnp.sum(jnp.stack(enc_quant_losses)),
            indices=all_indices,
            sub_quants=all_sub_quants,
            embs=all_embs,
            rvq_state=state,
        )
        return recon, aux

    def _multi_spectral_loss(self, orig, recon):
        """6-scale mel/power reconstruction loss (codec_basic.py:522-540)."""
        cfg = self.cfg
        total = jnp.float32(0.0)
        for p in cfg.multi_spectral_window_powers_of_two:
            win = 2**p
            kw = dict(
                n_fft=1024,
                hop_length=win // 4,
                win_length=win,
                sampling_rate=cfg.target_sample_hz,
                n_mel_channels=cfg.multi_spectral_n_mels,
            )
            if not cfg.use_power_spec_loss:
                om = audio_to_mel(orig, **kw)
                rm = audio_to_mel(recon, **kw)
                l1 = jnp.mean(jnp.abs(om - rm))
                l2 = jnp.mean((om - rm) ** 2)
            else:
                om, op = audio_to_mel(orig, return_power_spec=True, **kw)
                rm, rp = audio_to_mel(recon, return_power_spec=True, **kw)
                l1 = jnp.mean(jnp.abs(om - rm)) * 0.5 + jnp.mean(jnp.abs(op - rp)) * 0.5
                l2 = jnp.mean((om - rm) ** 2) * 0.5 + jnp.mean((op - rp) ** 2) * 0.5
            total = total + l1 + l2
        return total / len(cfg.multi_spectral_window_powers_of_two)

    def forward_generator(
        self,
        params,
        disc_params,
        discriminator,
        rvq_state: RVQState,
        speech: jnp.ndarray,  # (B, T)
        key: jax.Array,
        precision=None,
        training: bool = True,
    ):
        """Generator turn (codec_basic.py:471-597).

        Returns (loss, aux dict with stats/rvq_state/recon). Differentiate
        w.r.t. `params` only; disc gradients are blocked with stop_gradient
        (the reference detaches via optimizer separation; adversarial losses
        flow through the discriminator *activations* into the generator).
        """
        orig = speech.astype(jnp.float32)
        recon, aux = self._reconstruct(
            params, rvq_state, speech, key, precision=precision, training=training
        )
        return self._generator_losses(
            params, disc_params, discriminator, orig, recon, aux, key,
            precision=precision,
        )

    def _generator_losses(
        self, params, disc_params, discriminator, orig, recon, aux, key,
        precision=None,
    ):
        """Generator loss assembly from a precomputed reconstruction
        (codec_basic.py:520-597). Split out of forward_generator so the
        shared-forward train step (train/step.py) can reuse one
        encode->RVQ->decode for both optimizer turns."""
        cfg = self.cfg
        # recon/mel losses assemble in fp32, but the adversarial branches run
        # the discriminator in the caller's compute dtype: the fp32 upcast
        # here used to drag the gen-turn disc to fp32 against a bf16 disc
        # turn — 178 ms/step of f32 disc convs at B=64 and a spurious
        # real-vs-fake dtype cue for the discriminator to learn
        # (artifacts/trace_train_b64_r5.json, disc_conv_dtype_split).
        disc_in_dtype = recon.dtype
        recon = recon.astype(jnp.float32)

        recon_loss = jnp.mean(jnp.abs(orig - recon))
        multi_spectral = (
            self._multi_spectral_loss(orig, recon)
            if cfg.multi_spectral_recon_loss_weight > 0
            else jnp.float32(0.0)
        )

        # adversarial + feature-matching (codec_basic.py:545-562). The
        # discriminator of the real signal carries no gradient (torch.no_grad).
        disc_params_sg = jax.tree_util.tree_map(lax.stop_gradient, disc_params)
        fake_outs = discriminator(
            disc_params_sg, recon.astype(disc_in_dtype), precision=precision
        )
        real_outs = discriminator(
            disc_params_sg,
            lax.stop_gradient(orig).astype(disc_in_dtype),
            precision=precision,
        )
        adv_losses, feat_losses = [], []
        fm_start = getattr(cfg, "feat_match_layer_start", -1)
        for (real_logits, real_fmap), (fake_logits, fake_fmap) in zip(real_outs, fake_outs):
            adv_losses.append(
                jnp.mean(jax.nn.relu(1.0 - fake_logits.astype(jnp.float32)))
            )
            for li, (rf, ff) in enumerate(zip(real_fmap, fake_fmap)):
                if li >= fm_start:  # codec_freq.py:530-532 (default -1 = all)
                    # diff in the disc dtype (a second fp32 pass over the fmaps
                    # would double the bytes of the biggest loss term); the
                    # mean accumulates in fp32
                    feat_losses.append(jnp.mean(
                        jnp.abs(lax.stop_gradient(rf) - ff).astype(jnp.float32)
                    ))
        adversarial_loss = jnp.mean(jnp.stack(adv_losses))
        feat_match_loss = jnp.mean(jnp.stack(feat_losses))

        gen_loss = (
            recon_loss * cfg.recon_loss_weight
            + multi_spectral * cfg.multi_spectral_recon_loss_weight
            + adversarial_loss * cfg.adversarial_loss_weight
            + feat_match_loss * cfg.feat_match_loss_weight
        )
        context_loss = jnp.float32(0.0)
        context_pred_acc = jnp.float32(0.0)
        if self.context is not None:
            # first-quantizer masked-prediction / LM loss (codec_basic.py:511-514)
            c_key = jax.random.fold_in(key, 101)
            rvq = aux["rvq_state"]
            for emb_i, idx_i, subq_i in zip(aux["embs"], aux["indices"], aux["sub_quants"]):
                c_loss, c_acc = self.context.loss(
                    params["context"], emb_i, idx_i[0], subq_i[0],
                    lax.stop_gradient(rvq.embed[0]), c_key,
                )
                context_loss = context_loss + c_loss
                context_pred_acc = context_pred_acc + c_acc / len(aux["embs"])

        loss = (
            gen_loss
            + aux["commit_loss"]
            + aux["enc_quant_loss"] * cfg.enc_quant_loss_weight
            + context_loss * cfg.context_loss_weight
        )
        stats = dict(
            context_loss=context_loss,
            context_pred_acc=context_pred_acc,
            generator_loss=loss,
            generator_recon_loss=recon_loss,
            generator_multi_spectral_recon_loss=multi_spectral,
            generator_adv_loss=adversarial_loss,
            generator_feat_match_loss=feat_match_loss,
            generator_commit_loss=aux["commit_loss"],
            generator_enc_quant_loss=aux["enc_quant_loss"],
        )
        out = dict(
            stats=stats,
            rvq_state=aux["rvq_state"],
            gen_loss=lax.stop_gradient(gen_loss),  # carried for disc gating
            real=orig,
            fake=recon,
        )
        return loss, out

    def forward_discriminator(
        self,
        params,
        disc_params,
        discriminator,
        rvq_state: RVQState,
        speech: jnp.ndarray,
        key: jax.Array,
        gen_loss_carry: jnp.ndarray,
        precision=None,
        training: bool = True,
    ):
        """Discriminator turn (codec_basic.py:599-668).

        Hinge loss on real/fake, gated off whenever the discriminator is
        already winning: disc_loss * (disc_loss > gen_loss) (:644-650).
        Differentiate w.r.t. `disc_params`; the generator forward still runs
        in train mode so the RVQ EMA state advances, as in the reference.
        """
        pit = bool(getattr(self.cfg, "phase_invariant_training", False))
        aug_key = None
        if pit:
            key, aug_key = jax.random.split(key)
        gen_params_sg = jax.tree_util.tree_map(lax.stop_gradient, params)
        recon, aux = self._reconstruct(
            gen_params_sg, rvq_state, speech, key, precision=precision, training=training
        )
        # disc inputs stay in the compute dtype (see the _generator_losses
        # note: a caller-side fp32 upcast doubles the disc tower's bytes and
        # hands it a real-vs-fake dtype cue)
        orig = speech.astype(recon.dtype)
        fake = lax.stop_gradient(recon)
        loss, out = self._discriminator_losses(
            disc_params, discriminator, orig, fake, gen_loss_carry, aug_key,
            training=training, precision=precision,
        )
        out["rvq_state"] = aux["rvq_state"]
        return loss, out

    def _discriminator_losses(
        self, disc_params, discriminator, orig, fake, gen_loss_carry, aug_key,
        training: bool = True, precision=None,
    ):
        """Discriminator loss assembly from a precomputed (stop-gradient) fake
        (codec_basic.py:631-658 + codec_freq.py:611-637 PIT). `aug_key` is
        required iff phase_invariant_training. Shared by forward_discriminator
        and the shared-forward train step."""
        pit = bool(getattr(self.cfg, "phase_invariant_training", False))
        real_outs = discriminator(disc_params, orig, precision=precision)
        fake_outs = discriminator(disc_params, fake, precision=precision)
        disc_losses = []
        for (real_logits, _), (fake_logits, _) in zip(real_outs, fake_outs):
            disc_losses.append(
                jnp.mean(jax.nn.relu(1.0 - real_logits.astype(jnp.float32)))
                + jnp.mean(jax.nn.relu(1.0 + fake_logits.astype(jnp.float32)))
            )
        disc_loss = jnp.mean(jnp.stack(disc_losses))

        # phase-invariant training (codec_freq.py:611-637): the discriminator
        # is penalized (L1 on logits + feature maps) for telling a
        # phase-rotated copy of the real signal apart from the real signal
        pit_disc_loss = jnp.float32(0.0)
        if pit:
            from funcodec_tpu.ops.stft import phase_aug

            # PhaseAug(nfft=512, hop=160) as constructed at codec_freq.py:249
            real_aug = lax.stop_gradient(phase_aug(orig, aug_key))
            aug_outs = discriminator(disc_params, real_aug, precision=precision)
            fm_start = getattr(self.cfg, "feat_match_layer_start", -1)
            pit_losses = []
            for (r_logits, r_fmap), (a_logits, a_fmap) in zip(real_outs, aug_outs):
                one = jnp.mean(jnp.abs(r_logits - a_logits))
                fls = [
                    jnp.mean(jnp.abs(r.astype(jnp.float32) - a.astype(jnp.float32)))
                    for i, (r, a) in enumerate(zip(r_fmap, a_fmap))
                    if i >= fm_start
                ]
                one = one + jnp.mean(jnp.stack(fls)) * self.cfg.pit_feat_loss_weight
                pit_losses.append(one)
            pit_disc_loss = jnp.mean(jnp.stack(pit_losses))

        # adaptive gating keeps D from overpowering G (codec_basic.py:646);
        # training-mode only, like the reference's `if self.training:`
        if training:
            mask = (disc_loss > gen_loss_carry).astype(disc_loss.dtype)
            gated_disc_loss = disc_loss * mask
            pit_disc_loss = pit_disc_loss * mask
        else:
            gated_disc_loss = disc_loss
        loss = gated_disc_loss
        if pit:
            loss = loss + pit_disc_loss * self.cfg.pit_disc_loss_weight
        stats = dict(discriminator_total_loss=loss, discriminator_loss=disc_loss)
        if pit:
            stats["pit_disc_loss"] = pit_disc_loss
        out = dict(stats=stats, real=orig, fake=fake)
        return loss, out
