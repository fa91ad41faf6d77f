"""FreqCodec: the EnCodec skeleton with STFT-domain encode/decode.

Behavioral reference: funcodec/models/codec_freq.py (FreqCodec :118-837,
domain transforms :186-210 & :345-449). Same losses and inference modes as
Encodec; only the frame transforms differ. Domain pairs (enc, dec) supported:
time, stft, mag, mag_phase, mag_angle, mag_oracle_phase, mel.

Spectrogram features are laid out (B, F, T', C) channels-last for the 2D
SEANet stacks.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from funcodec_tpu.models.encodec import Encodec, EncodecConfig
from funcodec_tpu.ops.stft import istft, mel_filterbank, stft


@dataclasses.dataclass(frozen=True)
class FreqCodecConfig(EncodecConfig):
    codec_domain: Tuple[str, str] = ("mag_phase", "mag_phase")
    domain_n_fft: int = 512
    domain_hop_length: int = 160
    phase_invariant_training: bool = False
    pit_feat_loss_weight: float = 1.0
    pit_disc_loss_weight: float = 1000.0
    feat_match_layer_start: int = -1


class FreqCodec(Encodec):
    """Encodec subclass with frequency-domain frame transforms."""

    def __init__(self, cfg: FreqCodecConfig, encoder, quantizer, decoder):
        super().__init__(cfg, encoder, quantizer, decoder)
        self.cfg: FreqCodecConfig = cfg
        # phase_invariant_training is handled natively by ops/stft.py:phase_aug
        # inside Encodec.forward_discriminator (codec_freq.py:611-637)

    # -- domain transforms (codec_freq.py:345-449) ---------------------------

    def _enc_spec(self, x: jnp.ndarray) -> jnp.ndarray:
        """(B, T) -> complex (B, F, T') via torchaudio-default Spectrogram
        (center=True, reflect pad, hann)."""
        return stft(
            x.astype(jnp.float32),
            self.cfg.domain_n_fft,
            self.cfg.domain_hop_length,
            center=True,
        )

    def _dec_spec(self, spec: jnp.ndarray, length: Optional[int] = None) -> jnp.ndarray:
        return istft(
            spec, self.cfg.domain_n_fft, self.cfg.domain_hop_length,
            center=True, length=length,
        )

    def _encode_frame(self, params, x: jnp.ndarray, precision=None):
        cfg = self.cfg
        if cfg.audio_normalize:
            volume = jnp.sqrt(jnp.mean(x.astype(jnp.float32) ** 2, axis=-1, keepdims=True))
            scale = 1e-8 + volume
            x = x / scale.astype(x.dtype)
        else:
            scale = None

        domain = cfg.codec_domain[0]
        if domain == "time":
            emb = self.encoder(params["encoder"], x, precision=precision)
            return emb, scale

        spec = self._enc_spec(x)  # (B, F, T') complex
        if domain == "stft":
            feats = jnp.stack([jnp.real(spec), jnp.imag(spec)], axis=-1)
        elif domain == "mag":
            feats = jnp.abs(spec)[..., None]
        elif domain == "mag_angle":
            mag = jnp.abs(spec)
            log_mag = jnp.log(jnp.maximum(mag, 1e-6))
            angle = jnp.angle(spec)
            feats = jnp.stack([log_mag, angle], axis=-1)
        elif domain == "mag_phase":
            mag = jnp.abs(spec)
            log_mag = jnp.log(jnp.maximum(mag, 1e-6))
            phase = spec / jnp.maximum(mag, 1e-6)
            feats = jnp.stack([log_mag, jnp.real(phase), jnp.imag(phase)], axis=-1)
        elif domain == "mag_oracle_phase":
            mag = jnp.abs(spec)
            feats = mag[..., None]
            scale = (scale, jnp.angle(spec))
        elif domain == "mel":
            power = jnp.real(spec) ** 2 + jnp.imag(spec) ** 2
            basis = jnp.asarray(
                mel_filterbank(cfg.target_sample_hz, cfg.domain_n_fft, 80)
            )
            feats = jnp.einsum("mf,bft->bmt", basis, power)[..., None]
        else:
            raise ValueError(domain)

        emb = self.encoder(params["encoder"], feats.astype(x.dtype), precision=precision)
        return emb, scale

    def _decode_frame(self, params, emb: jnp.ndarray, scale, precision=None):
        cfg = self.cfg
        out = self.decoder(params["decoder"], emb, precision=precision)
        domain = cfg.codec_domain[1]

        if domain == "time":
            wav = out[..., 0]
            if cfg.codec_domain[0] != "time":
                # time decoder over spectrogram tokens: trim transform padding
                # (codec_freq.py:444-449)
                hop = cfg.domain_hop_length
                wav = wav[:, hop // 2 : -(hop // 2)]
        elif domain == "stft":
            spec = jax.lax.complex(out[..., 0], out[..., 1])
            wav = self._dec_spec(spec)
        elif domain == "mag_phase":
            mag = jax.nn.softplus(out[..., 0].astype(jnp.float32))
            phase = jax.lax.complex(
                out[..., 1].astype(jnp.float32), out[..., 2].astype(jnp.float32)
            )
            wav = self._dec_spec(mag * phase)
        elif domain == "mag_angle":
            mag = jax.nn.softplus(out[..., 0].astype(jnp.float32))
            angle = jnp.sin(out[..., 1].astype(jnp.float32)) * math.pi
            spec = jax.lax.complex(jnp.cos(angle) * mag, jnp.sin(angle) * mag)
            wav = self._dec_spec(spec)
        elif domain == "mag_oracle_phase":
            scale, angle = scale
            mag = out[..., 0].astype(jnp.float32)
            spec = jax.lax.complex(jnp.cos(angle) * mag, jnp.sin(angle) * mag)
            wav = self._dec_spec(spec)
        else:
            raise ValueError(domain)

        if scale is not None:
            wav = wav * scale.astype(wav.dtype)
        return wav
