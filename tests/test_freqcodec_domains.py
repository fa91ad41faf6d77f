"""FreqCodec domain-transform coverage beyond the shipped mag_phase pair.

The reference supports encode domains {stft, mag, mag_phase, mag_angle,
mag_oracle_phase, mel} and decode domains {stft, mag_phase, mag_angle,
mag_oracle_phase} (codec_freq.py:186-210, 330-449). Round-trip smoke for
each supported pair at tiny shapes: tokens have the expected layout and
the reconstruction is finite.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from funcodec_tpu.tasks.codec import build_codec_model

# (enc_domain, dec_domain, enc_in_channels, dec_out_channels, T)
# T=4080 gives an even spec frame count (1 + 4080/16 = 256) so the oracle-
# phase path's stored angles align with the decoder's 2x-upsampled frames
PAIRS = [
    ("stft", "stft", 2, 2, 4096),
    ("mag", "mag_phase", 1, 3, 4096),
    ("mag_phase", "mag_phase", 3, 3, 4096),
    ("mag_angle", "mag_angle", 2, 2, 4096),
    ("mag_oracle_phase", "mag_oracle_phase", 1, 1, 4080),
]

MEL_RATIOS = [[4, 1], [4, 2], [5, 1]]  # freq 4*4*5 = 80 mel bins


def _build(enc_domain, dec_domain, in_ch, out_ch, ratios=None, dec_ratios=None):
    # default freq ratios collapse the 33-bin (n_fft=64) axis; the mel
    # ENCODE domain has 80 bins and needs its own freq factorization while
    # its decoder still reconstructs 33 STFT bins
    ratios = ratios or [[4, 1], [4, 2], [2, 1]]
    dec_ratios = dec_ratios or ratios
    config = {
        "input_size": in_ch,
        "encoder": "encodec_seanet_encoder_2d",
        "encoder_conf": {
            "ratios": ratios,
            "n_filters": 4,
            "norm": "time_group_norm",
            "causal": False,
            "dilation_base": 1,
        },
        "quantizer": "costume_quantizer",
        "quantizer_conf": {
            "codebook_size": 32,
            "num_quantizers": 4,
            "ema_decay": 0.9,
            "kmeans_init": False,
            "sampling_rate": 16000,
            "encoder_hop_length": 32,
            "use_ddp": True,
        },
        "decoder": "encodec_seanet_decoder_2d",
        "decoder_conf": {
            "ratios": dec_ratios,
            "n_filters": 4,
            "norm": "time_group_norm",
            "causal": False,
            "channels": out_ch,
            "dilation_base": 1,
        },
        "model": "freq_codec",
        "model_conf": {
            "odim": 16,
            "target_sample_hz": 16000,
            "audio_normalize": True,
            "segment_dur": None,
            "overlap_ratio": None,
            "codec_domain": [enc_domain, dec_domain],
            "domain_n_fft": 64,
            "domain_hop_length": 16,
        },
    }
    return build_codec_model(config)


@pytest.mark.parametrize("enc_domain,dec_domain,in_ch,out_ch,T", PAIRS)
def test_domain_roundtrip(enc_domain, dec_domain, in_ch, out_ch, T):
    model, _ = _build(enc_domain, dec_domain, in_ch, out_ch)
    params, rvq_state = model.init(jax.random.PRNGKey(0))
    x = jnp.asarray(
        0.3 * np.random.RandomState(0).randn(2, T).astype(np.float32)
    )
    out = model.inference(params, rvq_state, x, need_recon=True)
    codes = np.asarray(out["code_indices"][0])
    assert codes.ndim == 3 and codes.shape[0] == 4  # (n_q, B, T')
    assert codes.shape[1] == 2
    recon = np.asarray(out["recon_speech"])
    assert recon.shape[0] == 2
    assert np.isfinite(recon).all()


def test_mel_encode_roundtrip():
    """mel encode (80-bin filterbank input) decodes through mag_phase."""
    model, _ = _build(
        "mel", "mag_phase", 1, 3,
        ratios=MEL_RATIOS, dec_ratios=[[4, 1], [4, 2], [2, 1]],
    )
    params, rvq_state = model.init(jax.random.PRNGKey(0))
    x = jnp.asarray(
        0.3 * np.random.RandomState(1).randn(1, 4096).astype(np.float32)
    )
    out = model.inference(params, rvq_state, x, need_recon=True)
    codes = np.asarray(out["code_indices"][0])
    assert codes.shape[0] == 4
    assert np.isfinite(np.asarray(out["recon_speech"])).all()
    # token time axis matches a mag_phase model with the same time ratios
    ref_model, _ = _build("mag_phase", "mag_phase", 3, 3)
    ref_params, ref_state = ref_model.init(jax.random.PRNGKey(0))
    ref_out = ref_model.inference(ref_params, ref_state, x, need_recon=False)
    assert codes.shape[2] == np.asarray(ref_out["code_indices"][0]).shape[2]
