"""Checkpoint-importer + token parity at FULL flagship shapes.

VERDICT r1 item 5: tiny-shape parity tests don't exercise the norm/shape
edge cases of released checkpoints. Here the reference torch modules are
instantiated at the real released-model topologies —

  * encodec 16k nq32ds320  (14.85M params, README models table)
  * encodec 16k nq32ds640  (57.83M params, ratios [8,5,4,2,2],
    conf/encodec_16k_n32_600k_step_ds640.yaml)
  * freqcodec mag_phase gr8 nq32ds320 (4.50M params, 2D grouped convs,
    conf/freqcodec_mag_phase_16k_n32_600k_step.yaml + conv_group_ratio 8)

— their randomly-initialized state dicts are round-tripped through
compat/torch_import, and encode-token ids + reconstructions must match the
torch forward bit-exactly / within fp32 tolerance.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp


def _seed_codebooks(torch, rvq, rng):
    """Give the (kmeans-init) codebooks nonzero values so encode is
    exercised: fill embed/embed_avg with gaussians, mark inited."""
    with torch.no_grad():
        embed = torch.from_numpy(
            rng.randn(*tuple(rvq.embed.shape)).astype(np.float32)
        )
        rvq.embed.copy_(embed)
        rvq.embed_avg.copy_(embed.clone())
        rvq.inited.fill_(1.0)
        rvq.cluster_size.fill_(1.0)


def _build_ref_1d(torch, ratios, n_filters=32, dimension=128, nq=32, bins=1024):
    import sys

    sys.path.insert(0, "/root/reference")
    from funcodec.models.decoder.seanet_decoder import SEANetDecoder as TDec
    from funcodec.models.encoder.seanet_encoder import SEANetEncoder as TEnc
    from funcodec.modules.quantization.ddp_core_vq import (
        DistributedResidualVectorQuantization as TRVQ,
    )

    torch.manual_seed(0)
    enc = TEnc(
        n_filters=n_filters, dimension=dimension, ratios=list(ratios),
        norm="time_group_norm", causal=False,
    ).eval()
    dec = TDec(
        input_size=dimension, n_filters=n_filters, ratios=list(ratios),
        norm="time_group_norm", causal=False,
    ).eval()
    rvq = TRVQ(
        num_quantizers=nq, dim=dimension, codebook_size=bins, decay=0.99,
        kmeans_init=True, kmeans_iters=50, threshold_ema_dead_code=2,
        quantize_dropout=False, rand_num_quant=None,
    ).eval()
    _seed_codebooks(torch, rvq, np.random.RandomState(3))
    return enc, dec, rvq


def _state_dict(enc, dec, rvq):
    sd = {}
    for k, v in enc.state_dict().items():
        sd["encoder." + k] = v
    for k, v in dec.state_dict().items():
        sd["decoder." + k] = v
    for k, v in rvq.state_dict().items():
        sd["quantizer.rq.model." + k] = v
    return sd


def _our_config_1d(ratios, hop):
    return {
        "input_size": 1,
        "encoder": "encodec_seanet_encoder",
        "encoder_conf": {"ratios": list(ratios), "norm": "time_group_norm", "causal": False},
        "quantizer": "costume_quantizer",
        "quantizer_conf": {
            "codebook_size": 1024, "num_quantizers": 32, "ema_decay": 0.99,
            "kmeans_init": True, "sampling_rate": 16000,
            "encoder_hop_length": hop, "use_ddp": True,
        },
        "decoder": "encodec_seanet_decoder",
        "decoder_conf": {"ratios": list(ratios), "norm": "time_group_norm", "causal": False},
        "model": "encodec",
        "model_conf": {
            "odim": 128,
            "multi_spectral_window_powers_of_two": [5, 6, 7, 8, 9, 10],
            "target_sample_hz": 16000,
            "audio_normalize": True,
            "segment_dur": None, "overlap_ratio": None,
        },
    }


def _count_params(tree):
    return sum(np.prod(x.shape) for x in jax.tree_util.tree_leaves(tree))


@pytest.mark.parametrize(
    "ratios,hop,expected_m",
    [
        pytest.param((8, 5, 4, 2), 320, 14.85, id="nq32ds320"),
        pytest.param((8, 5, 4, 2, 2), 640, 57.83, id="nq32ds640"),
    ],
)
def test_encodec_fullshape_token_parity(torch, ratios, hop, expected_m):
    from funcodec_tpu.compat.torch_import import import_encodec
    from funcodec_tpu.tasks.codec import build_codec_model

    enc, dec, rvq = _build_ref_1d(torch, ratios)
    sd = _state_dict(enc, dec, rvq)

    model, _ = build_codec_model(_our_config_1d(ratios, hop))
    params, rvq_state = import_encodec(sd, model)

    # param-count sanity vs README models table (14.85M / 57.83M generators;
    # enc+dec measure 14.856M / 57.550M — the small remainder is quantizer
    # projections absent at these shapes)
    total = (
        sum(p.numel() for p in enc.parameters())
        + sum(p.numel() for p in dec.parameters())
    )
    assert abs(total / 1e6 - expected_m) / expected_m < 0.02
    ours = _count_params(params["encoder"]) + _count_params(params["decoder"])
    assert ours == total

    rng = np.random.RandomState(0)
    x = (0.25 * rng.randn(2, hop * 10)).astype(np.float32)

    # torch forward: normalize -> encode -> rvq encode -> decode
    xt = torch.from_numpy(x)[:, None, :]
    with torch.no_grad():
        scale = xt.square().mean(dim=-1, keepdim=True).sqrt() + 1e-8
        emb_t = enc(xt / scale)
        codes_t = rvq.encode(emb_t.permute(0, 2, 1))  # (nq, B, T')
        quant_t = rvq.decode(codes_t)
        recon_t = dec(quant_t.permute(0, 2, 1)) * scale

    out = model.inference(params, rvq_state, jnp.asarray(x), need_recon=True)
    codes_j = np.asarray(out["code_indices"][0])
    assert codes_j.shape == tuple(codes_t.shape)
    mismatch = (codes_j != codes_t.numpy()).mean()
    assert mismatch == 0.0, f"token mismatch rate {mismatch:.4%}"

    recon_j = np.asarray(out["recon_speech"])
    np.testing.assert_allclose(
        recon_j, recon_t.numpy()[:, 0, : recon_j.shape[-1]], atol=1e-4, rtol=1e-4
    )


def test_freqcodec_gr8_fullshape_token_parity(torch):
    """freqcodec_magphase gr8: grouped 2D convs at released scale."""
    import sys

    sys.path.insert(0, "/root/reference")
    from funcodec.models.decoder.seanet_decoder import SEANetDecoder2d as TDec2
    from funcodec.models.encoder.seanet_encoder import SEANetEncoder2d as TEnc2
    from funcodec.modules.quantization.ddp_core_vq import (
        DistributedResidualVectorQuantization as TRVQ,
    )

    from funcodec_tpu.compat.torch_import import import_encodec
    from funcodec_tpu.tasks.codec import build_codec_model

    torch.manual_seed(0)
    ratios = [(4, 1), (4, 1), (4, 2), (4, 1)]
    enc = TEnc2(
        input_size=3, dimension=128, n_filters=32, ratios=ratios,
        norm="time_group_norm", causal=False, dilation_base=1,
        conv_group_ratio=8,
    ).eval()
    dec = TDec2(
        input_size=128, channels=3, n_filters=32, ratios=ratios,
        norm="time_group_norm", causal=False, dilation_base=1,
        last_out_padding=[(0, 1), (0, 0)],
        conv_group_ratio=8, tr_conv_group_ratio=8,
    ).eval()
    rvq = TRVQ(
        num_quantizers=32, dim=128, codebook_size=1024, decay=0.99,
        kmeans_init=True, kmeans_iters=50, threshold_ema_dead_code=2,
        quantize_dropout=False, rand_num_quant=None,
    ).eval()
    _seed_codebooks(torch, rvq, np.random.RandomState(5))
    sd = _state_dict(enc, dec, rvq)

    config = {
        "input_size": 3,
        "encoder": "encodec_seanet_encoder_2d",
        "encoder_conf": {
            "ratios": [[4, 1], [4, 1], [4, 2], [4, 1]],
            "norm": "time_group_norm", "causal": False, "dilation_base": 1,
            "conv_group_ratio": 8,
        },
        "quantizer": "costume_quantizer",
        "quantizer_conf": {
            "codebook_size": 1024, "num_quantizers": 32, "ema_decay": 0.99,
            "kmeans_init": True, "sampling_rate": 16000,
            "encoder_hop_length": 320, "use_ddp": True,
        },
        "decoder": "encodec_seanet_decoder_2d",
        "decoder_conf": {
            "ratios": [[4, 1], [4, 1], [4, 2], [4, 1]],
            "norm": "time_group_norm", "causal": False, "channels": 3,
            "dilation_base": 1, "conv_group_ratio": 8, "tr_conv_group_ratio": 8,
        },
        "model": "freq_codec",
        "model_conf": {
            "odim": 128,
            "target_sample_hz": 16000,
            "audio_normalize": True,
            "segment_dur": None, "overlap_ratio": None,
            "codec_domain": ["mag_phase", "mag_phase"],
        },
    }
    model, _ = build_codec_model(config)
    params, rvq_state = import_encodec(sd, model)

    rng = np.random.RandomState(1)
    x = (0.25 * rng.randn(1, 16000)).astype(np.float32)

    # torch path (torchaudio is absent in this image, so the reference
    # FreqCodec model itself cannot be built; the domain transform below
    # reproduces _encode_frame's mag_phase math, and the reference 2D
    # encoder + RVQ consume it — importer + full-shape enc/rvq parity)
    with torch.no_grad():
        scale = np.sqrt((x**2).mean(axis=-1, keepdims=True)) + 1e-8
        xn = jnp.asarray(x / scale)
        spec = model._enc_spec(xn)  # (B, F, T') complex
        mag = jnp.abs(spec)
        log_mag = jnp.log(jnp.maximum(mag, 1e-6))
        phase = spec / jnp.maximum(mag, 1e-6)
        feats_j = jnp.stack([log_mag, jnp.real(phase), jnp.imag(phase)], axis=-1)
        feats_t = torch.from_numpy(
            np.asarray(feats_j).transpose(0, 3, 1, 2).copy()
        )  # (B,F,T,C) -> (B,C,F,T)
        emb_t = enc(feats_t)
        codes_t = rvq.encode(emb_t.permute(0, 2, 1))

    out = model.inference(params, rvq_state, jnp.asarray(x), need_recon=True)
    codes_j = np.asarray(out["code_indices"][0])
    assert codes_j.shape == tuple(codes_t.shape)
    mismatch = (codes_j != codes_t.numpy()).mean()
    assert mismatch == 0.0, f"token mismatch rate {mismatch:.4%}"
    assert np.isfinite(np.asarray(out["recon_speech"])).all()
