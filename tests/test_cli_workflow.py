"""End-to-end public workflow: wav.scp -> codecs.txt -> reconstructed wavs,
with token IDs golden-checked against the PyTorch reference loaded from a
saved model.pth (the encoding_decoding.sh stage-1/2 contract)."""

import json
import os

import numpy as np
import pytest

import yaml


@pytest.fixture(scope="module")
def tiny_env(tmp_path_factory):
    """Build a tiny reference torch codec, save model.pth + config.yaml + wavs."""
    import torch

    torch.manual_seed(7)
    root = tmp_path_factory.mktemp("cli")

    import sys

    sys.path.insert(0, "/root/reference")
    from funcodec.models.encoder.seanet_encoder import SEANetEncoder as TEnc
    from funcodec.models.decoder.seanet_decoder import SEANetDecoder as TDec
    from funcodec.modules.quantization.ddp_core_vq import (
        DistributedResidualVectorQuantization as TRVQ,
    )

    kw = dict(n_filters=8, dimension=32, ratios=[4, 2], norm="time_group_norm")
    t_enc = TEnc(**kw).eval()
    t_dec = TDec(input_size=32, n_filters=8, ratios=[4, 2], norm="time_group_norm").eval()
    t_rvq = TRVQ(
        num_quantizers=4, dim=32, codebook_size=64, decay=0.99,
        kmeans_init=False, kmeans_iters=5, threshold_ema_dead_code=2,
        quantize_dropout=False, rand_num_quant=None,
    ).eval()

    sd = {}
    for k, v in t_enc.state_dict().items():
        sd["encoder." + k] = v
    for k, v in t_dec.state_dict().items():
        sd["decoder." + k] = v
    for k, v in t_rvq.state_dict().items():
        sd["quantizer.rq.model." + k] = v
    torch.save(sd, root / "model.pth")

    config = {
        "input_size": 1,
        "encoder": "encodec_seanet_encoder",
        "encoder_conf": {"n_filters": 8, "ratios": [4, 2], "norm": "time_group_norm", "causal": False},
        "quantizer": "costume_quantizer",
        "quantizer_conf": {
            "codebook_size": 64, "num_quantizers": 4, "ema_decay": 0.99,
            "kmeans_init": False, "sampling_rate": 16000,
            "encoder_hop_length": 8, "use_ddp": True,
        },
        "decoder": "encodec_seanet_decoder",
        "decoder_conf": {"n_filters": 8, "ratios": [4, 2], "norm": "time_group_norm", "causal": False},
        "model": "encodec",
        "model_conf": {
            "odim": 32, "target_sample_hz": 16000, "audio_normalize": True,
            "segment_dur": None, "overlap_ratio": None,
        },
    }
    with open(root / "config.yaml", "w") as f:
        yaml.safe_dump(config, f)

    # wavs: lengths are exact bucket multiples (16 frames * hop 8 = 128)
    from funcodec_tpu.data.wav_io import write_wav

    rng = np.random.RandomState(0)
    wavs = {}
    os.makedirs(root / "wavs", exist_ok=True)
    for key, t in [("utt1", 1280), ("utt2", 2560)]:
        w = (0.3 * np.sin(2 * np.pi * 200 * np.arange(t) / 16000)
             + 0.05 * rng.randn(t)).astype(np.float32)
        write_wav(root / "wavs" / f"{key}.wav", w, 16000)
        wavs[key] = w
    with open(root / "wav.scp", "w") as f:
        for key in wavs:
            f.write(f"{key} {root/'wavs'}/{key}.wav\n")

    return dict(root=root, torch_modules=(t_enc, t_dec, t_rvq), wavs=wavs)


def _ref_tokens(torch_modules, wav):
    import torch

    t_enc, _, t_rvq = torch_modules
    with torch.no_grad():
        x = torch.from_numpy(wav)[None, None, :]
        scale = (x.mean(dim=1, keepdim=True).pow(2).mean(dim=2, keepdim=True).sqrt() + 1e-8)
        emb = t_enc(x / scale)  # (B, T', C)
        codes = t_rvq.encode(emb.permute(0, 2, 1))  # (n_q, B, T')
    return codes[:, 0, :].numpy()


def test_encode_tokens_match_reference(tiny_env):
    from funcodec_tpu.cli.codec_inference import inference_pipeline

    root = tiny_env["root"]
    out_dir = root / "enc_out"
    inference_pipeline(
        output_dir=str(out_dir),
        config_file=str(root / "config.yaml"),
        model_file=str(root / "model.pth"),
        data_path_and_name_and_type=[(str(root / "wav.scp"), "speech", "sound")],
        batch_size=1,
        bit_width=None,  # all quantizers
        run_mod="encode",
        need_indices=True,
    )
    codecs = {}
    with open(out_dir / "codecs.txt") as f:
        for line in f:
            key, payload = line.rstrip("\n").split(maxsplit=1)
            codecs[key] = np.array(json.loads(payload))  # (frames=1, n_q, T)

    for key, wav in tiny_env["wavs"].items():
        ref = _ref_tokens(tiny_env["torch_modules"], wav)
        got = codecs[key][0]
        assert got.shape == ref.shape, (key, got.shape, ref.shape)
        match = (got == ref).mean()
        assert match == 1.0, f"{key}: token match {match:.4f}"


def test_decode_roundtrip(tiny_env):
    """codecs.txt -> wavs; decoded token embeddings must re-encode identically."""
    from funcodec_tpu.cli.codec_inference import inference_pipeline
    from funcodec_tpu.data.wav_io import read_wav

    root = tiny_env["root"]
    dec_dir = root / "dec_out"
    inference_pipeline(
        output_dir=str(dec_dir),
        config_file=str(root / "config.yaml"),
        model_file=str(root / "model.pth"),
        data_path_and_name_and_type=[
            (str(root / "enc_out" / "codecs.txt"), "speech", "codec_json")
        ],
        batch_size=1,
        bit_width=None,
        run_mod="decode",
    )
    for key, wav in tiny_env["wavs"].items():
        sr, recon = read_wav(dec_dir / f"{key}.wav")
        assert sr == 16000
        assert recon.shape[0] == wav.shape[0]
        assert np.abs(recon).max() <= 0.99 + 1e-3


def test_ark_indices_roundtrip(tiny_env):
    from funcodec_tpu.cli.codec_inference import inference_pipeline
    from funcodec_tpu.data.kaldi_ark import ArkScpReader

    root = tiny_env["root"]
    out_dir = root / "ark_out"
    inference_pipeline(
        output_dir=str(out_dir),
        config_file=str(root / "config.yaml"),
        model_file=str(root / "model.pth"),
        data_path_and_name_and_type=[(str(root / "wav.scp"), "speech", "sound")],
        batch_size=2,
        bit_width=None,
        run_mod="encode",
        indices_save_type="ark",
    )
    reader = ArkScpReader(out_dir / "indices.scp")
    max_len = max(w.shape[0] for w in tiny_env["wavs"].values())
    for key, wav in tiny_env["wavs"].items():
        mat = reader[key]  # (T, n_q)
        # emulate the batch wrap padding on the torch side (the reference
        # collate also wrap-pads when batching, codec_inference.py:257-261)
        padded = np.pad(wav, (0, max_len - wav.shape[0]), mode="wrap")
        codec_len = wav.shape[0] // 8
        ref = _ref_tokens(tiny_env["torch_modules"], padded)[:, :codec_len]
        assert mat.T.shape == ref.shape
        assert (mat.T.astype(np.int64) == ref).mean() == 1.0


def test_wav_io_roundtrip(tmp_path):
    from funcodec_tpu.data.wav_io import read_wav, write_wav

    x = np.clip(np.random.RandomState(0).randn(1000) * 0.3, -0.99, 0.99).astype(np.float32)
    write_wav(tmp_path / "t.wav", x, 16000)
    sr, y = read_wav(tmp_path / "t.wav")
    assert sr == 16000
    np.testing.assert_allclose(y, x, atol=2.0 / 32767)  # write x32767, read /32768 asymmetry (torchaudio convention)


def test_peek_wav_info(tmp_path):
    """Header-only scan must agree with the full decode (serving batch plan)."""
    from funcodec_tpu.data.wav_io import peek_wav_info, read_wav, write_wav

    x = np.clip(np.random.RandomState(1).randn(12345) * 0.3, -0.99, 0.99).astype(np.float32)
    write_wav(tmp_path / "p.wav", x, 24000)
    info = peek_wav_info(tmp_path / "p.wav")
    assert info is not None
    sr, n, ch = info
    full_sr, full = read_wav(tmp_path / "p.wav")
    assert (sr, n, ch) == (full_sr, full.shape[0], 1)

    # non-wav bytes -> None, not an exception
    (tmp_path / "junk.bin").write_bytes(b"\x00" * 64)
    assert peek_wav_info(tmp_path / "junk.bin") is None


def test_int16_transport_exactness(tmp_path):
    """The serving pipeline ships PCM16 wavs to the device as raw int16 and
    dequantizes there (x * 2^-15 in fp32 is exact); tokens come back as int16
    transport and are widened on host. Both must be bit-identical to the
    float32 host path."""
    import jax.numpy as jnp

    from funcodec_tpu.data.wav_io import read_wav, write_wav

    x = np.clip(np.random.RandomState(3).randn(4096) * 0.5, -0.99, 0.99).astype(np.float32)
    write_wav(tmp_path / "i.wav", x, 16000)
    sr, raw = read_wav(tmp_path / "i.wav", normalize=False)
    assert raw.dtype == np.int16
    sr2, norm = read_wav(tmp_path / "i.wav")
    dequant = np.asarray(jnp.asarray(raw).astype(jnp.float32) * (1.0 / 32768.0))
    np.testing.assert_array_equal(dequant, norm)


def test_pipeline_model_reuse(tiny_env):
    """inference_pipeline(model=...) (server mode) must produce byte-identical
    codecs.txt to the construct-per-call path."""
    from funcodec_tpu.cli.codec_inference import Speech2Token, inference_pipeline

    root = tiny_env["root"]
    model = Speech2Token(str(root / "config.yaml"), str(root / "model.pth"),
                         bit_width=None)
    out_dir = root / "reuse_out"
    for i in range(2):  # second call reuses every jitted fn
        inference_pipeline(
            output_dir=str(out_dir),
            config_file=str(root / "config.yaml"),
            model_file=str(root / "model.pth"),
            data_path_and_name_and_type=[(str(root / "wav.scp"), "speech", "sound")],
            batch_size=1,
            bit_width=None,
            run_mod="encode",
            model=model,
        )
    ref = (root / "enc_out" / "codecs.txt").read_text()
    assert (out_dir / "codecs.txt").read_text() == ref
