"""Data-parallel serving over a device mesh (Speech2Token data_parallel=N).

The reference scales batch inference by forking one process per GPU and
splitting the scp (egs/LibriTTS/codec/encoding_decoding.sh:70-98 via
split_scp.pl + run.pl); the TPU-native equivalent is ONE process sharding
each batch over a 1-D "data" mesh with replicated params. These tests pin
the contract on the emulated 8-device CPU mesh: the public artifacts
(codecs.txt, reconstructed wavs) must be identical to the single-device
run, including when the batch size does not divide the mesh (pad rows).
"""

import json
import os

import numpy as np
import pytest
import yaml


@pytest.fixture(scope="module")
def tiny_env(tmp_path_factory):
    """Tiny random-init codec config + a wav.scp of varied-length wavs."""
    root = tmp_path_factory.mktemp("sharded")
    config = {
        "input_size": 1,
        "encoder": "encodec_seanet_encoder",
        "encoder_conf": {"n_filters": 8, "ratios": [4, 2], "causal": True},
        "quantizer": "costume_quantizer",
        "quantizer_conf": {
            "codebook_size": 64, "num_quantizers": 4, "ema_decay": 0.99,
            "kmeans_init": False, "sampling_rate": 16000,
            "encoder_hop_length": 8, "use_ddp": True,
        },
        "decoder": "encodec_seanet_decoder",
        "decoder_conf": {"n_filters": 8, "ratios": [4, 2], "causal": True},
        "model": "encodec",
        "model_conf": {
            "odim": 32, "target_sample_hz": 16000, "audio_normalize": True,
            "segment_dur": None, "overlap_ratio": None,
        },
    }
    with open(root / "config.yaml", "w") as f:
        yaml.safe_dump(config, f)

    from funcodec_tpu.data.wav_io import write_wav

    rng = np.random.RandomState(0)
    os.makedirs(root / "wavs", exist_ok=True)
    keys = []
    # 5 utterances (not a multiple of any dp we test) at two bucket lengths
    for i, t in enumerate([1280, 1280, 2560, 2560, 2560]):
        key = f"utt{i}"
        w = (0.3 * np.sin(2 * np.pi * (150 + 40 * i) * np.arange(t) / 16000)
             + 0.05 * rng.randn(t)).astype(np.float32)
        write_wav(root / "wavs" / f"{key}.wav", w, 16000)
        keys.append(key)
    with open(root / "wav.scp", "w") as f:
        for key in keys:
            f.write(f"{key} {root/'wavs'}/{key}.wav\n")
    return root


def _run(root, out_name, run_mod, dp, batch_size, data=None):
    from funcodec_tpu.cli.codec_inference import inference_pipeline

    out_dir = root / out_name
    inference_pipeline(
        output_dir=str(out_dir),
        config_file=str(root / "config.yaml"),
        model_file=str(root / "missing.ckpt"),  # deterministic random init
        data_path_and_name_and_type=[
            data if data is not None
            else (str(root / "wav.scp"), "speech", "sound")
        ],
        batch_size=batch_size,
        bit_width=None,
        run_mod=run_mod,
        need_indices=True,
        data_parallel=dp,
    )
    return out_dir


def _read_wavs(out_dir):
    from funcodec_tpu.data.wav_io import read_wav

    out = {}
    for f in sorted(os.listdir(out_dir)):
        if f.endswith(".wav"):
            _, w = read_wav(os.path.join(out_dir, f), normalize=False)
            out[f] = w
    return out


def test_sharded_inference_matches_single_device(tiny_env):
    """Full inference (encode+decode): batch 4 over an 8-device mesh (pad
    rows exercised: 5 utts -> batches of 4+1, 1 padded to 8) must write
    byte-identical codecs.txt and PCM-identical wavs vs one device."""
    ref = _run(tiny_env, "ref_out", "inference", dp=1, batch_size=4)
    shd = _run(tiny_env, "shd_out", "inference", dp=8, batch_size=4)

    assert (shd / "codecs.txt").read_text() == (ref / "codecs.txt").read_text()
    ref_wavs, shd_wavs = _read_wavs(ref), _read_wavs(shd)
    assert set(ref_wavs) == set(shd_wavs) and len(ref_wavs) == 5
    for k in ref_wavs:
        np.testing.assert_array_equal(shd_wavs[k], ref_wavs[k])


def test_sharded_decode_matches_single_device(tiny_env):
    """codec_json decode path sharded over 4 devices == single device."""
    enc = _run(tiny_env, "enc_only", "encode", dp=2, batch_size=5)
    data = (str(enc / "codecs.txt"), "speech", "codec_json")
    ref = _run(tiny_env, "dec_ref", "decode", dp=1, batch_size=3, data=data)
    shd = _run(tiny_env, "dec_shd", "decode", dp=4, batch_size=3, data=data)
    ref_wavs, shd_wavs = _read_wavs(ref), _read_wavs(shd)
    assert set(ref_wavs) == set(shd_wavs) and len(ref_wavs) == 5
    for k in ref_wavs:
        np.testing.assert_array_equal(shd_wavs[k], ref_wavs[k])


def test_put_rows_pads_and_collect_strips(tiny_env):
    """Direct API: a batch of 3 on a dp=4 mesh pads one row on device and
    strips it in collect(); outputs match the unsharded call exactly."""
    from funcodec_tpu.cli.codec_inference import Speech2Token

    cfg = str(tiny_env / "config.yaml")
    m1 = Speech2Token(cfg, str(tiny_env / "missing.ckpt"), bit_width=None)
    m4 = Speech2Token(cfg, str(tiny_env / "missing.ckpt"), bit_width=None,
                      data_parallel=4)
    rng = np.random.RandomState(3)
    speech = rng.randn(3, 1024).astype(np.float32) * 0.2

    out4 = m4.dispatch(speech, run_mod="inference")
    assert out4["_row_pad"] == 1
    codes4, _, recon4, _ = Speech2Token.collect(out4)
    codes1, _, recon1, _ = m1.collect(m1.dispatch(speech, run_mod="inference"))

    assert codes4[0].shape == codes1[0].shape == (4, 3, 128)
    np.testing.assert_array_equal(codes4[0], codes1[0])
    assert recon4.shape == recon1.shape == (3, 1024)
    np.testing.assert_array_equal(recon4, recon1)
