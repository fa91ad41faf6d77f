"""Streaming session parity: chunked causal inference must reproduce the
whole-utterance computation exactly (models/streaming.py).

The reference has no streaming runtime (its segment mode crossfades with a
triangular window, codec_basic.py:287-298); the contract here is stronger —
sample-exact equality with the one-shot forward — so the oracle is our own
whole-utterance path, which is itself torch-parity-tested elsewhere
(tests/test_conv_parity.py, test_fullshape_parity.py).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from funcodec_tpu.models.seanet import (
    SEANetConfig,
    SEANetDecoder,
    SEANetEncoder,
)
from funcodec_tpu.models.streaming import (
    StreamingCodecSession,
    init_stream_state,
    stream_layers,
)


def causal_cfg(**kw):
    base = dict(
        causal=True,
        norm="weight_norm",
        pad_mode="reflect",
        n_filters=8,
        dimension=16,
        ratios=(8, 5, 4, 2),
        seq_model="lstm",
    )
    base.update(kw)
    return SEANetConfig(**base)


def _stream_all(layers, params, x, chunks, flush=False):
    """Drive stream_layers over chunk splits; returns concatenated output."""
    state = init_stream_state(layers, x.shape[0])
    outs = []
    start = 0
    for i, L in enumerate(chunks):
        seg = x[:, start : start + L]
        start += L
        last = flush and i == len(chunks) - 1
        y, state = stream_layers(
            layers, params, state, seg, primed=(i > 0), flush=last
        )
        outs.append(np.asarray(y))
    assert start == x.shape[1]
    return np.concatenate(outs, axis=1)


@pytest.mark.parametrize(
    "chunks,pad_mode",
    [
        # reflect: first chunk must cover the deepest receptive field + 1
        # (min_first_chunk = 2240 for this topology)
        ((2240, 640, 640, 640), "reflect"),
        ((2560, 320, 320), "reflect"),
        # constant: no first-chunk minimum — start with a single frame
        ((320, 320, 1600, 320), "constant"),
    ],
)
def test_encoder_stream_matches_full(chunks, pad_mode):
    cfg = causal_cfg(pad_mode=pad_mode)
    enc = SEANetEncoder(cfg)
    params = enc.init(jax.random.PRNGKey(0))
    x = jnp.asarray(
        np.random.RandomState(0).randn(2, sum(chunks), 1).astype(np.float32)
    )
    full = np.asarray(enc(params, x))
    streamed = _stream_all(enc.layers, params, x, chunks)
    assert streamed.shape == full.shape
    np.testing.assert_allclose(streamed, full, rtol=0, atol=2e-5)


def test_encoder_stream_snake_true_skip():
    cfg = causal_cfg(
        add_snake_activation=True, true_skip=True, n_residual_layers=2,
        seq_model="none", pad_mode="constant",
    )
    enc = SEANetEncoder(cfg)
    params = enc.init(jax.random.PRNGKey(1))
    T = 320 * 12
    x = jnp.asarray(np.random.RandomState(1).randn(1, T, 1).astype(np.float32))
    full = np.asarray(enc(params, x))
    streamed = _stream_all(enc.layers, params, x, (320 * 7, 320 * 2, 320 * 3))
    np.testing.assert_allclose(streamed, full, rtol=0, atol=2e-5)


@pytest.mark.parametrize("trim_right_ratio", [1.0, 0.5, 0.0])
def test_decoder_stream_matches_full(trim_right_ratio):
    cfg = causal_cfg(trim_right_ratio=trim_right_ratio)
    dec = SEANetDecoder(cfg)
    params = dec.init(jax.random.PRNGKey(2))
    T = 24  # frames
    z = jnp.asarray(
        np.random.RandomState(2).randn(2, T, cfg.dimension).astype(np.float32)
    )
    full = np.asarray(dec(params, z))
    streamed = _stream_all(dec.layers, params, z, (8, 8, 4, 4), flush=True)
    assert streamed.shape == full.shape, (streamed.shape, full.shape)
    np.testing.assert_allclose(streamed, full, rtol=0, atol=2e-4)


def test_decoder_empty_input_flush_cascade():
    """Ending a stream with a zero-length flush (session.flush() path): the
    held-back transposed-conv tails cascade through downstream layers and the
    concatenation still equals the whole-utterance output (trim < 1)."""
    cfg = causal_cfg(trim_right_ratio=0.5)
    dec = SEANetDecoder(cfg)
    params = dec.init(jax.random.PRNGKey(9))
    T = 16
    z = jnp.asarray(
        np.random.RandomState(9).randn(1, T, cfg.dimension).astype(np.float32)
    )
    full = np.asarray(dec(params, z))
    state = init_stream_state(dec.layers, 1)
    outs = []
    for i, (lo, hi) in enumerate([(0, 8), (8, 16)]):
        y, state = stream_layers(dec.layers, params, state, z[:, lo:hi], primed=(i > 0))
        outs.append(np.asarray(y))
    empty = jnp.zeros((1, 0, cfg.dimension), jnp.float32)
    tail, _ = stream_layers(dec.layers, params, state, empty, primed=True, flush=True)
    outs.append(np.asarray(tail))
    streamed = np.concatenate(outs, axis=1)
    assert streamed.shape == full.shape, (streamed.shape, full.shape)
    np.testing.assert_allclose(streamed, full, rtol=0, atol=2e-4)


def _tiny_codec(cfg, key=3, n_q=4):
    from funcodec_tpu.models.encodec import Encodec, EncodecConfig
    from funcodec_tpu.models.quantizer import Quantizer, QuantizerConfig

    quant = Quantizer(
        QuantizerConfig(
            input_size=cfg.dimension, codebook_size=32, num_quantizers=n_q,
            kmeans_init=False,
        )
    )
    model = Encodec(
        EncodecConfig(target_sample_hz=16000, audio_normalize=False),
        SEANetEncoder(cfg), quant, SEANetDecoder(cfg),
    )
    params, rvq_state = model.init(jax.random.PRNGKey(key))
    # random codebooks so encode produces non-trivial ids
    rvq_state = rvq_state.replace(
        embed=jnp.asarray(
            np.random.RandomState(7).randn(*rvq_state.embed.shape), jnp.float32
        ),
        inited=jnp.ones_like(rvq_state.inited),
        cluster_size=jnp.ones_like(rvq_state.cluster_size),
    )
    return model, params, rvq_state


def test_session_end_to_end_token_and_sample_parity():
    cfg = causal_cfg()
    model, params, rvq_state = _tiny_codec(cfg)

    T = 320 * 20
    wav = jnp.asarray(
        np.random.RandomState(4).randn(2, T).astype(np.float32) * 0.1
    )

    # whole-utterance oracle: same encode->decode path the session uses
    out = model.inference_encoding(
        params, rvq_state, wav, need_recon=True, use_scale=False
    )
    full_tokens = np.asarray(out["code_indices"][0])  # (n_q, B, T')
    full_recon = np.asarray(out["recon_speech"])

    sess = StreamingCodecSession(model, params, rvq_state, batch=2)
    tok_chunks, wav_chunks = [], []
    for lo in (0, 8, 12):
        hi = {0: 8, 8: 12, 12: 20}[lo]
        chunk = wav[:, lo * 320 : hi * 320]
        toks = sess.encode_chunk(chunk)
        tok_chunks.append(np.asarray(toks))
        wav_chunks.append(np.asarray(sess.decode_chunk(toks)))
    tail = sess.flush()
    if tail is not None:
        wav_chunks.append(np.asarray(tail))

    streamed_tokens = np.concatenate(tok_chunks, axis=2)
    streamed_recon = np.concatenate(wav_chunks, axis=1)
    np.testing.assert_array_equal(streamed_tokens, full_tokens)
    assert streamed_recon.shape == full_recon.shape
    np.testing.assert_allclose(streamed_recon, full_recon, rtol=0, atol=2e-4)


def test_session_guards():
    from funcodec_tpu.models.streaming import min_first_chunk

    cfg = causal_cfg()
    model, params, rvq_state = _tiny_codec(cfg, key=5, n_q=2)
    # bottleneck conv k=7 (pt 6, reflect -> 7 samples) at hop 320 dominates
    assert min_first_chunk(model.encoder.layers) == 7 * 320
    assert min_first_chunk(
        SEANetEncoder(causal_cfg(pad_mode="constant")).layers
    ) == 0
    sess = StreamingCodecSession(model, params, rvq_state, batch=1)
    with pytest.raises(ValueError, match="multiple of hop"):
        sess.encode_chunk(jnp.zeros((1, 321)))
    with pytest.raises(ValueError, match="first chunk"):
        sess.encode_chunk(jnp.zeros((1, 320)))

    # non-streamable configs are rejected with actionable messages
    m2, p2, s2 = _tiny_codec(causal_cfg(causal=False), key=6, n_q=2)
    with pytest.raises(ValueError, match="causal"):
        StreamingCodecSession(m2, p2, s2)
    m3, p3, s3 = _tiny_codec(causal_cfg(norm="time_group_norm"), key=6, n_q=2)
    with pytest.raises(ValueError, match="time_group_norm"):
        StreamingCodecSession(m3, p3, s3)
