"""Continuous-batching TTS serving session: exactness vs batch-1 decode.

The session's contract (models/tts_serving.py): for any request, a
continuous-batching decode with slot reuse, mixed co-tenants, and head
rewinds produces EXACTLY the tokens of `model.decode_codec` for the same
(text, prompt, key) — rel-pos attention is shift-invariant, so the shared
write head preserves every per-request relative distance.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from funcodec_tpu.models.laura import LauraConfig, LauraGenModel
from funcodec_tpu.models.transformer import TransformerConfig
from funcodec_tpu.models.tts_serving import LauraServingSession, ServingPool


def _tiny_model():
    cfg = LauraConfig(
        input_size=16, num_quantizers=4, codebook_size=24,
        codebook_dim=12, predict_nq=2,
    )
    enc_cfg = TransformerConfig(
        input_size=16, attention_dim=16, attention_heads=2,
        linear_units=24, num_blocks=1, input_layer="linear",
        pos_enc_type="rel_pos", activation="swish",
    )
    codec_enc_cfg = TransformerConfig(
        input_size=12, attention_dim=16, attention_heads=2,
        linear_units=24, num_blocks=1, input_layer="linear",
        pos_enc_type="rel_pos", activation="swish",
    )
    lm_cfg = TransformerConfig(
        input_size=12, attention_dim=16, attention_heads=2,
        linear_units=24, num_blocks=2, input_layer="linear_relu",
        pos_enc_type="rel_pos",
    )
    model = LauraGenModel(cfg, enc_cfg, codec_enc_cfg, lm_cfg)
    params = model.init(jax.random.PRNGKey(0))
    params["quantizer_codebook"] = (
        jax.random.normal(
            jax.random.PRNGKey(7), params["quantizer_codebook"].shape
        )
        * 0.5
    )
    return model, params


def _requests(n, rng):
    """Ragged texts, some with continual prompts, one key per request."""
    reqs = []
    for i in range(n):
        lt = int(rng.randint(3, 8))
        text = rng.randn(lt, 16).astype(np.float32)
        plen = int(rng.randint(0, 4)) if i % 2 else 0
        prompt = (
            rng.randint(0, 24, (plen, 2)).astype(np.int64) if plen else None
        )
        reqs.append((f"utt{i}", text, prompt, jax.random.PRNGKey(100 + i)))
    return reqs


def _singles(model, params, reqs, max_new, sampling):
    out = {}
    for uid, text, prompt, key in reqs:
        toks = model.decode_codec(
            params,
            jnp.asarray(text)[None],
            jnp.asarray([text.shape[0]]),
            max_length=max_new,
            sampling=sampling,
            key=key,
            continual=prompt,
        )
        out[uid] = np.asarray(toks)[0]
    return out


@pytest.mark.parametrize("sampling", [False, 0.8])
def test_session_matches_single_decode(sampling):
    """Drain through 2 slots == per-request batch-1 decode, token-exact."""
    model, params = _tiny_model()
    rng = np.random.RandomState(0)
    reqs = _requests(6, rng)
    max_new = 16
    singles = _singles(model, params, reqs, max_new, sampling)

    sess = LauraServingSession(
        model, params, num_slots=2, max_new=max_new, prefix_budget=16,
        sampling=sampling, segment_steps=5,
    )
    for uid, text, prompt, key in reqs:
        sess.submit(uid, text, key, prompt=prompt)
    out = sess.drain()

    assert set(out) == {r[0] for r in reqs}
    for uid in out:
        np.testing.assert_array_equal(
            out[uid], singles[uid], err_msg=f"{uid} diverged from batch-1"
        )
    # slot reuse happened (6 requests over 2 slots) and the accounting moved
    assert sess.stats["segments"] >= 3
    assert 0 < sess.stats["live_steps"] <= sess.stats["slot_steps"]


def test_session_slot_reuse_minimal_capacity_exact():
    """At the minimum window (prefix + max_new + 1, the per-slot-head
    default) slots are reused across many requests — each re-admission
    overwrites the previous occupant's prefix region and generates over its
    stale K/V — and outputs stay exact."""
    model, params = _tiny_model()
    rng = np.random.RandomState(1)
    reqs = _requests(5, rng)
    max_new = 12
    singles = _singles(model, params, reqs, max_new, 0.8)

    sess = LauraServingSession(
        model, params, num_slots=2, max_new=max_new, prefix_budget=16,
        capacity=16 + max_new + 1,  # minimum legal: one generation depth
        sampling=0.8, segment_steps=4,
    )
    for uid, text, prompt, key in reqs:
        sess.submit(uid, text, key, prompt=prompt)
    out = sess.drain()

    assert set(out) == {r[0] for r in reqs}
    for uid in out:
        np.testing.assert_array_equal(
            out[uid], singles[uid], err_msg=f"{uid} diverged on slot reuse"
        )


def test_session_incremental_submit():
    """Requests submitted mid-flight join freed slots and stay exact."""
    model, params = _tiny_model()
    rng = np.random.RandomState(2)
    reqs = _requests(4, rng)
    max_new = 10
    singles = _singles(model, params, reqs, max_new, 0.8)

    sess = LauraServingSession(
        model, params, num_slots=2, max_new=max_new, prefix_budget=16,
        sampling=0.8, segment_steps=3,
    )
    out = {}
    pending = list(reqs)
    # submit two, then trickle the rest in one per tick
    for uid, text, prompt, key in pending[:2]:
        sess.submit(uid, text, key, prompt=prompt)
    pending = pending[2:]
    for _ in range(100):
        if pending:
            uid, text, prompt, key = pending.pop(0)
            sess.submit(uid, text, key, prompt=prompt)
        out.update(sess.poll())
        if len(out) == len(reqs):
            break
    assert len(out) == len(reqs)
    for uid in out:
        np.testing.assert_array_equal(out[uid], singles[uid])


def test_session_per_request_caps():
    """Per-request max_new == decode_codec with that max_length, exactly."""
    model, params = _tiny_model()
    rng = np.random.RandomState(3)
    reqs = _requests(5, rng)
    caps = [4, 11, 7, 16, 2]

    singles = {}
    for (uid, text, prompt, key), cap in zip(reqs, caps):
        toks = model.decode_codec(
            params, jnp.asarray(text)[None], jnp.asarray([text.shape[0]]),
            max_length=cap, sampling=0.8, key=key, continual=prompt,
        )
        singles[uid] = np.asarray(toks)[0]

    sess = LauraServingSession(
        model, params, num_slots=3, max_new=16, prefix_budget=16,
        sampling=0.8, segment_steps=4,
    )
    for (uid, text, prompt, key), cap in zip(reqs, caps):
        sess.submit(uid, text, key, prompt=prompt, max_new=cap)
    out = sess.drain()
    for uid in out:
        np.testing.assert_array_equal(
            out[uid], singles[uid], err_msg=f"{uid} diverged under cap"
        )
    with pytest.raises(ValueError):
        sess.submit("bad", reqs[0][1], reqs[0][3], max_new=99)


def test_prefix_bucketing_exact_and_compile_bounded():
    """Ragged (text_len, prompt_len) requests compile O(#buckets) prefix
    programs (not one per distinct pair) and stay token-exact vs batch-1
    decode, including lengths that straddle bucket boundaries."""
    model, params = _tiny_model()
    rng = np.random.RandomState(4)
    # text lengths sweep 1..8 with bucket 4 -> exactly 2 text buckets;
    # prompts of length 0..3 with bucket 4 -> 1 prompt bucket (+ none)
    reqs = []
    for i, lt in enumerate([1, 3, 4, 5, 7, 8, 2, 6]):
        text = rng.randn(lt, 16).astype(np.float32)
        plen = i % 4
        prompt = (
            rng.randint(0, 24, (plen, 2)).astype(np.int64) if plen else None
        )
        reqs.append((f"utt{i}", text, prompt, jax.random.PRNGKey(200 + i)))
    max_new = 8
    singles = _singles(model, params, reqs, max_new, 0.8)

    sess = LauraServingSession(
        model, params, num_slots=2, max_new=max_new, prefix_budget=16,
        sampling=0.8, segment_steps=4, text_bucket=4, prompt_bucket=4,
    )
    for uid, text, prompt, key in reqs:
        sess.submit(uid, text, key, prompt=prompt)
    # 8 distinct (lt, P) pairs collapse to <= 2 text buckets x 2 prompt
    # classes = 4 prefix programs
    assert len(sess._prefix_fns) <= 4, sorted(sess._prefix_fns)
    out = sess.drain()
    assert set(out) == {r[0] for r in reqs}
    for uid in out:
        np.testing.assert_array_equal(
            out[uid], singles[uid], err_msg=f"{uid} diverged under bucketing"
        )


def test_prefix_bucketing_token_ids():
    """1-D token-id texts pad with ignore_id and stay exact under buckets."""
    cfg = LauraConfig(
        input_size=16, num_quantizers=4, codebook_size=24,
        codebook_dim=12, predict_nq=2, vocab_size=11,
    )
    enc_cfg = TransformerConfig(
        input_size=16, attention_dim=16, attention_heads=2,
        linear_units=24, num_blocks=1, input_layer="linear",
        pos_enc_type="rel_pos", activation="swish",
    )
    codec_enc_cfg = TransformerConfig(
        input_size=12, attention_dim=16, attention_heads=2,
        linear_units=24, num_blocks=1, input_layer="linear",
        pos_enc_type="rel_pos", activation="swish",
    )
    lm_cfg = TransformerConfig(
        input_size=12, attention_dim=16, attention_heads=2,
        linear_units=24, num_blocks=2, input_layer="linear_relu",
        pos_enc_type="rel_pos",
    )
    model = LauraGenModel(cfg, enc_cfg, codec_enc_cfg, lm_cfg)
    params = model.init(jax.random.PRNGKey(0))
    rng = np.random.RandomState(5)
    reqs = []
    for i, lt in enumerate([2, 3, 5]):
        ids = rng.randint(0, 11, (lt,)).astype(np.int32)
        reqs.append((f"utt{i}", ids, None, jax.random.PRNGKey(300 + i)))
    max_new = 6
    singles = _singles(model, params, reqs, max_new, False)
    sess = LauraServingSession(
        model, params, num_slots=2, max_new=max_new, prefix_budget=16,
        sampling=False, segment_steps=3, text_bucket=4,
    )
    for uid, ids, prompt, key in reqs:
        sess.submit(uid, ids, key)
    assert len(sess._prefix_fns) <= 2
    out = sess.drain()
    for uid in out:
        np.testing.assert_array_equal(out[uid], singles[uid])


def test_serving_pool_multidevice():
    """N device-pinned sessions fed by one shared queue: every request's
    tokens are exact vs batch-1 decode no matter which device served it,
    and the load balancer actually spreads requests."""
    devices = jax.devices()
    if len(devices) < 2:
        pytest.skip("needs >=2 devices (conftest forces an 8-device CPU mesh)")
    model, params = _tiny_model()
    rng = np.random.RandomState(6)
    reqs = _requests(8, rng)
    max_new = 10
    singles = _singles(model, params, reqs, max_new, 0.8)

    pool = ServingPool(
        model, params, devices=devices[:3], num_slots=2, max_new=max_new,
        prefix_budget=16, sampling=0.8, segment_steps=4,
    )
    for uid, text, prompt, key in reqs:
        pool.submit(uid, text, key, prompt=prompt)
    served_per_dev = [
        sum(u is not None for u in s._slot_uid) + len(s._queue)
        for s in pool.sessions
    ]
    assert sum(served_per_dev) == len(reqs)
    assert sum(1 for n in served_per_dev if n > 0) >= 2, served_per_dev
    out = pool.drain()
    assert set(out) == {r[0] for r in reqs}
    for uid in out:
        np.testing.assert_array_equal(
            out[uid], singles[uid], err_msg=f"{uid} diverged in the pool"
        )
    # sessions share one traced-program cache
    assert all(s._fns is pool.sessions[0]._fns for s in pool.sessions)
    agg = pool.stats
    assert agg["emitted"] > 0 and agg["live_steps"] <= agg["slot_steps"]


def test_session_rejects_split_pe():
    cfg = LauraConfig(
        input_size=16, num_quantizers=4, codebook_size=24,
        codebook_dim=12, predict_nq=2, lm_pe_type="split",
    )
    lm_cfg = TransformerConfig(
        input_size=12, attention_dim=16, attention_heads=2,
        linear_units=24, num_blocks=1, input_layer="linear_relu",
        pos_enc_type="abs_pos",
    )
    enc_cfg = TransformerConfig(
        input_size=16, attention_dim=16, attention_heads=2,
        linear_units=24, num_blocks=1, input_layer="linear",
        pos_enc_type="rel_pos", activation="swish",
    )
    model = LauraGenModel(cfg, enc_cfg, enc_cfg, lm_cfg)
    with pytest.raises(NotImplementedError):
        LauraServingSession(model, params=None, num_slots=2)
