"""Continuous-batching TTS serving session for Laura codec LMs.

The reference decodes strictly batch-1, rebuilding the full prefix every
token (funcodec/bin/text2audio_inference.py -> laura_model.py:501-548,
"not use state"). This repo's `decode_codec_batch` already advances B
streams through one shared KV-cache while_loop — but in LOCKSTEP: the batch
runs until its LAST row emits eos, so early finishers burn their slot doing
masked work. Under mixed generation lengths that wastes a large fraction of
slot-steps (measured in artifacts/tts_serving_r5.json).

`LauraServingSession` is the TPU-native fix — vLLM-style continuous
batching shaped for XLA's static-shape compilation model:

  * B fixed SLOTS over one (B, capacity) KV cache; all shapes static, so
    two jitted programs (admit + segment) plus O(#length-buckets) prefix
    programs serve the whole session — the compile count is constant after
    warmup no matter how ragged the request stream is.
  * The decode loop runs in SEGMENTS of `segment_steps` iterations inside
    one `lax.while_loop` dispatch; between segments the host harvests
    finished rows and admits queued requests into freed slots.
  * Every slot has its OWN write head (`cache.length` is a (B,) vector —
    apply_encoder_step's per-row mode): admission writes the request's
    prefix right-aligned into its slot's window [0, prefix_budget) and the
    row generates from prefix_budget upward, restarting at its own base.
    Relative-position distances are therefore exactly those of a fresh
    batch-1 decode; stale keys from the slot's previous occupant are either
    below the row's valid-key lower bound or overwritten by this request's
    own generation before they are causally visible.
  * Per-slot heads make capacity MINIMAL and admission UNCONDITIONAL:
    capacity = prefix_budget + max_new + 1 (each step attends over the
    smallest static window that can hold any request), and a freed slot
    re-admits immediately — no shared-head "era" whose tail drains every
    slot before new work can start, and no head rewinds. (An earlier
    shared-head design measured 19% extra slot-steps from era drains plus
    1.27x slower steps from attending over a 2-4x capacity window;
    artifacts/tts_serving_r5.json records both designs.)
  * Per-row PRNG keys reproduce `decode_codec`'s sampling stream exactly:
    a session decode of a request equals the batch-1 decode of the same
    request with the same key (tests/test_tts_serving.py).

Supports rel_pos/none position encodings (the shipped LauraTTS topology);
split-PE needs per-row absolute positions and keeps to the lockstep path.
"""

from __future__ import annotations

from collections import deque
from typing import Any, Dict, List, Optional, Tuple, Union

import numpy as np

import jax
import jax.numpy as jnp
from flax import struct
from jax import lax

from funcodec_tpu.models import transformer as tfm
from funcodec_tpu.models.transformer import (
    KVCache,
    apply_encoder_step,
    init_kv_cache,
    precompute_rel_proj,
)


@struct.dataclass
class SessionState:
    cache: KVCache
    logits: jnp.ndarray  # (B, nq*V) last logits per slot
    toks: jnp.ndarray  # (B, max_new, nq) int32 emitted tokens
    counts: jnp.ndarray  # (B,) int32 emitted so far
    row_max: jnp.ndarray  # (B,) int32 per-request generation cap
    live: jnp.ndarray  # (B,) bool — slot actively generating
    keys: jnp.ndarray  # (B, 2) uint32 per-row PRNG keys
    valid_key: jnp.ndarray  # (B, capacity) bool attention validity


class LauraServingSession:
    """Slot-based continuous-batching decode over one Laura codec LM.

    Usage::

        sess = LauraServingSession(model, params, num_slots=8)
        sess.submit("utt1", text_feats, key=jax.random.PRNGKey(1))
        ...
        finished = sess.drain()       # {uid: (T, nq) int32 tokens}

    or incrementally: ``submit()`` any time, ``poll()`` per scheduling tick.
    """

    def __init__(
        self,
        model,
        params,
        num_slots: int = 8,
        max_new: int = 30 * 25,
        prefix_budget: int = 256,
        capacity: Optional[int] = None,
        sampling: Union[bool, int, float] = 0.8,
        segment_steps: int = 25,
        text_bucket: int = 32,
        prompt_bucket: int = 32,
        device=None,
        share_fns_with: Optional["LauraServingSession"] = None,
    ):
        cfg, lm_cfg = model.cfg, model.codec_lm_cfg
        if cfg.lm_pe_type == "split" or lm_cfg.pos_enc_type not in (
            "rel_pos", "none"
        ):
            raise NotImplementedError(
                "continuous batching needs position-shift-invariant attention "
                "(rel_pos/none); split-PE models use decode_codec_batch"
            )
        self.model = model
        self.device = device
        if device is not None:
            # pin this session to one chip: committed params make every
            # jitted dispatch (admit/segment/prefix) execute on `device`,
            # so N sessions serve N chips from one process (ServingPool)
            params = jax.device_put(params, device)
        self.params = params
        self.cfg, self.lm_cfg = cfg, lm_cfg
        self.B = int(num_slots)
        self.max_new = int(max_new)
        self.prefix_budget = int(prefix_budget)
        # per-slot heads need only the single-request window; larger values
        # are accepted (useful for A/B) but every step attends over them
        self.capacity = int(
            capacity if capacity is not None
            else prefix_budget + max_new + 1
        )
        assert self.capacity >= self.prefix_budget + self.max_new + 1
        self.sampling = sampling
        self.segment_steps = int(segment_steps)
        self.text_bucket = max(1, int(text_bucket))
        self.prompt_bucket = max(1, int(prompt_bucket))
        self.eos = cfg.codebook_size + cfg.sos_eos

        cache_dtype = params["lm_decoder"]["w"].dtype
        nq = cfg.predict_nq
        v_out = params["lm_decoder"]["w"].shape[1] // nq
        cache = init_kv_cache(lm_cfg, self.B, self.capacity, dtype=cache_dtype)
        # per-row heads: every slot starts at the prefix budget so the
        # admission window [0, prefix_budget) is in range for any
        # llm_len <= budget and generation grows from prefix_budget
        cache = cache.replace(
            length=jnp.full((self.B,), self.prefix_budget, jnp.int32)
        )
        self.state = SessionState(
            cache=cache,
            logits=jnp.zeros((self.B, nq * v_out), jnp.float32),
            toks=jnp.zeros((self.B, self.max_new, nq), jnp.int32),
            counts=jnp.zeros((self.B,), jnp.int32),
            row_max=jnp.full((self.B,), self.max_new, jnp.int32),
            live=jnp.zeros((self.B,), bool),
            keys=jnp.zeros((self.B, 2), jnp.uint32),
            valid_key=jnp.zeros((self.B, self.capacity), bool),
        )
        if device is not None:
            self.state = jax.device_put(self.state, device)
        # loop-invariant per-layer pos-projected rel-PE tables (device)
        self._rel_proj = precompute_rel_proj(
            lm_cfg, params["codec_lm"], self.capacity
        )
        # jitted-program cache, shareable between pool members: jax.jit
        # re-specializes per device placement, so sharing the callables skips
        # only the retrace, never mixes executables across chips
        if share_fns_with is not None:
            sib = share_fns_with
            assert (
                sib.model is model
                and (sib.B, sib.max_new, sib.prefix_budget, sib.capacity,
                     sib.sampling, sib.segment_steps)
                == (self.B, self.max_new, self.prefix_budget, self.capacity,
                    self.sampling, self.segment_steps)
            ), "share_fns_with requires identical session configuration"
            self._fns = sib._fns
        else:
            self._fns: Dict[str, Any] = {
                "admit": None, "segment": None, "prefix": {}
            }

        self._queue: deque = deque()  # (uid, emb_pad, llm_len, key, cap)
        self._slot_uid: List[Optional[str]] = [None] * self.B
        self._prompts: Dict[str, np.ndarray] = {}
        self._finished: Dict[str, np.ndarray] = {}
        # utilization accounting for the A/B bench
        self.stats = {"segments": 0, "slot_steps": 0, "live_steps": 0,
                      "emitted": 0}

    # ------------------------------------------------------------------ API

    def submit(
        self,
        uid: str,
        text_feats: np.ndarray,  # (Lt, D) raw text features (or (Lt,) ids)
        key,
        prompt: Optional[np.ndarray] = None,  # (P, nq) continual tokens
        max_new: Optional[int] = None,  # per-request generation cap
    ) -> None:
        """Queue one request. `key` drives this request's sampling stream
        (same key => same tokens as model.decode_codec). `max_new` caps THIS
        request's generation (== decode_codec's max_length); the slot frees
        as soon as the cap or eos is reached, not when the batch finishes —
        the point of continuous batching under mixed output lengths."""
        emb_pad, llm_len = self._prefix_embedding(text_feats, prompt)
        nq = self.cfg.predict_nq
        cap = self.max_new if max_new is None else int(max_new)
        if not 0 < cap <= self.max_new:
            raise ValueError(f"max_new {cap} not in (0, {self.max_new}]")
        self._prompts[uid] = (
            np.asarray(prompt, np.int32).reshape(-1, nq)
            if prompt is not None and len(prompt)
            else np.zeros((0, nq), np.int32)
        )
        self._queue.append(
            (uid, emb_pad, llm_len, jnp.asarray(key, jnp.uint32), cap)
        )

    def poll(self) -> Dict[str, np.ndarray]:
        """One scheduling tick: admit what fits, run one decode segment,
        harvest finished rows. Returns {uid: (T, nq) tokens} finished this
        tick (prompt included, eos removed — decode_codec semantics)."""
        self._admit_ready()
        if not any(u is not None for u in self._slot_uid):
            return self._pop_finished()
        self.state, steps, live_steps = self._segment()(
            self.params, self.state, self._rel_proj
        )
        # ONE host sync per tick: the token buffer rides along with the
        # scalars (50 KB) instead of a second device_get in _harvest — on a
        # tunneled host each extra sync is a full RTT
        live, counts, steps, live_steps, toks = jax.device_get(
            (self.state.live, self.state.counts, steps, live_steps,
             self.state.toks)
        )
        self.stats["segments"] += 1
        self.stats["slot_steps"] += int(steps) * self.B
        self.stats["live_steps"] += int(live_steps)
        self._harvest(live, counts, toks)
        return self._pop_finished()

    def drain(self) -> Dict[str, np.ndarray]:
        """Run ticks until the queue and all slots are empty."""
        out: Dict[str, np.ndarray] = {}
        while self._queue or any(u is not None for u in self._slot_uid):
            out.update(self.poll())
        return out

    # ----------------------------------------------------------- scheduling

    def _admit_ready(self) -> None:
        # per-slot heads: a freed slot re-admits unconditionally — every
        # request fits its slot's own [0, prefix_budget + cap] window
        for slot in range(self.B):
            if not self._queue:
                break
            if self._slot_uid[slot] is not None:
                continue
            uid, emb_pad, llm_len, key, cap = self._queue.popleft()
            self.state = self._admit()(
                self.params, self.state, emb_pad, jnp.int32(llm_len),
                jnp.int32(slot), key, jnp.int32(cap), self._rel_proj,
            )
            self._slot_uid[slot] = uid

    def _harvest(
        self, live: np.ndarray, counts: np.ndarray, toks: np.ndarray
    ) -> None:
        done_slots = [
            s for s in range(self.B)
            if self._slot_uid[s] is not None and not live[s]
        ]
        if not done_slots:
            return
        # host-side slicing of the already-fetched buffer: a device-side
        # fancy gather would bake the index VALUES into the program, so every
        # distinct done-slot combination would be a fresh (remote) compile
        toks = np.asarray(toks)
        for s in done_slots:
            uid = self._slot_uid[s]
            gen = toks[s, : counts[s]]
            self._finished[uid] = np.concatenate(
                [self._prompts.pop(uid), gen], axis=0
            ).astype(np.int32)
            self.stats["emitted"] += int(counts[s])
            self._slot_uid[s] = None

    def _pop_finished(self) -> Dict[str, np.ndarray]:
        out, self._finished = self._finished, {}
        return out

    # -------------------------------------------------------------- jit fns

    @property
    def _prefix_fns(self) -> Dict[Tuple[int, int], Any]:
        return self._fns["prefix"]

    def _prefix_embedding(self, text_feats, prompt) -> Tuple[jnp.ndarray, int]:
        """Exact [sos, text, task](+prompt) prefix embedding, right-aligned
        into the static prefix budget (mirrors decode_codec's prefix path,
        so session tokens match batch-1 tokens for the same key).

        Compile-bounded: text/prompt are padded up to `text_bucket` /
        `prompt_bucket` multiples and the TRUE lengths travel as traced
        scalars, so a ragged serving workload compiles O(#buckets) programs
        instead of one per distinct (text_len, prompt_len) pair — on the
        axon remote compiler each fresh signature costs ~1.4 s to minutes
        (artifacts/tts_serving_r5.json). Padded positions are excluded by
        the same length masks the batched decode path uses
        (encode_text/build_llm_io), so bucketing is token-exact
        (tests/test_tts_serving.py::test_prefix_bucketing)."""
        model, lm_cfg, LP = self.model, self.lm_cfg, self.prefix_budget
        text = np.asarray(text_feats)
        lt = int(text.shape[0])
        P = int(len(prompt)) if prompt is not None else 0
        llm_len = lt + 2 + P  # [sos, text, task](+prompt)
        if llm_len > LP:
            raise ValueError(
                f"prefix {llm_len} exceeds prefix_budget {LP}"
            )
        lt_b = -(-lt // self.text_bucket) * self.text_bucket
        P_b = -(-P // self.prompt_bucket) * self.prompt_bucket if P else 0
        if (lt_b, P_b) not in self._prefix_fns:

            def prefix(params, text, tl, codec, cl):
                text_h, _ = model.encode_text(params, text, tl)
                if P_b:
                    inputs, llm_lens = model.build_llm_io(
                        params, text_h, tl, codec=codec, codec_lengths=cl
                    )
                else:
                    inputs, llm_lens = model.build_llm_io(params, text_h, tl)
                emb = tfm.apply_embed(lm_cfg, params["codec_lm"], inputs)[0]
                # right-align the llm_lens[0] valid rows into the budget
                src = jnp.arange(LP) - (LP - llm_lens[0])
                rows = jnp.take(
                    emb[0], jnp.clip(src, 0, emb.shape[1] - 1), axis=0
                )
                return jnp.where(src[:, None] >= 0, rows, 0)[None]

            self._prefix_fns[(lt_b, P_b)] = jax.jit(prefix)
        if text.ndim == 1:  # token ids: pad with ignore_id (embeds to zero)
            text_pad = np.full((lt_b,), self.cfg.ignore_id, text.dtype)
        else:
            text_pad = np.zeros((lt_b,) + text.shape[1:], text.dtype)
        text_pad[:lt] = text
        codec = np.zeros((1, P_b, self.cfg.predict_nq), np.int32)
        if P:
            codec[0, :P] = np.asarray(prompt, np.int32)
        emb_pad = self._prefix_fns[(lt_b, P_b)](
            self.params, jnp.asarray(text_pad)[None], jnp.asarray([lt]),
            jnp.asarray(codec), jnp.asarray([P]),
        )
        return emb_pad, llm_len

    def _admit(self):
        """Jitted slot admission: prefill the request's prefix right-aligned
        into the slot's own cache window [0, prefix_budget) and arm the row
        (per-slot heads: every request restarts at its slot's base)."""
        if self._fns["admit"] is not None:
            return self._fns["admit"]
        lm_cfg = self.lm_cfg
        LP, capacity = self.prefix_budget, self.capacity

        def admit(params, state: SessionState, emb_pad, llm_len, slot, key,
                  cap, rel_proj):
            row_cache = KVCache(
                k=[lax.dynamic_slice_in_dim(k, slot, 1, 0) for k in state.cache.k],
                v=[lax.dynamic_slice_in_dim(v, slot, 1, 0) for v in state.cache.v],
                length=jnp.int32(0),  # scalar: single-row prefill at [0, LP)
            )
            key_pos = jnp.arange(capacity)
            valid_row = key_pos >= (LP - llm_len)  # (capacity,)
            amask = jnp.broadcast_to(valid_row[None, None, :], (1, LP, capacity))
            h, row_cache = apply_encoder_step(
                lm_cfg, params["codec_lm"], row_cache, emb_pad,
                attend_mask=amask, rel_proj=rel_proj,
            )
            logits_row = tfm._apply_linear(params["lm_decoder"], h[:, -1])[0]
            cache = KVCache(
                k=[
                    lax.dynamic_update_slice(k, rk, (slot, 0, 0, 0))
                    for k, rk in zip(state.cache.k, row_cache.k)
                ],
                v=[
                    lax.dynamic_update_slice(v, rv, (slot, 0, 0, 0))
                    for v, rv in zip(state.cache.v, row_cache.v)
                ],
                # this row's head restarts just past its prefix
                length=state.cache.length.at[slot].set(LP),
            )
            zero_row = jnp.zeros((1,) + state.toks.shape[1:], state.toks.dtype)
            return state.replace(
                cache=cache,
                logits=state.logits.at[slot].set(
                    logits_row.astype(state.logits.dtype)
                ),
                toks=lax.dynamic_update_slice(state.toks, zero_row, (slot, 0, 0)),
                counts=state.counts.at[slot].set(0),
                row_max=state.row_max.at[slot].set(cap),
                live=state.live.at[slot].set(True),
                keys=state.keys.at[slot].set(key),
                valid_key=state.valid_key.at[slot].set(valid_row),
            )

        self._fns["admit"] = jax.jit(admit, donate_argnums=(1,))
        return self._fns["admit"]

    def _segment(self):
        """Jitted decode segment: up to segment_steps AR iterations for all
        live rows (one dispatch). Per-row keys replay decode_codec's stream:
        split once per sampled group, nq-way split inside."""
        if self._fns["segment"] is not None:
            return self._fns["segment"]
        model, cfg, lm_cfg = self.model, self.cfg, self.lm_cfg
        B, nq = self.B, self.cfg.predict_nq
        S, max_new, eos = self.segment_steps, self.max_new, self.eos
        sampling = self.sampling

        def segment(params, state: SessionState, rel_proj):
            def sample_rows(subs, logits):
                def one(sub, logits_row):
                    scores = logits_row.reshape(nq, -1)
                    ks = jax.random.split(sub, nq)
                    return jax.vmap(
                        lambda kk, s: model._sample_group(kk, s, sampling)
                    )(ks, scores).astype(jnp.int32)

                return jax.vmap(one)(subs, logits)

            def cond(st):
                i, _, state = st
                return jnp.logical_and(i < S, jnp.any(state.live))

            def body(st):
                i, ls, state = st
                ls = ls + jnp.sum(state.live.astype(jnp.int32))
                ks = jax.vmap(jax.random.split)(state.keys)  # (B, 2, 2)
                keys = jnp.where(state.live[:, None], ks[:, 0], state.keys)
                groups = sample_rows(ks[:, 1], state.logits)  # (B, nq)
                hits_eos = jnp.any(groups == eos, axis=-1)
                emit = jnp.logical_and(state.live, ~hits_eos)
                idx = jnp.minimum(state.counts, max_new - 1)
                rows = jnp.arange(B)
                cur = state.toks[rows, idx]
                toks = state.toks.at[rows, idx].set(
                    jnp.where(emit[:, None], groups, cur)
                )
                counts = state.counts + emit.astype(jnp.int32)
                live = jnp.logical_and(emit, counts < state.row_max)

                # all rows step together, but only emitting rows WRITE their
                # K/V and advance their own head (write_mask) — dead rows'
                # lanes compute masked junk that never touches the cache;
                # clamp sampled ids out of the codebook-embedding range
                safe = jnp.where(emit[:, None], groups, 0)
                dense = model.calc_dense_vector(
                    params, safe[:, None, :], jnp.ones((B,), jnp.int32)
                )
                x = tfm.apply_embed(lm_cfg, params["codec_lm"], dense)[0]
                h, cache = apply_encoder_step(
                    lm_cfg, params["codec_lm"], state.cache, x,
                    attend_mask=state.valid_key[:, None, :], rel_proj=rel_proj,
                    write_mask=emit,
                )
                logits = tfm._apply_linear(params["lm_decoder"], h[:, -1])
                logits = jnp.where(
                    live[:, None], logits.astype(state.logits.dtype),
                    state.logits,
                )
                return i + 1, ls, state.replace(
                    cache=cache, logits=logits, toks=toks, counts=counts,
                    live=live, keys=keys,
                )

            i, ls, state = lax.while_loop(
                cond, body, (jnp.int32(0), jnp.int32(0), state)
            )
            return state, i, ls

        self._fns["segment"] = jax.jit(segment, donate_argnums=(1,))
        return self._fns["segment"]


class ServingPool:
    """Device-parallel continuous-batching TTS serving: one pinned
    LauraServingSession per chip, fed from a shared queue in one process.

    This is the Laura-path analogue of the codec CLI's ``--data_parallel``
    mesh serving (cli/codec_inference.py:93-156): the reference instead forks
    one python process per GPU and splits the scp by job index
    (funcodec/bin/codec_inference.py:569-579). Params are replicated
    (device_put per chip), requests are load-balanced to the least-loaded
    session, and every session shares one traced-program cache
    (``share_fns_with``) so the pool traces each program once. Outputs are
    token-exact vs batch-1 ``decode_codec`` regardless of which chip served
    the request (tests/test_tts_serving.py::test_serving_pool_multidevice).
    """

    def __init__(self, model, params, devices=None, **session_kwargs):
        devices = list(devices) if devices is not None else jax.devices()
        assert devices, "ServingPool needs at least one device"
        self.sessions: List[LauraServingSession] = []
        for d in devices:
            self.sessions.append(
                LauraServingSession(
                    model, params, device=d,
                    share_fns_with=self.sessions[0] if self.sessions else None,
                    **session_kwargs,
                )
            )
        self._load = [0] * len(self.sessions)  # in-flight requests per chip

    def submit(self, uid, text_feats, key, prompt=None, max_new=None):
        i = min(range(len(self.sessions)), key=self._load.__getitem__)
        self.sessions[i].submit(
            uid, text_feats, key, prompt=prompt, max_new=max_new
        )
        self._load[i] += 1

    def poll(self) -> Dict[str, np.ndarray]:
        out: Dict[str, np.ndarray] = {}
        for i, sess in enumerate(self.sessions):
            done = sess.poll()
            self._load[i] -= len(done)
            out.update(done)
        return out

    def drain(self) -> Dict[str, np.ndarray]:
        out: Dict[str, np.ndarray] = {}
        while any(self._load):
            out.update(self.poll())
        return out

    @property
    def stats(self) -> Dict[str, int]:
        agg: Dict[str, int] = {}
        for sess in self.sessions:
            for k, v in sess.stats.items():
                agg[k] = agg.get(k, 0) + v
        return agg
