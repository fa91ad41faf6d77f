"""Low-latency streaming inference for causal codec models.

The reference defines "streamable" convolutions by their padding arithmetic
(funcodec/modules/normed_modules/conv.py:223-305 — causal = all fixed padding
on the left) but ships no streaming runtime: its inference is whole-utterance
or fixed segments + overlap-add (codec_basic.py:334-359, 77-116). This module
supplies the runtime the padding semantics promise: a chunked session over a
causal SEANet codec that emits, chunk by chunk, EXACTLY the tokens and
samples the whole-utterance path produces — no lookahead, no crossfade
approximation. On TPU each chunk shape compiles once (static lengths) and a
session step is a single jitted dispatch.

Per-layer carries turn the causal stack into an exact sliding computation:

  * forward conv (k, s, d): the causal left padding is ``pt = (k-1)*d-(s-1)``
    (ops/pad.py:conv_padding_total); with chunk lengths divisible by s, each
    chunk emits L/s frames and the carry is the last ``pt`` INPUT samples —
    the next chunk's first window starts exactly there (conv.py:249-258
    semantics; `extra_padding_for_conv1d` is always 0 for s | L).
  * transposed conv (k, s): input frame i writes kernel taps to
    [i*s, i*s + k); chunk outputs overlap the previous chunk's tail by
    ``k - s`` samples. The carry is that bias-free tail; emitted samples are
    final (no future chunk reaches them) so bias/norm apply on emission.
    Causal right-trim ``ceil((k-s)*trim_right_ratio)`` (conv.py:281-305)
    happens once at flush(); the complementary left-trim once at the first
    chunk.
  * LSTM: per-layer (h, c) carries (ops/rnn.py:apply_slstm_streaming).
  * act / snake / 1x1 convs: stateless.

Streamable configs: ``causal=True`` 1D stacks with norm in {none,
weight_norm, layer_norm} — ``time_group_norm`` normalizes over the WHOLE
utterance (conv.py:45-52) and is inherently non-streamable — and seq_model
in {lstm, none} (the transformer bottleneck would need a KV-cache step;
no shipped codec config uses it). RVQ encode/decode is frame-local and
needs no state (quant/rvq.py).
"""

from __future__ import annotations

from typing import Any, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from funcodec_tpu.ops import activations as act_ops
from funcodec_tpu.ops.conv import (
    ConvSpec,
    _apply_post_norm,
    _conv1d_raw,
    apply_sconv1d,
    fused_kernel,
)
from funcodec_tpu.ops.pad import conv_padding_total
from funcodec_tpu.ops.rnn import apply_slstm_streaming
from funcodec_tpu.models.seanet import Layer


def _check_streamable(cfg) -> None:
    if not cfg.causal:
        raise ValueError(
            "streaming needs causal=True (non-causal convs read future samples)"
        )
    if cfg.norm not in ("none", "weight_norm", "layer_norm"):
        raise ValueError(
            f"norm={cfg.norm!r} is not streamable: time_group_norm normalizes "
            "over the whole utterance (conv.py:45-52); use weight_norm for "
            "causal models (the EnCodec causal operating point)"
        )
    if cfg.seq_model == "transformer":
        raise NotImplementedError(
            "streaming transformer bottleneck (needs a KV-cache step); "
            "use seq_model='lstm' or 'none'"
        )


def _fwd_carry_len(spec: ConvSpec) -> int:
    return conv_padding_total(
        int(spec.kernel_size), int(spec.stride), int(spec.dilation)
    )


def min_first_chunk(layers: Sequence[Layer]) -> int:
    """Smallest FIRST chunk (in stack-input units) for exact whole-utterance
    parity. Only reflect padding constrains it: the stream-start left pad
    mirrors the first pt samples AFTER x[0] (ops/pad.py:pad1d_time), so a
    first chunk must cover pt+1 samples at every reflect-padded conv — with a
    shorter one the mirror would need samples from future chunks (reflect
    padding is non-causal at the stream start). constant/zero pads are
    sample-independent and replicate needs only x[0]: no constraint.
    Later chunks have no minimum."""
    from fractions import Fraction
    import math

    need = Fraction(0)
    unit = Fraction(1)  # input units per time step at the current layer

    def conv_need(spec):
        pt = _fwd_carry_len(spec)
        if pt > 0 and spec.pad_mode == "reflect":
            return pt + 1
        return 0

    for kind, spec in layers:
        if kind == "conv" and not spec.transposed:
            need = max(need, conv_need(spec) * unit)
            unit *= int(spec.stride)
        elif kind == "conv" and spec.transposed:
            unit /= int(spec.stride)
        elif kind == "resblock":
            block, _sc = spec
            for bkind, bspec in block:
                if bkind == "conv":
                    need = max(need, conv_need(bspec) * unit)
    return int(math.ceil(need))


def init_stream_state(
    layers: Sequence[Layer], batch: int, dtype=jnp.float32
) -> List[Any]:
    """Zero state pytree matching the layer list (same positional walk as
    seanet.init_layers). Conv carries hold raw inputs; transposed-conv
    carries hold the bias-free overlap tail; LSTM carries are (h, c)."""
    state: List[Any] = []
    for kind, spec in layers:
        if kind == "conv":
            if spec.transposed:
                pt = int(spec.kernel_size) - int(spec.stride)
                state.append(jnp.zeros((batch, pt, spec.out_channels), dtype))
            else:
                pt = _fwd_carry_len(spec)
                state.append(jnp.zeros((batch, pt, spec.in_channels), dtype))
        elif kind == "lstm":
            dim, nlayers, _skip = spec
            state.append(
                [
                    (
                        jnp.zeros((batch, dim), dtype),
                        jnp.zeros((batch, dim), dtype),
                    )
                    for _ in range(nlayers)
                ]
            )
        elif kind == "resblock":
            block, shortcut = spec
            sub = init_stream_state(block, batch, dtype)
            state.append({"block": sub, "shortcut": None})
        else:  # act / snake: stateless
            state.append(None)
    return state


def _stream_conv(
    spec: ConvSpec, params, carry, x, primed: bool, precision=None
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """One causal forward conv on a chunk. Unprimed (first chunk) runs the
    regular padded path — identical to the whole-utterance prefix — and
    primes the carry from the chunk's raw tail."""
    pt = _fwd_carry_len(spec)
    if primed:
        xin = x if pt == 0 else jnp.concatenate([carry.astype(x.dtype), x], axis=1)
        span = (int(spec.kernel_size) - 1) * int(spec.dilation) + 1
        if xin.shape[1] < span:
            # flush cascade can hand us fewer samples than one window: the
            # whole-utterance path emits nothing for them either
            y = jnp.zeros((x.shape[0], 0, spec.out_channels), x.dtype)
        else:
            kernel = fused_kernel(params).astype(x.dtype)
            y = _conv1d_raw(
                xin, kernel, int(spec.stride), int(spec.dilation), spec.groups,
                (0, 0), precision,
            )
            if "bias" in params:
                y = y + params["bias"].astype(y.dtype)
            y = _apply_post_norm(spec, params, y)
    else:
        xin = x
        y = apply_sconv1d(spec, params, x, precision=precision)
    if pt == 0:
        new_carry = carry
    elif not primed and xin.shape[1] < pt:
        # first chunk shorter than the receptive context: the carry includes
        # part of the stream-start left padding. Exact for constant/replicate
        # pads; reflect would need future samples (the session's
        # min_first_chunk guard forbids that case)
        from funcodec_tpu.ops.pad import pad1d_time

        new_carry = pad1d_time(xin, (pt, 0), mode=spec.pad_mode)[:, -pt:]
    elif xin.shape[1] >= pt:
        new_carry = xin[:, xin.shape[1] - pt :]
    else:  # short primed chunk (flush tails): shift the window
        new_carry = jnp.concatenate([carry, xin], axis=1)[:, -pt:]
    return y, new_carry


def _stream_conv_transpose(
    spec: ConvSpec, params, carry, x, primed: bool, flush: bool = False,
    precision=None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """One causal transposed conv on a chunk: overlap-add the carried tail,
    emit the final L*s samples (minus the one-time left trim), carry the new
    bias-free tail. Mirrors apply_sconv_transpose1d (conv.py:281-305) exactly
    when the per-chunk emissions and the flush emission are concatenated.

    `flush=True` marks the END of the stream: in addition to the L*s final
    samples, the kept part of the tail — everything the whole-utterance
    causal trim would NOT discard, pt - ceil(pt*trim_right_ratio) samples —
    is emitted too (empty at trim_right_ratio=1.0)."""
    import math

    k = int(spec.kernel_size)
    s = int(spec.stride)
    pt = k - s
    L = x.shape[1]

    if L > 0:
        kernel = jnp.flip(fused_kernel(params).astype(x.dtype), axis=0)
        y = jax.lax.conv_general_dilated(
            x,
            kernel,
            window_strides=(1,),
            padding=[(k - 1, k - 1)],
            lhs_dilation=(s,),
            dimension_numbers=("NWC", "WIO", "NWC"),
            feature_group_count=spec.groups,
            precision=precision,
        )  # (B, L*s + pt, Cout), untrimmed, bias-free
        if pt > 0:
            head = y[:, :pt] + carry.astype(y.dtype)
            y = jnp.concatenate([head, y[:, pt:]], axis=1)
    else:  # flush cascade reached us with nothing new: only the tail remains
        y = carry

    keep = 0
    if flush and pt > 0:
        keep = pt - math.ceil(pt * spec.trim_right_ratio)
    emit, new_carry = y[:, : L * s + keep], y[:, L * s :]

    if "bias" in params:
        emit = emit + params["bias"].astype(emit.dtype)
    emit = _apply_post_norm(spec, params, emit)
    if not primed:
        # one-time start-of-stream left trim (conv.py:299-305: causal trims
        # ceil(pt*ratio) right — held back until flush — and the remainder
        # left, here)
        pad_right = math.ceil(pt * spec.trim_right_ratio)
        pad_left = pt - pad_right
        if pad_left > 0:
            emit = emit[:, pad_left:]
    return emit, new_carry


def stream_layers(
    layers: Sequence[Layer],
    params: Sequence[Any],
    state: Sequence[Any],
    x: jnp.ndarray,
    primed: bool,
    flush: bool = False,
    precision=None,
) -> Tuple[jnp.ndarray, List[Any]]:
    """One chunk through a causal layer stack with explicit carries.

    `primed=False` (static) is the first-chunk pass: convs take the standard
    causal padded path (so start-of-stream pad_mode semantics — reflect etc. —
    match the whole-utterance computation bit for bit) and initialize their
    carries from raw inputs.

    `flush=True` (static) is the last-chunk pass: transposed convs emit their
    held-back tails in addition to the chunk's samples, and those extra
    samples cascade through the downstream layers like ordinary input. The
    flush input may be zero-length (ending a stream without new frames).
    """
    new_state: List[Any] = []
    for (kind, spec), p, st in zip(layers, params, state):
        if kind == "conv":
            if spec.transposed:
                x, ns = _stream_conv_transpose(
                    spec, p, st, x, primed, flush, precision
                )
            else:
                x, ns = _stream_conv(spec, p, st, x, primed, precision)
            new_state.append(ns)
        elif kind == "act":
            name, kwargs = spec
            x = act_ops.get_activation_fn(name, **kwargs)(x)
            new_state.append(None)
        elif kind == "snake":
            x = act_ops.snake(x, p["alpha"])
            new_state.append(None)
        elif kind == "lstm":
            _dim, _nlayers, skip = spec
            if x.shape[1] == 0:
                new_state.append(st)
            else:
                x, carries = apply_slstm_streaming(p, x, st, skip=skip)
                new_state.append(carries)
        elif kind == "resblock":
            block, shortcut = spec
            y, sub = stream_layers(
                block, p["block"], st["block"], x, primed, flush, precision
            )
            # the block's convs are stride-1 (span-padded): y has x's length
            if shortcut is None:
                sc = x
            else:
                # 1x1 causal conv: pt == 0, stateless
                sc = apply_sconv1d(shortcut, p["shortcut"], x, precision=precision)
            x = sc + y
            new_state.append({"block": sub, "shortcut": None})
        else:
            raise NotImplementedError(f"streaming {kind!r}")
    return x, new_state




class StreamingCodecSession:
    """Chunked encode/decode over a causal Encodec model — live audio in,
    tokens out (and tokens in, audio out) with exact whole-utterance parity.

    The role the reference leaves to segment-wise inference with triangular
    crossfade (codec_basic.py:287-298, an approximation with segment-sized
    latency); this is sample-exact with chunk-sized latency.

        sess = StreamingCodecSession(model, params, rvq_state, batch=1)
        for chunk in audio_chunks:          # (B, L), hop | L
            tokens = sess.encode_chunk(chunk)   # (n_q, B, L/hop)
            wav    = sess.decode_chunk(tokens)  # (B, L)
        tail = sess.flush()

    Scale normalization (use_scale) is a per-segment statistic in the
    reference; a live stream has no segment, so sessions run unscaled
    (use_scale=False semantics — the shipped inference default for tokens).
    Chunk lengths are static per compile; steady-state chunks reuse one
    compiled step per (batch, length) pair.
    """

    def __init__(
        self,
        model,
        params,
        rvq_state,
        batch: int = 1,
        n_q: Optional[int] = None,
        bandwidth: Optional[float] = None,
        dtype=jnp.float32,
        precision=None,
    ):
        enc_cfg = model.encoder.cfg
        dec_cfg = model.decoder.cfg
        _check_streamable(enc_cfg)
        _check_streamable(dec_cfg)
        if getattr(model.cfg, "audio_normalize", False):
            raise ValueError(
                "audio_normalize computes a whole-segment volume statistic "
                "(codec_basic.py:365-371) — not available on a live stream; "
                "build the model with audio_normalize=False (tokens then "
                "match inference_encoding(use_scale=False))"
            )
        self.model = model
        self.params = params
        self.rvq_state = rvq_state
        self.hop = model.encoder.hop_length
        self.dtype = dtype
        self.precision = precision
        if n_q is None:
            n_q = model.quantizer.n_q_for_bandwidth(bandwidth)
        self.n_q = n_q
        self.batch = batch

        self._enc_layers = model.encoder.layers
        self._dec_layers = model.decoder.layers
        self._enc_state = init_stream_state(self._enc_layers, batch, dtype)
        self._dec_state = init_stream_state(self._dec_layers, batch, dtype)
        self._enc_primed = False
        self._dec_primed = False
        self._enc_min = min_first_chunk(self._enc_layers)
        self._dec_min = min_first_chunk(self._dec_layers)
        self._jit_cache = {}

    # -- jitted steps (keyed on role + primed + chunk shape) -----------------

    def _step_fn(self, role: str, primed: bool):
        key = (role, primed)
        if key not in self._jit_cache:
            layers = self._enc_layers if role == "enc" else self._dec_layers
            prec = self.precision

            if role == "enc":

                def fn(params, rvq_state, state, x):
                    y, ns = stream_layers(
                        layers, params["encoder"], state, x[:, :, None],
                        primed, precision=prec,
                    )
                    codes = self.model.quantizer.encode(
                        params["quantizer"], rvq_state, y,
                    )
                    return codes[: self.n_q], ns

            else:

                def fn(params, rvq_state, state, codes):
                    emb = self.model.quantizer.decode(
                        params["quantizer"], rvq_state, codes
                    )
                    y, ns = stream_layers(
                        layers, params["decoder"], state, emb.astype(self.dtype),
                        primed, precision=prec,
                    )
                    return y[:, :, 0], ns

            self._jit_cache[key] = jax.jit(fn, static_argnums=())
        return self._jit_cache[key]

    # -- public API -----------------------------------------------------------

    def encode_chunk(self, wav) -> jnp.ndarray:
        """(B, L) waveform chunk, hop | L -> token ids (n_q, B, L/hop)."""
        wav = jnp.asarray(wav, self.dtype)
        if wav.ndim == 1:
            wav = wav[None]
        L = wav.shape[1]
        if L % self.hop != 0:
            raise ValueError(f"chunk length {L} must be a multiple of hop {self.hop}")
        if not self._enc_primed and L < self._enc_min:
            raise ValueError(
                f"first chunk must be >= {self._enc_min} samples: reflect "
                "padding mirrors the stream start (see min_first_chunk); "
                "shorter first chunks need pad_mode='constant'"
            )
        fn = self._step_fn("enc", self._enc_primed)
        codes, self._enc_state = fn(
            self.params, self.rvq_state, self._enc_state, wav
        )
        self._enc_primed = True
        return codes

    def decode_chunk(self, codes) -> jnp.ndarray:
        """Token ids (n_q', B, Tframes) -> waveform (B, Tframes*hop)."""
        codes = jnp.asarray(codes)
        if not self._dec_primed and codes.shape[2] < self._dec_min:
            raise ValueError(
                f"first chunk must be >= {self._dec_min} frames "
                "(reflect padding mirrors the stream start)"
            )
        fn = self._step_fn("dec", self._dec_primed)
        wav, self._dec_state = fn(
            self.params, self.rvq_state, self._dec_state, codes
        )
        self._dec_primed = True
        return wav

    def flush(self) -> Optional[jnp.ndarray]:
        """End the decode stream: cascade every transposed conv's held-back
        tail through the downstream layers and emit the result. Concatenated
        after the decode_chunk outputs this reproduces the whole-utterance
        decoder output exactly. Empty (None) at trim_right_ratio=1.0, where
        the causal trim discards all tails."""
        if not self._dec_primed:
            return None
        # zero-length decoder input: only the channel count matters
        dim = self._dec_layers[0][1].in_channels
        empty = jnp.zeros((self.batch, 0, dim), self.dtype)
        tail, self._dec_state = stream_layers(
            self._dec_layers, self.params["decoder"], self._dec_state,
            empty, primed=True, flush=True, precision=self.precision,
        )
        return None if tail.shape[1] == 0 else tail[:, :, 0]
