"""Batch codec inference: wav.scp -> codecs.txt -> reconstructed wavs.

Behavioral reference: funcodec/bin/codec_inference.py (Speech2Token :41-150,
inference_modelscope :164-382, writers :275-311, output naming :358-376).
The public artifacts are byte-compatible: codecs.txt jsonl lines
``uttid [[[q0...],[q1...],...]]``, kaldi ark/scp for indices ("ark" mode) and
codec embeddings, ``{uttid}.wav`` reconstructions (peak-rescaled PCM16).

TPU design: utterances are bucketed to padded static lengths (wrap padding,
like the reference collate's pad_mode="wrap") so each bucket shape compiles
once; compute runs ahead of host I/O.
"""

from __future__ import annotations

import argparse
import json
import logging
import math
import os
from typing import Any, Dict, List, Optional, Sequence, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from funcodec_tpu.compat.torch_import import import_encodec, load_torch_state_dict
from funcodec_tpu.data.kaldi_ark import ArkWriter
from funcodec_tpu.data.wav_io import (
    SoundScpReader,
    read_2column_text,
    read_wav,
    resample,
    save_audio,
    write_wav,
)
from funcodec_tpu.tasks.codec import build_codec_model, load_config


def load_codec_json(json_str: str) -> np.ndarray:
    """codecs.txt line payload -> (T, n_q) (iterable_dataset.py:54-58)."""
    array = np.array(json.loads(json_str))
    if array.ndim == 3:
        array = array[0]
    return array.T


_UNSET = object()

_CACHE_DIR = os.environ.get("FUNCODEC_TPU_COMPILE_CACHE",
                            os.path.expanduser("~/.cache/funcodec_tpu_xla"))


def enable_compile_cache() -> None:
    """Persistent XLA compilation cache: a CLI invocation is a fresh process,
    so without this every serving run re-pays the full compile of each bucket
    shape (tens of seconds on TPU). Idempotent; disable by setting
    FUNCODEC_TPU_COMPILE_CACHE=disabled."""
    if _CACHE_DIR == "disabled":
        return
    try:
        if jax.default_backend() == "cpu":
            # XLA:CPU AOT entries embed compile-machine pseudo-features
            # (+prefer-no-scatter/-gather) that never match at load time, so
            # every cache hit degenerates into an error log + recompile;
            # CPU compiles are cheap enough that the cache only pays on TPU
            return
        cache_dir = os.path.join(_CACHE_DIR, jax.default_backend())
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception as e:  # cache is an optimization, never a hard failure
        logging.warning("compilation cache unavailable: %s", e)


def _init_on_host(model):
    """Build initial (params, rvq_state) on the host CPU backend.

    model.init on the default (TPU) backend dispatches hundreds of tiny init
    ops through the device; on a tunneled device that is ~60 s of round trips
    (probe_cli_stages.py: construct 63 s). CPU init + one device_put of the
    finished tree cuts construction to the single weight transfer."""
    try:
        cpu = jax.devices("cpu")[0]
    except RuntimeError:
        return model.init(jax.random.PRNGKey(0))
    with jax.default_device(cpu):
        params, rvq_state = model.init(jax.random.PRNGKey(0))
    return params, rvq_state


class Speech2Token:
    """Codec model wrapper with run_mod in {inference, encode, decode, decode_emb}.

    `data_parallel=N` serves one batch over N chips: a 1-D ``jax.sharding.Mesh``
    ("data" axis) with params/codebooks replicated and the batch sharded on its
    batch dimension — GSPMD splits every op across the mesh with zero
    collectives (pure data parallelism), so serving throughput scales with
    chips while the public API and outputs stay identical. Batches whose size
    is not a multiple of N are padded by repeating the last row; pad rows are
    stripped in collect(). data_parallel=-1 uses every visible device.
    The reference scales serving by forking one process per GPU and splitting
    the scp (egs/LibriTTS/codec/encoding_decoding.sh:70-98); here one process
    drives the whole mesh.
    """

    def __init__(
        self,
        config_file: str,
        model_file: str,
        dtype: str = "float32",
        sampling_rate: int = 16_000,
        bit_width: Optional[int] = 8_000,
        data_parallel: int = 1,
    ):
        enable_compile_cache()
        self.config = load_config(config_file)
        self.model, _ = build_codec_model(self.config)
        self.sampling_rate = sampling_rate
        self.bit_width = bit_width
        self.dtype = jnp.bfloat16 if dtype == "bfloat16" else jnp.float32

        if model_file and os.path.exists(model_file):
            if model_file.endswith((".pth", ".pt", ".bin")):
                sd = load_torch_state_dict(model_file)
                self.params, self.rvq_state = import_encodec(sd, self.model)
            else:
                from funcodec_tpu.train.checkpoint import load_checkpoint_params

                self.params, self.rvq_state = load_checkpoint_params(model_file, self.model)
        else:
            logging.warning("no model file %s; random init", model_file)
            self.params, self.rvq_state = _init_on_host(self.model)

        ndev = len(jax.devices())
        dp = ndev if (data_parallel is not None and data_parallel < 0) else int(
            data_parallel or 1
        )
        if dp > ndev:
            logging.warning("data_parallel=%d > %d visible devices; clamping",
                            dp, ndev)
            dp = ndev
        self.data_parallel = dp
        if dp > 1:
            from jax.sharding import Mesh, NamedSharding, PartitionSpec

            self.mesh = Mesh(np.asarray(jax.devices()[:dp]), ("data",))
            self._repl = NamedSharding(self.mesh, PartitionSpec())
            self._row_sharding = NamedSharding(self.mesh, PartitionSpec("data"))
            self.params = jax.device_put(self.params, self._repl)
            self.rvq_state = jax.device_put(self.rvq_state, self._repl)
        else:
            self.mesh = None
            dev = jax.devices()[0]
            self._row_sharding = dev
            self.params = jax.device_put(self.params, dev)
            self.rvq_state = jax.device_put(self.rvq_state, dev)
        if self.dtype == jnp.bfloat16:
            # upload fp32, cast on device in ONE jitted tree_map: a host-side
            # ml_dtypes bfloat16 astype of the full tree costs ~17 s on a
            # 1-core host (probe_cli_stages.py) vs milliseconds on device
            cast = jax.jit(lambda t: jax.tree_util.tree_map(
                lambda x: x.astype(jnp.bfloat16)
                if x.dtype == jnp.float32 else x, t))
            self.params = cast(self.params)
        self._jitted: Dict[Any, Any] = {}
        self._pcm16_fn = None

    @property
    def hop_length(self) -> int:
        return self.model.quantizer.cfg.encoder_hop_length

    @property
    def bits_per_quant(self) -> int:
        q = self.model.quantizer.cfg
        return (q.sampling_rate // q.encoder_hop_length) * int(
            math.log2(q.codebook_size)
        )

    def _get_fn(self, run_mod: str, need_recon: bool, bit_width, use_scale: bool):
        key = (run_mod, need_recon, bit_width, use_scale)
        if key not in self._jitted:
            model = self.model

            if run_mod in ("inference", "encode"):
                compute_dtype = self.dtype
                small_codes = (
                    self.model.quantizer.cfg.codebook_size <= 32768
                )

                def fn(params, state, speech):
                    # int16 transport: dequantize on device; x/32768 in fp32
                    # is exact, so the fp32 path stays bit-exact while the
                    # host->device transfer halves (probe_cli_stages.py)
                    if speech.dtype == jnp.int16:
                        speech = speech.astype(jnp.float32) * (1.0 / 32768.0)
                    speech = speech.astype(compute_dtype)
                    if run_mod == "inference":
                        out = model.inference(
                            params, state, speech, need_recon=need_recon,
                            bit_width=bit_width, use_scale=use_scale,
                        )
                    else:
                        out = model.inference_encoding(
                            params, state, speech, need_recon=need_recon,
                            bit_width=bit_width, use_scale=use_scale,
                        )
                    if small_codes and out.get("code_indices") and (
                        out["code_indices"][0] is not None
                    ):
                        # token ids < 32768 (and the -1 dropout null) fit
                        # int16: halves the token fetch bytes
                        out = dict(out)
                        out["code_indices"] = [
                            c.astype(jnp.int16) for c in out["code_indices"]
                        ]
                    return out

            elif run_mod == "decode":

                def fn(params, state, tokens):
                    return model.inference_decoding(params, state, tokens)

            elif run_mod == "decode_emb":

                def fn(params, state, emb):
                    return model.inference_decoding_emb(params, state, emb)

            else:
                raise ValueError(run_mod)
            self._jitted[key] = jax.jit(fn)
        return self._jitted[key]

    def _pcm16(self, recon, ilens):
        """Device-side save_audio(rescale=True): per-utterance peak over the
        VALID samples only, scale down to |x| <= 0.99, quantize to int16.
        Fetching 2-byte PCM instead of fp32 cuts serving D2H bytes 2x (the
        tunnel/PCIe link is the e2e bottleneck — NOTES_ROUND3)."""
        if self._pcm16_fn is None:

            def fn(r, n):
                r = r.astype(jnp.float32)
                mask = jnp.arange(r.shape[1])[None, :] < n[:, None]
                peak = jnp.max(jnp.abs(r) * mask, axis=1, keepdims=True)
                scale = jnp.where(peak > 0.99, 0.99 / jnp.maximum(peak, 1e-12), 1.0)
                q = jnp.round(r * scale * 32767.0)
                return jnp.clip(q, -32768, 32767).astype(jnp.int16)

            self._pcm16_fn = jax.jit(fn)
        return self._pcm16_fn(recon, jnp.asarray(np.asarray(ilens, np.int32)))

    def _put_rows(self, arr: np.ndarray):
        """Place a (B, ...) host batch on the device (or sharded over the
        mesh's "data" axis), padding B up to a multiple of the data-parallel
        degree by repeating the last row. Returns (device_array, n_pad_rows);
        collect() strips the pad rows back off."""
        pad = (-arr.shape[0]) % self.data_parallel if self.data_parallel > 1 else 0
        if pad:
            arr = np.concatenate([arr, np.repeat(arr[-1:], pad, axis=0)], axis=0)
        return jax.device_put(arr, self._row_sharding), pad

    def dispatch(
        self,
        speech: np.ndarray,
        need_recon: bool = True,
        bit_width=_UNSET,
        use_scale: bool = True,
        run_mod: str = "inference",
        pcm16_ilens=None,
    ) -> Dict[str, Any]:
        """Asynchronously dispatch one batch; returns the device out dict
        WITHOUT fetching. jax dispatch is async, so the host returns
        immediately and can decode/pad the next batch or write the previous
        one while this batch computes — the overlap the serving pipeline
        relies on (VERDICT r2 item 2). Pair with collect().

        pcm16_ilens: per-utterance valid sample counts; when given, the
        reconstruction is peak-normalized + int16-quantized ON DEVICE so
        collect() fetches 2-byte PCM rather than 4-byte float."""
        if bit_width is _UNSET:
            bit_width = self.bit_width
        if run_mod == "decode":
            nq = None
            if bit_width is not None:
                nq = int(max(bit_width // self.bits_per_quant, 1))
            # tokens arrive int64 from json; int32 halves the upload
            x, row_pad = self._put_rows(np.asarray(speech[:, :, :nq], np.int32))
            fn = self._get_fn("decode", True, None, use_scale)
            out = fn(self.params, self.rvq_state, x)
        elif run_mod == "decode_emb":
            x, row_pad = self._put_rows(np.asarray(speech))
            fn = self._get_fn("decode_emb", True, None, use_scale)
            out = fn(self.params, self.rvq_state, x)
        else:
            speech = np.asarray(speech)
            if speech.dtype != np.int16:  # int16 rides the wire raw
                speech = speech.astype(np.float32, copy=False)
            x, row_pad = self._put_rows(speech)
            fn = self._get_fn(run_mod, need_recon or run_mod == "inference", bit_width, use_scale)
            out = fn(self.params, self.rvq_state, x)
        out = dict(out)
        if pcm16_ilens is not None and out.get("recon_speech") is not None:
            ilens = list(pcm16_ilens) + [0] * row_pad
            out["recon_pcm16"] = self._pcm16(out.pop("recon_speech"), ilens)
        out["_row_pad"] = row_pad
        return out

    @staticmethod
    def collect(out: Dict[str, Any], need_sub_quants: bool = True):
        """Fetch a dispatched batch to host in ONE transfer and unpack to
        (code_indices, code_embeddings, recon, sub_quants) numpy.

        recon is int16 PCM if the batch was dispatched with pcm16_ilens,
        else float32. sub_quants (n_q per-layer embeddings — by far the
        largest output, ~0.5 GB/batch at n_q=32 B=64) is fetched ONLY when
        need_sub_quants."""
        recon = out.get("recon_pcm16")
        if recon is None:
            r = out.get("recon_speech")
            recon = r.astype(jnp.float32) if r is not None else None
        fetched = jax.device_get(
            {
                "code_indices": out.get("code_indices"),
                "sub_quants": out.get("sub_quants") if need_sub_quants else None,
                "recon": recon,
            }
        )
        codes = fetched["code_indices"]
        if codes is not None and codes[0] is not None:
            # int16 was a transport encoding only; hand out int32
            codes = [np.asarray(c, np.int32) for c in codes]
        recon, sub_quants = fetched["recon"], fetched["sub_quants"]
        row_pad = out.get("_row_pad", 0)
        code_embeddings = out.get("code_embeddings")
        if row_pad:  # strip the data-parallel alignment rows (_put_rows)
            if codes is not None and codes[0] is not None:
                codes = [c[:, :-row_pad] for c in codes]  # (n_q, B, T)
            if recon is not None:
                recon = recon[:-row_pad]  # (B, T)
            if sub_quants is not None and sub_quants[0] is not None:
                sub_quants = [s[:, :-row_pad] for s in sub_quants]  # (n_q,B,T,D)
            if code_embeddings is not None:
                # per-frame (emb (B, T, D), scale (B, 1) | None) tuples
                code_embeddings = [
                    (
                        emb[:-row_pad],
                        scale[:-row_pad] if scale is not None else None,
                    )
                    for emb, scale in code_embeddings
                ]
        return (
            codes,
            code_embeddings,
            recon,
            sub_quants,
        )

    def __call__(
        self,
        speech: np.ndarray,
        need_recon: bool = True,
        bit_width=_UNSET,
        use_scale: bool = True,
        run_mod: str = "inference",
    ):
        """One synchronous batch. speech: (B, T) waveform, or (B, T, n_q)
        tokens for decode, or (B, T, D) embeddings for decode_emb
        (codec_inference.py:86-134).

        bit_width: omit for the constructor default; pass None explicitly for
        ALL quantizers."""
        return self.collect(
            self.dispatch(
                speech, need_recon=need_recon, bit_width=bit_width,
                use_scale=use_scale, run_mod=run_mod,
            )
        )


def _bucket_length(t: int, hop: int, quantum: int = 16) -> int:
    """Round T up so token length is a multiple of `quantum` frames."""
    frames = -(-t // hop)
    frames = -(-frames // quantum) * quantum
    return frames * hop


def _iter_batches(items: List[Tuple[str, np.ndarray]], batch_size: int, hop: int):
    """Yield (keys, padded batch, lengths) with wrap padding into length
    buckets (reference collate pad_mode='wrap', codec_inference.py:257-261).

    Time is axis 0 of each item: (T,) waveforms, (T, n_q) tokens, (T, D) embs.
    """
    items = sorted(items, key=lambda kv: kv[1].shape[0])
    for i in range(0, len(items), batch_size):
        chunk = items[i : i + batch_size]
        lengths = [x.shape[0] for _, x in chunk]
        target = _bucket_length(max(lengths), hop)
        padded = []
        for _, x in chunk:
            pad = target - x.shape[0]
            if pad > 0:
                widths = [(0, pad)] + [(0, 0)] * (x.ndim - 1)
                x = np.pad(x, widths, mode="wrap")
            padded.append(x)
        yield [k for k, _ in chunk], np.stack(padded), lengths


def _plan_sound_batches(
    reader: SoundScpReader,
    sampling_rate: int,
    file_sampling_rate: Optional[int],
    should_resample: bool,
) -> List[Tuple[str, int]]:
    """(key, post-resample length) for every utterance WITHOUT decoding:
    lengths come from RIFF headers (peek_wav_info); resample_poly's output
    length is ceil(n * new/old) exactly, so the batch plan padding is exact."""
    from funcodec_tpu.data.wav_io import _is_ark_entry, peek_wav_info

    infos: List[Tuple[str, int]] = []
    for key in reader:
        p = reader.data[key]
        info = None if _is_ark_entry(p) else peek_wav_info(p)
        if info is not None:
            sr, n, _ch = info
        else:  # ark entry or exotic wav: decode once to learn the length
            sr, wav = reader[key]
            n = wav.shape[0]
        src_sr = file_sampling_rate if should_resample else sr
        est = n if src_sr == sampling_rate else -(-n * sampling_rate // src_sr)
        infos.append((key, est))
    return infos


def inference_pipeline(
    output_dir: str,
    config_file: str,
    model_file: str,
    data_path_and_name_and_type: Sequence[Tuple[str, str, str]],
    batch_size: int = 1,
    bit_width: Optional[int] = 8000,
    sampling_rate: int = 16000,
    file_sampling_rate: Optional[int] = None,
    use_scale: bool = True,
    run_mod: str = "inference",
    need_indices: bool = True,
    need_sub_quants: bool = False,
    indices_save_type: str = "json",
    dtype: str = "float32",
    pipeline_depth: int = 2,
    model: Optional[Speech2Token] = None,
    num_reader_threads: Optional[int] = None,
    num_writer_threads: Optional[int] = None,
    data_parallel: int = 1,
) -> List[Dict[str, Any]]:
    """The encoding_decoding.sh stage-1/2 driver (codec_inference.py:164-382).

    Three overlapped stages (VERDICT r2 item 2 — host I/O must hide behind
    device compute for the device throughput to survive end-to-end):
      reader pool   : wav decode + resample of the NEXT batches' items over
                      `num_reader_threads` workers (default: host cores) —
                      the single-process answer to the reference's N forked
                      inference processes (encoding_decoding.sh:70-98,
                      split_scp.pl + run.pl); decode/resample are numpy/
                      scipy and release the GIL, so threads scale on a
                      multi-core host. Batch assembly (pad + stack) stays on
                      one thread so batch order is the plan order.
      main thread   : async device dispatch, `pipeline_depth` batches in
                      flight, one batched fetch per batch
      writer pool   : per-utterance wav encode/write fans out over
                      `num_writer_threads`; token/ark writes stay on the
                      single writer thread (one file handle, ordered)
    The batch plan (length-sorted buckets) is built from wav headers alone,
    so the first dispatch happens after decoding just one batch, not the
    whole corpus.
    """
    import queue as _queue
    import threading
    from collections import deque
    from concurrent.futures import ThreadPoolExecutor

    host_cores = os.cpu_count() or 1
    if num_reader_threads is None:
        num_reader_threads = min(host_cores, 16)
    if num_writer_threads is None:
        num_writer_threads = min(host_cores, 16)

    if model is None:  # callers serving many requests pass a built model in
        model = Speech2Token(
            config_file, model_file, dtype=dtype,
            sampling_rate=sampling_rate, bit_width=bit_width,
            data_parallel=data_parallel,
        )
    os.makedirs(output_dir, exist_ok=True)
    hop = model.hop_length
    should_resample = file_sampling_rate is not None and file_sampling_rate != sampling_rate

    path, name, typ = data_path_and_name_and_type[0]
    bucket_hop = 1 if run_mod in ("decode", "decode_emb") else hop

    # ---- work plan: (key, length) pairs + a lazy per-key loader ----
    if typ == "sound":
        reader = SoundScpReader(path)
        infos = _plan_sound_batches(
            reader, sampling_rate, file_sampling_rate, should_resample
        )

        def load_item(key: str) -> np.ndarray:
            from funcodec_tpu.data.wav_io import _is_ark_entry

            p = reader.data[key]
            if _is_ark_entry(p):
                sr, wav = reader[key]
            else:
                # raw int16 PCM when possible: device dequantizes (exact),
                # the host->device link carries half the bytes
                sr, wav = read_wav(p, normalize=False)
            if wav.ndim == 2:
                wav = wav[:, 0]
            if wav.dtype == np.int16 and (should_resample or sr != sampling_rate):
                wav = wav.astype(np.float32) / 32768.0
            if should_resample:
                wav = resample(wav, file_sampling_rate, sampling_rate)
            elif sr != sampling_rate:
                wav = resample(wav, sr, sampling_rate)
            return wav if wav.dtype == np.int16 else wav.astype(np.float32)

    elif typ == "codec_json":
        token_map: Dict[str, np.ndarray] = {}
        with open(path) as f:
            for line in f:
                key, payload = line.rstrip("\n").split(maxsplit=1)
                token_map[key] = load_codec_json(payload)  # (T, n_q)
        infos = [(k, v.shape[0]) for k, v in token_map.items()]

        def load_item(key: str) -> np.ndarray:
            return token_map[key]

    elif typ == "kaldi_ark":
        from funcodec_tpu.data.kaldi_ark import ArkScpReader

        ark_reader = ArkScpReader(path)
        infos = [(k, ark_reader[k].shape[0]) for k in ark_reader]

        def load_item(key: str) -> np.ndarray:
            return ark_reader[key]

    else:
        raise ValueError(f"unsupported data type {typ}")

    # length-sorted chunks (reference collate's sorted bucketing)
    infos.sort(key=lambda kv: kv[1])
    planned = [
        [k for k, _ in infos[i : i + batch_size]]
        for i in range(0, len(infos), batch_size)
    ]

    indices_writer = None
    indices_file = None
    if need_indices and run_mod in ("inference", "encode"):
        if indices_save_type == "ark":
            base = os.path.join(output_dir, "indices")
            indices_writer = ArkWriter(base + ".ark", base + ".scp")
        else:
            indices_file = open(os.path.join(output_dir, "codecs.txt"), "wt")
    sub_quants_writer = None
    if need_sub_quants and run_mod in ("inference", "encode"):
        base = os.path.join(output_dir, "codec_emb")
        sub_quants_writer = ArkWriter(base + ".ark", base + ".scp")

    results: List[Dict[str, Any]] = []
    errors: List[BaseException] = []
    in_q: "_queue.Queue" = _queue.Queue(maxsize=max(2, pipeline_depth + 1))
    wr_q: "_queue.Queue" = _queue.Queue(maxsize=max(4, 2 * pipeline_depth))

    def reader_fn():
        try:
            with ThreadPoolExecutor(
                max_workers=num_reader_threads, thread_name_prefix="codec-read"
            ) as pool:
                # keep a window of batches' item-decodes in flight so the
                # pool never drains at a batch boundary; assembly below
                # consumes strictly in plan order
                window: deque = deque()
                plan_iter = iter(planned)

                def refill():
                    while len(window) < max(2, pipeline_depth + 1):
                        nxt = next(plan_iter, None)
                        if nxt is None:
                            return
                        window.append(
                            (nxt, [pool.submit(load_item, k) for k in nxt])
                        )

                refill()
                while window:
                    keys, futs = window.popleft()
                    refill()  # decode ahead while this batch assembles
                    arrs = [f.result() for f in futs]
                    if any(a.dtype != arrs[0].dtype for a in arrs):
                        # mixed int16/float batch: promote on host (int16 is
                        # an unscaled transport form, np.stack must not
                        # blend them)
                        arrs = [
                            a.astype(np.float32) / 32768.0
                            if a.dtype == np.int16
                            else a.astype(np.float32) for a in arrs
                        ]
                    lengths = [a.shape[0] for a in arrs]
                    target = _bucket_length(max(lengths), bucket_hop)
                    padded = []
                    for a in arrs:
                        pad = target - a.shape[0]
                        if pad > 0:
                            widths = [(0, pad)] + [(0, 0)] * (a.ndim - 1)
                            a = np.pad(a, widths, mode="wrap")
                        padded.append(a)
                    in_q.put((keys, np.stack(padded), lengths))
        except BaseException as e:  # surfaced to the caller after join
            errors.append(e)
        finally:
            in_q.put(None)

    wav_pool = ThreadPoolExecutor(
        max_workers=num_writer_threads, thread_name_prefix="codec-wav"
    )

    def _write_wav_one(path: str, wav_out: np.ndarray, out_sr: int):
        try:
            if wav_out.dtype == np.int16:
                # already peak-scaled + quantized on device (_pcm16)
                write_wav(path, wav_out, out_sr)
            else:
                save_audio(wav_out, path, out_sr, rescale=True)
        except BaseException as e:
            errors.append(e)

    def write_batch(keys, fetched, lengths):
        token_id, _token_emb, recon, sub_quants = fetched
        if should_resample and recon is not None:
            recon = resample(recon, sampling_rate, file_sampling_rate)
        for i, key in enumerate(keys):
            if run_mod in ("decode", "decode_emb"):
                codec_len = lengths[i]
                ilen = codec_len * hop
                if should_resample:
                    ilen = int(ilen * file_sampling_rate / sampling_rate)
            else:
                ilen = lengths[i]
                codec_len = int(math.ceil(ilen / hop))
            if recon is not None:
                wav_out = recon[i][:ilen]
                out_sr = file_sampling_rate if should_resample else sampling_rate
                fname = key + ".wav" if not key.endswith(".wav") else key
                # per-utterance wav encode fans out to the pool (the PCM
                # quantize/peak-scan in save_audio and the file write both
                # release the GIL); token/ark writes below stay ordered here
                wav_pool.submit(
                    _write_wav_one, os.path.join(output_dir, fname), wav_out,
                    out_sr,
                )
                results.append({"key": key, "value": os.path.join(output_dir, fname)})
            if token_id is not None and (indices_writer or indices_file):
                # frames list of (n_q, B, T) -> per-utt [[q rows]...]
                if indices_save_type == "ark":
                    mats = [
                        np.asarray(x)[:, i, :codec_len].T.astype(np.float32)
                        for x in token_id
                    ]
                    indices_writer(key, np.concatenate(mats, axis=0))
                else:
                    to_write = [
                        np.asarray(x)[:, i, :codec_len].tolist() for x in token_id
                    ]
                    indices_file.write(key + " " + json.dumps(to_write) + "\n")
            if sub_quants is not None and sub_quants_writer and sub_quants[0] is not None:
                # frames list of (n_q, B, T, D) -> (T, n_q*D)
                cat = np.concatenate([np.asarray(x) for x in sub_quants], axis=2)
                mat = cat[:, i, :codec_len, :].transpose(1, 0, 2).reshape(codec_len, -1)
                sub_quants_writer(key, mat.astype(np.float32))

    def writer_fn():
        try:
            while True:
                item = wr_q.get()
                if item is None:
                    return
                write_batch(*item)
        except BaseException as e:
            errors.append(e)
            while wr_q.get() is not None:  # drain so the main thread never blocks
                pass

    reader_t = threading.Thread(target=reader_fn, name="codec-reader", daemon=True)
    writer_t = threading.Thread(target=writer_fn, name="codec-writer", daemon=True)
    reader_t.start()
    writer_t.start()

    pending: deque = deque()

    def flush_one():
        keys, out, lengths = pending.popleft()
        wr_q.put((keys, model.collect(out, need_sub_quants=need_sub_quants), lengths))

    want_recon = run_mod != "encode"
    try:
        while True:
            item = in_q.get()
            if item is None:
                break
            keys, batch, lengths = item
            # valid output samples per utterance at the model sampling rate
            if run_mod in ("decode", "decode_emb"):
                ilens = [l * hop for l in lengths]
            else:
                ilens = lengths
            out = model.dispatch(
                batch, need_recon=want_recon,
                bit_width=bit_width, use_scale=use_scale, run_mod=run_mod,
                # int16 on-device quantization only when the host won't
                # resample (resample needs float input)
                pcm16_ilens=(ilens if (want_recon and not should_resample) else None),
            )
            pending.append((keys, out, lengths))
            if len(pending) >= pipeline_depth:
                flush_one()
        while pending:
            flush_one()
    finally:
        wr_q.put(None)
        writer_t.join()
        reader_t.join()
        wav_pool.shutdown(wait=True)  # all wav files on disk before return
        if indices_writer:
            indices_writer.close()
        if indices_file:
            indices_file.close()
        if sub_quants_writer:
            sub_quants_writer.close()
    if errors:
        raise errors[0]
    return results


def get_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(description="TPU codec inference")
    parser.add_argument("--output_dir", type=str, required=True)
    parser.add_argument("--config_file", type=str, required=True)
    parser.add_argument("--model_file", type=str, required=True)
    parser.add_argument(
        "--data_path_and_name_and_type", type=str, action="append", required=True,
        help="e.g. wav.scp,speech,sound or codecs.txt,speech,codec_json",
    )
    parser.add_argument("--batch_size", type=int, default=1)
    parser.add_argument("--bit_width", type=int, default=8000)
    parser.add_argument("--sampling_rate", type=int, default=16000)
    parser.add_argument("--file_sampling_rate", type=int, default=None)
    parser.add_argument("--run_mod", type=str, default="inference",
                        choices=["inference", "encode", "decode", "decode_emb"])
    parser.add_argument("--need_indices", type=lambda s: s.lower() == "true", default=True)
    parser.add_argument("--need_sub_quants", type=lambda s: s.lower() == "true", default=False)
    parser.add_argument("--indices_save_type", type=str, default="json", choices=["json", "ark"])
    parser.add_argument("--dtype", type=str, default="float32")
    parser.add_argument("--num_reader_threads", type=int, default=None,
                        help="host decode workers (default: cpu count, "
                             "<=16) — replaces the reference's N forked "
                             "inference processes")
    parser.add_argument("--num_writer_threads", type=int, default=None,
                        help="wav encode/write workers (default: cpu "
                             "count, <=16)")
    parser.add_argument("--data_parallel", type=int, default=1,
                        help="serve each batch sharded over this many chips "
                             "(1-D data mesh, params replicated); -1 = all "
                             "visible devices — replaces the reference's "
                             "per-GPU process forking")
    parser.add_argument("--stat_flops", action="store_true",
                        help="print the per-layer FLOPs/params tree before "
                             "running (codec_inference.py:328-342)")
    return parser


def main(argv=None):
    args = get_parser().parse_args(argv)
    triples = [tuple(s.split(",")) for s in args.data_path_and_name_and_type]
    s2t = None
    if args.stat_flops:
        import logging

        from funcodec_tpu.utils.misc import codec_flops_tree

        s2t = Speech2Token(args.config_file, args.model_file, dtype=args.dtype,
                           sampling_rate=args.sampling_rate,
                           bit_width=args.bit_width,
                           data_parallel=args.data_parallel)
        logging.info(
            "\n%s",
            codec_flops_tree(s2t.model, s2t.params, s2t.rvq_state,
                             samples=args.sampling_rate),
        )
    inference_pipeline(
        output_dir=args.output_dir,
        config_file=args.config_file,
        model_file=args.model_file,
        data_path_and_name_and_type=triples,
        batch_size=args.batch_size,
        bit_width=args.bit_width,
        sampling_rate=args.sampling_rate,
        file_sampling_rate=args.file_sampling_rate,
        run_mod=args.run_mod,
        need_indices=args.need_indices,
        need_sub_quants=args.need_sub_quants,
        indices_save_type=args.indices_save_type,
        dtype=args.dtype,
        model=s2t,
        num_reader_threads=args.num_reader_threads,
        num_writer_threads=args.num_writer_threads,
        data_parallel=args.data_parallel,
    )


if __name__ == "__main__":
    main()
