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
)
from funcodec_tpu.tasks.codec import build_codec_model, load_config


def load_codec_json(json_str: str) -> np.ndarray:
    """codecs.txt line payload -> (T, n_q) (iterable_dataset.py:54-58)."""
    array = np.array(json.loads(json_str))
    if array.ndim == 3:
        array = array[0]
    return array.T


_UNSET = object()


class Speech2Token:
    """Codec model wrapper with run_mod in {inference, encode, decode, decode_emb}."""

    def __init__(
        self,
        config_file: str,
        model_file: str,
        dtype: str = "float32",
        sampling_rate: int = 16_000,
        bit_width: Optional[int] = 8_000,
    ):
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
            self.params, self.rvq_state = self.model.init(jax.random.PRNGKey(0))
        if self.dtype == jnp.bfloat16:
            self.params = jax.tree_util.tree_map(
                lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x,
                self.params,
            )
        self._jitted: Dict[Any, Any] = {}

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

                def fn(params, state, speech):
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

    def __call__(
        self,
        speech: np.ndarray,
        need_recon: bool = True,
        bit_width=_UNSET,
        use_scale: bool = True,
        run_mod: str = "inference",
    ):
        """One batch. speech: (B, T) waveform, or (B, T, n_q) tokens for
        decode, or (B, T, D) embeddings for decode_emb
        (codec_inference.py:86-134).

        bit_width: omit for the constructor default; pass None explicitly for
        ALL quantizers."""
        if bit_width is _UNSET:
            bit_width = self.bit_width
        if run_mod == "decode":
            nq = None
            if bit_width is not None:
                nq = int(max(bit_width // self.bits_per_quant, 1))
            speech = speech[:, :, :nq]
            fn = self._get_fn("decode", True, None, use_scale)
            out = fn(self.params, self.rvq_state, jnp.asarray(speech))
        elif run_mod == "decode_emb":
            fn = self._get_fn("decode_emb", True, None, use_scale)
            out = fn(self.params, self.rvq_state, jnp.asarray(speech))
        else:
            x = jnp.asarray(np.asarray(speech, np.float32)).astype(self.dtype)
            fn = self._get_fn(run_mod, need_recon or run_mod == "inference", bit_width, use_scale)
            out = fn(self.params, self.rvq_state, x)
        recon = out.get("recon_speech")
        return (
            out.get("code_indices"),
            out.get("code_embeddings"),
            np.asarray(recon.astype(jnp.float32)) if recon is not None else None,
            out.get("sub_quants"),
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
) -> List[Dict[str, Any]]:
    """The encoding_decoding.sh stage-1/2 driver (codec_inference.py:164-382)."""
    model = Speech2Token(
        config_file, model_file, dtype=dtype,
        sampling_rate=sampling_rate, bit_width=bit_width,
    )
    os.makedirs(output_dir, exist_ok=True)
    hop = model.hop_length
    should_resample = file_sampling_rate is not None and file_sampling_rate != sampling_rate

    path, name, typ = data_path_and_name_and_type[0]
    items: List[Tuple[str, np.ndarray]] = []
    if typ == "sound":
        reader = SoundScpReader(path)
        for key in reader:
            sr, wav = reader[key]
            if wav.ndim == 2:
                wav = wav[:, 0]
            if should_resample:
                wav = resample(wav, file_sampling_rate, sampling_rate)
            elif sr != sampling_rate:
                wav = resample(wav, sr, sampling_rate)
            items.append((key, wav.astype(np.float32)))
    elif typ == "codec_json":
        with open(path) as f:
            for line in f:
                key, payload = line.rstrip("\n").split(maxsplit=1)
                items.append((key, load_codec_json(payload)))  # (T, n_q)
    elif typ == "kaldi_ark":
        from funcodec_tpu.data.kaldi_ark import ArkScpReader

        reader = ArkScpReader(path)
        for key in reader:
            items.append((key, reader[key]))
    else:
        raise ValueError(f"unsupported data type {typ}")

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

    results = []
    bucket_hop = 1 if run_mod in ("decode", "decode_emb") else hop
    for keys, batch, lengths in _iter_batches(items, batch_size, bucket_hop):
        if run_mod in ("decode", "decode_emb"):
            token_id, token_emb, recon, sub_quants = model(
                batch, bit_width=bit_width, use_scale=use_scale, run_mod=run_mod
            )
        else:
            token_id, token_emb, recon, sub_quants = model(
                batch, need_recon=(run_mod == "inference"),
                bit_width=bit_width, use_scale=use_scale, run_mod=run_mod,
            )

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
                save_audio(wav_out, os.path.join(output_dir, fname), out_sr, rescale=True)
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

    if indices_writer:
        indices_writer.close()
    if indices_file:
        indices_file.close()
    if sub_quants_writer:
        sub_quants_writer.close()
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
    parser.add_argument("--stat_flops", action="store_true",
                        help="print the per-layer FLOPs/params tree before "
                             "running (codec_inference.py:328-342)")
    return parser


def main(argv=None):
    args = get_parser().parse_args(argv)
    triples = [tuple(s.split(",")) for s in args.data_path_and_name_and_type]
    if args.stat_flops:
        import logging

        from funcodec_tpu.utils.misc import codec_flops_tree

        s2t = Speech2Token(args.config_file, args.model_file, dtype=args.dtype)
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
    )


if __name__ == "__main__":
    main()
