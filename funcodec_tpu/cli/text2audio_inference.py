"""LauraTTS inference: text (+ optional prompt audio) -> waveform.

Behavioral reference: funcodec/bin/text2audio_inference.py (Text2Audio
:31-197: composes LauraGenModel with a Speech2Token codec model; zero-shot
continual mode encodes prompt audio to a codec prefix; outputs both `gen`
(non-AR dense path) and `gen_only_lm` (AR tokens decoded by the codec)).
"""

from __future__ import annotations

import argparse
import json
import logging
import os
from typing import Dict, Optional, Union

import numpy as np
import yaml

import jax
import jax.numpy as jnp

from funcodec_tpu.cli.codec_inference import Speech2Token
from funcodec_tpu.data.text import TokenIDConverter, build_tokenizer
from funcodec_tpu.data.wav_io import read_2column_text, read_wav, resample, save_audio
from funcodec_tpu.tasks.text2audio import build_laura_model


class Text2Audio:
    """Composed TTS pipeline (text2audio_inference.py:31-197)."""

    def __init__(
        self,
        config_file: str,
        model_file: str,
        codec_config_file: str,
        codec_model_file: str,
        token_list: Optional[str] = None,
        token_type: Optional[str] = None,
        sampling: Union[bool, int, float] = 25,  # top-k 25 like the demo
        seed: int = 0,
    ):
        with open(config_file) as f:
            self.config = yaml.safe_load(f)
        tokens = None
        if token_list:
            with open(token_list, encoding="utf-8") as f:
                tokens = [line.strip() for line in f if line.strip()]
        self.model = build_laura_model(self.config, token_list=tokens)
        self.tokenizer = (
            build_tokenizer(token_type) if token_type and tokens else None
        )
        self.converter = TokenIDConverter(tokens) if tokens else None

        if model_file and os.path.exists(model_file):
            if model_file.endswith((".pth", ".pt", ".bin")):
                from funcodec_tpu.compat.torch_import import (
                    import_laura,
                    load_torch_state_dict,
                )

                self.params = import_laura(load_torch_state_dict(model_file), self.model)
            else:
                from funcodec_tpu.train.checkpoint import load_params

                self.params = load_params(
                    model_file, self.model.init(jax.random.PRNGKey(0))
                )
        else:
            logging.warning("no LM checkpoint %s; random init", model_file)
            self.params = self.model.init(jax.random.PRNGKey(0))

        self.codec = Speech2Token(codec_config_file, codec_model_file)
        self.sampling = sampling
        self.key = jax.random.PRNGKey(seed)
        self.codec_token_rate = self.config.get("codec_token_rate", 25)
        self.max_duration = self.config.get("audio_max_duration", 30)

    def _text_to_features(self, text: Union[str, np.ndarray]):
        """Raw text -> token ids (phoneme/char) or passthrough embeddings."""
        if isinstance(text, str):
            assert self.tokenizer is not None and self.converter is not None, (
                "string inputs need --token_list/--token_type (or precomputed ids)"
            )
            ids = self.converter.tokens2ids(self.tokenizer.text2tokens(text))
            return np.asarray(ids, np.int64)[None, :]
        text = np.asarray(text)
        if text.ndim == 1:
            return text[None, :]
        return text[None] if text.ndim == 2 and self.model.cfg.vocab_size == 0 else text

    def __call__(
        self,
        text: Union[str, np.ndarray],
        prompt_text: Optional[Union[str, np.ndarray]] = None,
        prompt_audio: Optional[np.ndarray] = None,
        max_length: Optional[int] = None,
    ) -> Dict[str, np.ndarray]:
        """Returns {'gen': wav, 'gen_only_lm': wav} (:137-197)."""
        cfg = self.model.cfg
        continual = None
        continual_length = None
        feats = self._text_to_features(text)
        if prompt_audio is not None:
            # zero-shot: prompt tokens become the codec prefix (:154-162)
            token_id, *_ = self.codec(
                prompt_audio[None, :], run_mod="encode", bit_width=None
            )
            prompt_tokens = np.asarray(token_id[0])[: cfg.predict_nq, 0, :].T
            continual = prompt_tokens.astype(np.int64)
            continual_length = continual.shape[0]
            if prompt_text is not None:
                pt = self._text_to_features(prompt_text)
                feats = np.concatenate([pt, feats], axis=1)

        if feats.dtype.kind in "iu":
            text_in = jnp.asarray(feats, jnp.int32)
        else:
            text_in = jnp.asarray(feats, jnp.float32)
        text_lengths = jnp.asarray([feats.shape[1]])

        self.key, d_key = jax.random.split(self.key)
        max_len = max_length or int(self.max_duration * self.codec_token_rate)
        tokens = self.model.decode_codec(
            self.params, text_in, text_lengths,
            max_length=max_len, sampling=self.sampling,
            key=d_key, continual=continual,
        )  # (1, T, predict_nq)

        # gen_only_lm: decode the AR tokens directly with the codec (:180-184)
        gen_start = continual_length or 0
        lm_tokens = tokens[:, gen_start:, :]
        if lm_tokens.shape[1] == 0:
            empty = np.zeros((0,), np.float32)
            return {"gen": empty, "gen_only_lm": empty}
        _, _, recon_lm, _ = self.codec(lm_tokens, run_mod="decode", bit_width=None)

        # gen: non-AR dense embedding -> decode_emb (:187-190)
        def decode_emb(emb):
            _, _, wav, _ = self.codec(np.asarray(emb), run_mod="decode_emb")
            return wav

        recon = self.model.syn_audio(
            self.params, jnp.asarray(tokens), text_in, text_lengths,
            decode_emb, continual_length=gen_start,
        )
        return {
            "gen": np.asarray(recon)[0],
            "gen_only_lm": np.asarray(recon_lm)[0],
        }


    def _prep_item(self, it):
        """(feats (1, L[, D]), prompt tokens (P, nq)) for one request dict."""
        cfg = self.model.cfg
        feats = self._text_to_features(it["text"])
        continual = None
        if it.get("prompt_audio") is not None:
            token_id, *_ = self.codec(
                it["prompt_audio"][None, :], run_mod="encode", bit_width=None
            )
            continual = (
                np.asarray(token_id[0])[: cfg.predict_nq, 0, :].T
            ).astype(np.int64)
            if it.get("prompt_text") is not None:
                pt = self._text_to_features(it["prompt_text"])
                feats = np.concatenate([pt, feats], axis=1)
        return feats, (
            continual
            if continual is not None
            else np.zeros((0, cfg.predict_nq), np.int64)
        )

    def _synthesize_tokens(self, tokens, text_in, text_len, gen_start):
        """AR tokens (1, T, nq) -> {'gen', 'gen_only_lm'} wavs."""
        lm_tokens = tokens[:, gen_start:, :]
        if lm_tokens.shape[1] == 0:
            empty = np.zeros((0,), np.float32)
            return {"gen": empty, "gen_only_lm": empty}
        _, _, recon_lm, _ = self.codec(lm_tokens, run_mod="decode", bit_width=None)

        def decode_emb(emb):
            _, _, wav, _ = self.codec(np.asarray(emb), run_mod="decode_emb")
            return wav

        recon = self.model.syn_audio(
            self.params, jnp.asarray(tokens), text_in,
            jnp.asarray([text_len]), decode_emb, continual_length=gen_start,
        )
        return {
            "gen": np.asarray(recon)[0],
            "gen_only_lm": np.asarray(recon_lm)[0],
        }

    def batch_synthesize(
        self,
        items,  # list of dicts {text, prompt_text?, prompt_audio?}
        max_length: Optional[int] = None,
    ):
        """Batched synthesis: ONE decode_codec_batch dispatch drives all
        rows' AR loops together (the reference is strictly batch-1,
        laura_model.py:501-548). Returns a list of {'gen', 'gen_only_lm'}
        dicts in input order."""
        cfg = self.model.cfg
        feats_list, prompts = [], []
        for it in items:
            feats, continual = self._prep_item(it)
            feats_list.append(feats)
            prompts.append(continual)

        B = len(items)
        Lmax = max(f.shape[1] for f in feats_list)
        Pmax = max(p.shape[0] for p in prompts)
        is_ids = feats_list[0].dtype.kind in "iu"
        pad_val = cfg.ignore_id if is_ids else 0.0
        if is_ids:
            text_pad = np.full((B, Lmax), pad_val, np.int32)
        else:
            D = feats_list[0].shape[-1]
            text_pad = np.zeros((B, Lmax, D), np.float32)
        tl = np.zeros((B,), np.int32)
        prompt_pad = np.zeros((B, max(Pmax, 1), cfg.predict_nq), np.int32)
        pl = np.zeros((B,), np.int32)
        for b, (f, p) in enumerate(zip(feats_list, prompts)):
            text_pad[b, : f.shape[1]] = f[0]
            tl[b] = f.shape[1]
            prompt_pad[b, : p.shape[0]] = p
            pl[b] = p.shape[0]

        self.key, d_key = jax.random.split(self.key)
        max_len = max_length or int(self.max_duration * self.codec_token_rate)
        rows = self.model.decode_codec_batch(
            self.params, jnp.asarray(text_pad), jnp.asarray(tl),
            max_length=max_len, sampling=self.sampling, key=d_key,
            continual=prompt_pad if Pmax > 0 else None,
            continual_lengths=pl if Pmax > 0 else None,
        )

        outs = []
        for b, tokens_row in enumerate(rows):
            text_in = jnp.asarray(text_pad[b : b + 1, : tl[b]])
            outs.append(
                self._synthesize_tokens(
                    tokens_row[None], text_in, int(tl[b]), int(pl[b])
                )
            )
        return outs

    def serving_synthesize(
        self,
        items,  # list of dicts {text, prompt_text?, prompt_audio?}
        max_length: Optional[int] = None,
        num_slots: int = 8,
    ):
        """Continuous-batching synthesis over a LauraServingSession: rows
        that finish early free their decode slot for queued requests
        instead of idling until the batch's longest generation ends
        (models/tts_serving.py; requires a rel_pos/none-PE codec LM — the
        shipped LauraTTS topology). Audio synthesis runs per request as it
        finishes. Returns {'gen', 'gen_only_lm'} dicts in input order."""
        from funcodec_tpu.models.tts_serving import LauraServingSession

        max_len = max_length or int(self.max_duration * self.codec_token_rate)
        preps = [self._prep_item(it) for it in items]
        budget = max(f.shape[1] + 2 + p.shape[0] for f, p in preps)
        sess = LauraServingSession(
            self.model, self.params, num_slots=min(num_slots, len(items)),
            max_new=max_len, prefix_budget=budget, sampling=self.sampling,
        )
        # per-request keys: reproducible stream key_i = fold_in(batch_key, i)
        self.key, batch_key = jax.random.split(self.key)
        for i, (feats, prompt) in enumerate(preps):
            sess.submit(
                f"u{i}", feats[0], jax.random.fold_in(batch_key, i),
                prompt=prompt if prompt.shape[0] else None,
            )
        outs: list = [None] * len(items)
        while any(o is None for o in outs):
            finished = sess.poll()
            if not finished and not any(
                u is not None for u in sess._slot_uid
            ) and not sess._queue:
                # the session ran dry with requests unaccounted for — a
                # scheduler bug; fail here rather than hand emit() a None
                unfinished = [
                    f"u{i}" for i, o in enumerate(outs) if o is None
                ]
                raise RuntimeError(
                    "serving session went idle with unfinished requests: "
                    + ", ".join(unfinished)
                )
            for uid, tokens in finished.items():
                i = int(uid[1:])
                feats, prompt = preps[i]
                text_in = jnp.asarray(
                    feats,
                    jnp.int32 if feats.dtype.kind in "iu" else jnp.float32,
                )
                outs[i] = self._synthesize_tokens(
                    np.asarray(tokens)[None], text_in, int(feats.shape[1]),
                    int(prompt.shape[0]),
                )
        return outs


def main(argv=None):
    parser = argparse.ArgumentParser(description="TPU LauraTTS inference")
    parser.add_argument("--output_dir", type=str, required=True)
    parser.add_argument("--config_file", type=str, required=True)
    parser.add_argument("--model_file", type=str, required=True)
    parser.add_argument("--codec_config_file", type=str, required=True)
    parser.add_argument("--codec_model_file", type=str, required=True)
    parser.add_argument("--text_scp", type=str, required=True,
                        help="uttid -> text (or token ids with --text_type ids)")
    parser.add_argument("--text_type", type=str, default="text", choices=["text", "ids"])
    parser.add_argument("--token_list", type=str, default=None)
    parser.add_argument("--token_type", type=str, default=None)
    parser.add_argument("--prompt_wav_scp", type=str, default=None)
    parser.add_argument("--prompt_text_scp", type=str, default=None)
    parser.add_argument("--sampling", type=str, default="25",
                        help="true/false, int top-k, or float top-p")
    parser.add_argument("--sampling_rate", type=int, default=16000)
    parser.add_argument("--batch_size", type=int, default=1,
                        help=">1 drives batched AR decode (decode_codec_batch)")
    parser.add_argument("--serving_slots", type=int, default=0,
                        help=">0 decodes through the continuous-batching "
                        "LauraServingSession with this many slots (rows that "
                        "finish free their slot mid-flight; rel_pos/none-PE "
                        "LMs only)")
    args = parser.parse_args(argv)

    s = args.sampling
    if s.lower() in ("true", "false"):
        sampling: Union[bool, int, float] = s.lower() == "true"
    elif "." in s:
        sampling = float(s)
    else:
        sampling = int(s)

    logging.basicConfig(level=logging.INFO)
    pipeline = Text2Audio(
        args.config_file, args.model_file,
        args.codec_config_file, args.codec_model_file,
        token_list=args.token_list, token_type=args.token_type,
        sampling=sampling,
    )
    os.makedirs(args.output_dir, exist_ok=True)

    texts = read_2column_text(args.text_scp)
    prompts_wav = read_2column_text(args.prompt_wav_scp) if args.prompt_wav_scp else {}
    prompts_text = read_2column_text(args.prompt_text_scp) if args.prompt_text_scp else {}

    def load_item(key, text):
        if args.text_type == "ids":
            text = np.array([int(x) for x in text.split()], np.int64)
        prompt_audio = None
        if key in prompts_wav:
            sr, wav = read_wav(prompts_wav[key])
            if wav.ndim == 2:
                wav = wav[:, 0]
            if sr != args.sampling_rate:
                wav = resample(wav, sr, args.sampling_rate)
            prompt_audio = wav
        return dict(
            text=text, prompt_text=prompts_text.get(key), prompt_audio=prompt_audio
        )

    eval_rows = {}

    def emit(key, out, prompt_audio=None):
        for tag, wav in out.items():
            if wav.size:
                save_audio(
                    wav, os.path.join(args.output_dir, f"{key}_{tag}.wav"),
                    args.sampling_rate, rescale=True,
                )
        logging.info("%s: gen %.2fs, gen_only_lm %.2fs", key,
                     out["gen"].size / args.sampling_rate,
                     out["gen_only_lm"].size / args.sampling_rate)
        # objective proxies (VERDICT r3 item 6): per-utterance JSON the next
        # training run regresses against (prompt-speaker cosine when a
        # zero-shot prompt exists; reference acceptance analogue:
        # egs/LibriTTS/text2speech_laura/README.md speaker-similarity)
        from funcodec_tpu.utils.tts_quality import tts_metrics

        row = {}
        for tag, wav in out.items():
            m = tts_metrics(wav, prompt=prompt_audio, sr=args.sampling_rate)
            row.update({f"{tag}_{k}": v for k, v in m.items()})
        eval_rows[key] = row

    def _finish_eval():
        if not eval_rows:
            return
        keys = sorted({k for row in eval_rows.values() for k in row})
        mean = {}
        for k in keys:
            vals = [
                row[k] for row in eval_rows.values()
                if k in row and np.isfinite(row[k])
            ]
            if vals:
                mean[k] = float(np.mean(vals))
        with open(os.path.join(args.output_dir, "tts_eval.json"), "w") as f:
            json.dump({"mean": mean, "per_utt": eval_rows}, f, indent=2)
        logging.info("tts_eval.json: %s", mean)

    entries = list(texts.items())
    if args.serving_slots > 0:
        items = [load_item(k, t) for k, t in entries]
        outs = pipeline.serving_synthesize(items, num_slots=args.serving_slots)
        for (key, _), out, item in zip(entries, outs, items):
            emit(key, out, prompt_audio=item["prompt_audio"])
    elif args.batch_size <= 1:
        for key, text in entries:
            item = load_item(key, text)
            out = pipeline(
                item["text"],
                prompt_text=item["prompt_text"],
                prompt_audio=item["prompt_audio"],
            )
            emit(key, out, prompt_audio=item["prompt_audio"])
    else:
        for i in range(0, len(entries), args.batch_size):
            chunk = entries[i : i + args.batch_size]
            items = [load_item(k, t) for k, t in chunk]
            outs = pipeline.batch_synthesize(items)
            for (key, _), out, item in zip(chunk, outs, items):
                emit(key, out, prompt_audio=item["prompt_audio"])
    _finish_eval()


if __name__ == "__main__":
    main()
