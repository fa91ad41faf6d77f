"""Objective TTS proxies — native stand-ins for the reference's LauraTTS
acceptance metrics.

The reference accepts a LauraTTS run at WER 4.56 / speaker-similarity 78.20
(reference egs/LibriTTS/text2speech_laura/README.md Benchmark), measured
with an external ASR model and a speaker-verification embedder. Neither
model exists in this image, so this module provides self-contained proxies
that move in the same directions and can be regressed against across
training runs (VERDICT r3 item 6):

- speaker similarity  -> cosine of MFCC-statistics speaker embeddings
  (mean+std pooling over energetic frames, c0 dropped for loudness
  invariance). Scores the long-term spectral timbre match of generated
  audio vs the prompt speaker — the same quantity the reference's
  embedding-cosine measures, with a classical spectral embedding instead
  of a learned one.
- intelligibility     -> held-out codec-token NLL under the LM
  (teacher-forced, label-smoothing removed) — the LM-side quantity WER is
  downstream of — plus STOI/NSIM of the codec resynthesis
  (utils/quality.py) for the vocoder side.
- mel-cepstral distance (MCD, dB) for time-aligned pairs (codec
  resynthesis of the same utterance).
"""

from __future__ import annotations

from typing import Dict, Optional

import numpy as np

from funcodec_tpu.utils.quality import _mel_filter, _stft_mag


def _dct_matrix(n_mfcc: int, n_mels: int) -> np.ndarray:
    """Orthonormal DCT-II basis (rows: cepstral index, cols: mel bin)."""
    k = np.arange(n_mfcc)[:, None]
    n = np.arange(n_mels)[None, :]
    basis = np.cos(np.pi * k * (2 * n + 1) / (2 * n_mels))
    basis *= np.sqrt(2.0 / n_mels)
    basis[0] *= np.sqrt(0.5)
    return basis


def mfcc(
    x: np.ndarray,
    sr: int = 16000,
    n_fft: int = 512,
    hop: int = 160,
    n_mels: int = 40,
    n_mfcc: int = 20,
) -> np.ndarray:
    """(frames, n_mfcc) mel-frequency cepstra of a mono waveform."""
    x = np.asarray(x, np.float64)
    power = _stft_mag(x, n_fft, hop)  # (frames, bins), |X|^2
    mel = _mel_filter(sr, n_fft, n_mels)
    logmel = np.log(np.maximum(power @ mel.T, 1e-10))
    return logmel @ _dct_matrix(n_mfcc, n_mels).T


def _energetic_frames(c: np.ndarray, drop_db: float = 35.0) -> np.ndarray:
    """Keep frames whose c0 (log energy) is within drop_db of the peak —
    silence frames carry no speaker information and wash out the pooling."""
    c0 = c[:, 0]
    # c0 is a log quantity: 1 dB of power = ln(10)/10 in c0 (up to the DCT
    # scale, which is constant and cancels in the threshold comparison)
    thresh = c0.max() - drop_db * np.log(10.0) / 10.0 * np.sqrt(2.0)
    keep = c0 >= thresh
    return c[keep] if keep.sum() >= 8 else c


def speaker_embedding(x: np.ndarray, sr: int = 16000) -> np.ndarray:
    """L2-normalized [mean, std] pooling of c1..c19 over energetic frames."""
    c = _energetic_frames(mfcc(x, sr=sr))[:, 1:]  # drop c0: loudness
    emb = np.concatenate([c.mean(axis=0), c.std(axis=0)])
    return emb / max(np.linalg.norm(emb), 1e-12)


def speaker_similarity(a: np.ndarray, b: np.ndarray, sr: int = 16000) -> float:
    """Cosine in [-1, 1] of the two utterances' speaker embeddings."""
    if len(a) < 1024 or len(b) < 1024:  # < 64 ms: no stable estimate
        return float("nan")
    return float(np.dot(speaker_embedding(a, sr), speaker_embedding(b, sr)))


def mel_cepstral_distance(
    ref: np.ndarray, deg: np.ndarray, sr: int = 16000
) -> float:
    """MCD in dB over time-aligned frames (c1..c19, no DTW — intended for
    resynthesis pairs of the SAME utterance). Lower is better; transparent
    codecs sit well under ~4 dB."""
    cr = mfcc(np.asarray(ref), sr=sr)
    cd = mfcc(np.asarray(deg), sr=sr)
    n = min(len(cr), len(cd))
    d = cr[:n, 1:] - cd[:n, 1:]
    return float(
        (10.0 / np.log(10.0)) * np.mean(np.sqrt(2.0 * np.sum(d * d, axis=1)))
    )


def tts_metrics(
    gen: np.ndarray,
    prompt: Optional[np.ndarray] = None,
    sr: int = 16000,
) -> Dict[str, float]:
    """Per-generation proxies: duration + prompt-speaker cosine when a
    zero-shot prompt exists."""
    out = {"gen_seconds": float(len(gen) / sr)}
    if prompt is not None and len(prompt) and len(gen):
        out["speaker_cos"] = speaker_similarity(prompt, gen, sr=sr)
    return out


def held_out_token_nll(model, params, batches) -> Dict[str, float]:
    """Teacher-forced per-token NLL of codec tokens under a LauraGenModel.

    batches: iterable of dicts with text, text_lengths, codec, codec_lengths
    (numpy). Label smoothing is bypassed (pure CE) so the number is an honest
    log-likelihood: perplexity = exp(nll). The WER-proxy to regress across
    training runs — a LM that assigns higher likelihood to held-out token
    sequences makes fewer hard decoding mistakes.
    """
    import jax
    import jax.numpy as jnp

    total_nll, total_tokens = 0.0, 0

    @jax.jit
    def _score(params, text, text_lengths, codec, codec_lengths):
        # same front half as forward (models/laura.py:449-468): encode the
        # text prefix, restrict codec to the first predict_nq groups
        text, text_lengths = model.encode_text(params, text, text_lengths)
        nll, logits, target, y_lengths = model.nll(
            params, text, text_lengths,
            codec.astype(jnp.int32)[:, :, : model.cfg.predict_nq],
            codec_lengths,
        )
        # recompute pure CE from the logits: the model's nll applies
        # lsm_weight smoothing, which shifts the value by a constant that
        # depends on config — cross-run comparisons need the unsmoothed CE
        logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        ce = -jnp.take_along_axis(logp, target[..., None], axis=-1)[..., 0]
        Lc1 = ce.shape[1]
        valid = (
            jnp.arange(Lc1)[None, :, None] < y_lengths[:, None, None]
        )
        ce = jnp.where(valid, ce, 0.0)
        return jnp.sum(ce), jnp.sum(valid) * ce.shape[-1]

    for b in batches:
        s, n = _score(
            params,
            jnp.asarray(b["text"]),
            jnp.asarray(b["text_lengths"]),
            jnp.asarray(b["codec"]),
            jnp.asarray(b["codec_lengths"]),
        )
        total_nll += float(s)
        total_tokens += int(n)
    nll = total_nll / max(total_tokens, 1)
    return {
        "token_nll": nll,
        "token_ppl": float(np.exp(nll)),
        "n_tokens": total_tokens,
    }
