"""WAV file I/O and resampling (no soundfile/torchaudio dependency).

Behavioral reference: funcodec/fileio/sound_scp.py (SoundScpReader/Writer)
and save_audio (funcodec/bin/codec_inference.py:153-161: peak-rescale to
0.99, PCM_S 16-bit).

Supports PCM 16/24/32-bit and IEEE float RIFF/WAVE, mono or multichannel.
"""

from __future__ import annotations

import struct
from pathlib import Path
from typing import Dict, Iterator, Tuple, Union

import numpy as np


def read_wav(path: Union[str, Path]) -> Tuple[int, np.ndarray]:
    """Read a WAV file -> (sample_rate, float32 array (T,) or (T, C) in [-1, 1])."""
    with open(path, "rb") as f:
        riff, _size, wave = struct.unpack("<4sI4s", f.read(12))
        if riff != b"RIFF" or wave != b"WAVE":
            raise ValueError(f"{path}: not a RIFF/WAVE file")
        fmt = None
        data = None
        while True:
            hdr = f.read(8)
            if len(hdr) < 8:
                break
            chunk_id, chunk_size = struct.unpack("<4sI", hdr)
            if chunk_id == b"fmt ":
                fmt = f.read(chunk_size)
                if chunk_size % 2:
                    f.read(1)
            elif chunk_id == b"data":
                data = f.read(chunk_size)
                if chunk_size % 2:
                    f.read(1)
            else:
                f.seek(chunk_size + (chunk_size % 2), 1)
        if fmt is None or data is None:
            raise ValueError(f"{path}: missing fmt/data chunk")
        audio_format, channels, sr, _br, _ba, bits = struct.unpack("<HHIIHH", fmt[:16])
        if audio_format == 0xFFFE and len(fmt) >= 40:  # WAVE_FORMAT_EXTENSIBLE
            audio_format = struct.unpack("<H", fmt[24:26])[0]

        if audio_format == 1:  # PCM
            if bits == 16:
                x = np.frombuffer(data, "<i2").astype(np.float32) / 32768.0
            elif bits == 32:
                x = np.frombuffer(data, "<i4").astype(np.float32) / 2147483648.0
            elif bits == 24:
                raw = np.frombuffer(data, np.uint8).reshape(-1, 3)
                ints = (
                    raw[:, 0].astype(np.int32)
                    | (raw[:, 1].astype(np.int32) << 8)
                    | (raw[:, 2].astype(np.int32) << 16)
                )
                ints = np.where(ints >= 1 << 23, ints - (1 << 24), ints)
                x = ints.astype(np.float32) / 8388608.0
            elif bits == 8:
                x = (np.frombuffer(data, np.uint8).astype(np.float32) - 128.0) / 128.0
            else:
                raise ValueError(f"{path}: unsupported PCM bits {bits}")
        elif audio_format == 3:  # IEEE float
            x = np.frombuffer(data, "<f4" if bits == 32 else "<f8").astype(np.float32)
        else:
            raise ValueError(f"{path}: unsupported format code {audio_format}")

        if channels > 1:
            x = x.reshape(-1, channels)
        return sr, x


def write_wav(
    path: Union[str, Path], wav: np.ndarray, sample_rate: int, bits: int = 16
) -> None:
    """Write float32 [-1, 1] (T,) or (T, C) as PCM WAV."""
    wav = np.asarray(wav, np.float32)
    if wav.ndim == 1:
        channels = 1
    else:
        channels = wav.shape[1]
    if bits == 16:
        pcm = np.clip(np.round(wav * 32767.0), -32768, 32767).astype("<i2")
    elif bits == 32:
        pcm = np.clip(np.round(wav * 2147483647.0), -(1 << 31), (1 << 31) - 1).astype("<i4")
    else:
        raise ValueError(f"unsupported bits {bits}")
    payload = pcm.tobytes()
    byte_rate = sample_rate * channels * bits // 8
    block_align = channels * bits // 8
    with open(path, "wb") as f:
        f.write(b"RIFF")
        f.write(struct.pack("<I", 36 + len(payload)))
        f.write(b"WAVE")
        f.write(b"fmt ")
        f.write(struct.pack("<IHHIIHH", 16, 1, channels, sample_rate, byte_rate, block_align, bits))
        f.write(b"data")
        f.write(struct.pack("<I", len(payload)))
        f.write(payload)


def save_audio(
    wav: np.ndarray, path: Union[str, Path], sample_rate: int, rescale: bool = False
) -> None:
    """Reference save_audio semantics (codec_inference.py:153-161)."""
    wav = np.asarray(wav, np.float32)
    limit = 0.99
    mx = float(np.max(np.abs(wav))) if wav.size else 0.0
    if rescale and mx > 0:
        wav = wav * min(limit / mx, 1.0)
    else:
        wav = np.clip(wav, -limit, limit)
    if wav.ndim == 2:  # (C, T) torch layout -> (T, C)
        wav = wav.T
        if wav.shape[1] == 1:
            wav = wav[:, 0]
    write_wav(path, wav, sample_rate, bits=16)


def resample(wav: np.ndarray, orig_sr: int, new_sr: int) -> np.ndarray:
    """Polyphase resampling with a Kaiser-windowed sinc filter.

    Fills the role of torchaudio.functional.resample in the reference
    pipeline (codec_inference.py:318-322); equivalent quality, not bit-equal.
    """
    if orig_sr == new_sr:
        return wav
    from math import gcd

    from scipy.signal import resample_poly

    g = gcd(orig_sr, new_sr)
    return resample_poly(wav, new_sr // g, orig_sr // g, axis=-1).astype(np.float32)


def read_2column_text(path: Union[str, Path]) -> Dict[str, str]:
    """uttid -> value map from a kaldi-style scp (fileio/read_text.py:12-38)."""
    out: Dict[str, str] = {}
    with open(path, encoding="utf-8") as f:
        for line in f:
            sps = line.rstrip().split(maxsplit=1)
            if len(sps) == 1:
                k, v = sps[0], ""
            else:
                k, v = sps
            out[k] = v
    return out


class SoundScpReader:
    """wav.scp reader: uttid -> (rate, array) (fileio/sound_scp.py:12-67)."""

    def __init__(self, fname: Union[str, Path], dtype=np.float32):
        self.fname = fname
        self.dtype = dtype
        self.data = read_2column_text(fname)

    def __getitem__(self, key: str) -> Tuple[int, np.ndarray]:
        path = self.data[key]
        sr, x = read_wav(path)
        return sr, x.astype(self.dtype)

    def keys(self):
        return self.data.keys()

    def __len__(self):
        return len(self.data)

    def __contains__(self, item):
        return item in self.data

    def __iter__(self) -> Iterator[str]:
        return iter(self.data)
