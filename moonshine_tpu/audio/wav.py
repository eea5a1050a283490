"""WAV load/save (reference: core/moonshine-utils/file-utils wav helpers).

Supports PCM 16/24/32-bit and IEEE float32, mono or multi-channel (channels
are averaged to mono).  Returns float32 waveforms in [-1, 1].
"""

from __future__ import annotations

import struct
from typing import Tuple

import numpy as np


def load_wav(path: str) -> Tuple[np.ndarray, int]:
    """Read a WAV file -> (float32 mono waveform, sample_rate)."""
    with open(path, "rb") as f:
        data = f.read()
    return parse_wav(data)


def parse_wav(data: bytes) -> Tuple[np.ndarray, int]:
    if len(data) < 12 or data[0:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("Not a RIFF/WAVE file")
    pos = 12
    fmt = None
    samples = None
    while pos + 8 <= len(data):
        chunk_id = data[pos : pos + 4]
        (chunk_size,) = struct.unpack_from("<I", data, pos + 4)
        body = data[pos + 8 : pos + 8 + chunk_size]
        if chunk_id == b"fmt ":
            audio_format, channels, sample_rate, _, _, bits = struct.unpack_from(
                "<HHIIHH", body, 0
            )
            if audio_format == 0xFFFE and chunk_size >= 40:  # WAVE_FORMAT_EXTENSIBLE
                (audio_format,) = struct.unpack_from("<H", body, 24)
            fmt = (audio_format, channels, sample_rate, bits)
        elif chunk_id == b"data":
            samples = body
        pos += 8 + chunk_size + (chunk_size & 1)  # chunks are word-aligned
    if fmt is None or samples is None:
        raise ValueError("WAV file missing fmt or data chunk")
    audio_format, channels, sample_rate, bits = fmt

    if audio_format == 1:  # PCM
        if bits == 16:
            x = np.frombuffer(samples, dtype="<i2").astype(np.float32) / 32768.0
        elif bits == 32:
            x = np.frombuffer(samples, dtype="<i4").astype(np.float32) / 2147483648.0
        elif bits == 24:
            raw = np.frombuffer(samples, dtype=np.uint8)
            raw = raw[: (len(raw) // 3) * 3].reshape(-1, 3)
            vals = (
                raw[:, 0].astype(np.int32)
                | (raw[:, 1].astype(np.int32) << 8)
                | (raw[:, 2].astype(np.int32) << 16)
            )
            vals = np.where(vals >= 1 << 23, vals - (1 << 24), vals)
            x = vals.astype(np.float32) / 8388608.0
        elif bits == 8:
            x = (np.frombuffer(samples, dtype=np.uint8).astype(np.float32) - 128.0) / 128.0
        else:
            raise ValueError(f"Unsupported PCM bit depth: {bits}")
    elif audio_format == 3:  # IEEE float
        if bits == 32:
            x = np.frombuffer(samples, dtype="<f4").astype(np.float32)
        elif bits == 64:
            x = np.frombuffer(samples, dtype="<f8").astype(np.float32)
        else:
            raise ValueError(f"Unsupported float bit depth: {bits}")
    else:
        raise ValueError(f"Unsupported WAV format code: {audio_format}")

    if channels > 1:
        x = x[: (len(x) // channels) * channels].reshape(-1, channels).mean(axis=1)
    return np.ascontiguousarray(x, dtype=np.float32), int(sample_rate)


def save_wav(path: str, audio: np.ndarray, sample_rate: int) -> None:
    """Write a mono float32 waveform as 16-bit PCM."""
    audio = np.asarray(audio, dtype=np.float32)
    pcm = np.clip(audio * 32767.0, -32768, 32767).astype("<i2")
    data = pcm.tobytes()
    with open(path, "wb") as f:
        f.write(b"RIFF")
        f.write(struct.pack("<I", 36 + len(data)))
        f.write(b"WAVE")
        f.write(b"fmt ")
        f.write(struct.pack("<IHHIIHH", 16, 1, 1, sample_rate, sample_rate * 2, 2, 16))
        f.write(b"data")
        f.write(struct.pack("<I", len(data)))
        f.write(data)
