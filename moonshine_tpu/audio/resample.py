"""Sample-rate conversion to the pipeline's internal 16 kHz.

Semantics match the reference resampler (reference: core/resampler.cpp:16-50):
box-filter averaging for downsampling and linear interpolation for
upsampling, vectorized with numpy.  Exact output-sample-count and boundary
behavior are preserved so streamed audio lines up bit-for-bit with the
reference's framing.
"""

from __future__ import annotations

import numpy as np

INTERNAL_SAMPLE_RATE = 16000


def resample_audio(audio: np.ndarray, input_rate: float, output_rate: float) -> np.ndarray:
    audio = np.asarray(audio, dtype=np.float32)
    if input_rate == output_rate or audio.size == 0:
        return audio
    if input_rate > output_rate:
        return _downsample(audio, input_rate, output_rate)
    return _upsample(audio, input_rate, output_rate)


def _downsample(audio: np.ndarray, input_rate: float, output_rate: float) -> np.ndarray:
    n_in = audio.size
    n_out = int(n_in * output_rate / input_rate)
    if n_out == 0:
        return np.zeros(0, dtype=np.float32)
    ratio = input_rate / output_rate
    i = np.arange(n_out, dtype=np.float64)
    start = (i * ratio).astype(np.int64)
    end = ((i + 1) * ratio).astype(np.int64)
    end = np.minimum(end, n_in - 1)
    # Box average over the inclusive [start, end] index range.
    csum = np.concatenate(([0.0], np.cumsum(audio, dtype=np.float64)))
    sums = csum[end + 1] - csum[start]
    counts = (end - start + 1).astype(np.float64)
    return (sums / counts).astype(np.float32)


def _upsample(audio: np.ndarray, input_rate: float, output_rate: float) -> np.ndarray:
    n_in = audio.size
    n_out = int(n_in * output_rate / input_rate)
    if n_out == 0:
        return np.zeros(0, dtype=np.float32)
    ratio = input_rate / output_rate
    pos = np.arange(n_out, dtype=np.float64) * ratio
    idx = pos.astype(np.int64)
    frac = (pos - idx).astype(np.float32)
    at_end = idx >= n_in - 1
    idx0 = np.minimum(idx, n_in - 1)
    idx1 = np.minimum(idx + 1, n_in - 1)
    out = audio[idx0] + frac * (audio[idx1] - audio[idx0])
    out = np.where(at_end, audio[n_in - 1], out)
    return out.astype(np.float32)
