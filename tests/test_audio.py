"""WAV io + resampler tests (reference: core/resampler-test.cpp,
core/moonshine-utils file-utils tests)."""

import numpy as np
import pytest

from moonshine_tpu.audio.resample import resample_audio
from moonshine_tpu.audio.wav import load_wav, parse_wav, save_wav


def test_wav_roundtrip(tmp_path):
    sr = 16000
    t = np.arange(sr, dtype=np.float32) / sr
    audio = (0.5 * np.sin(2 * np.pi * 440 * t)).astype(np.float32)
    path = tmp_path / "tone.wav"
    save_wav(str(path), audio, sr)
    loaded, sr2 = load_wav(str(path))
    assert sr2 == sr
    assert loaded.shape == audio.shape
    # 16-bit quantization + 32767/32768 scale mismatch bound.
    assert np.max(np.abs(loaded - audio)) < 2.0 / 32768


def test_wav_stereo_averaged(tmp_path):
    import struct

    sr = 8000
    left = np.full(100, 0.5, np.float32)
    right = np.full(100, -0.5, np.float32)
    inter = np.empty(200, np.float32)
    inter[0::2] = left
    inter[1::2] = right
    pcm = np.clip(inter * 32767, -32768, 32767).astype("<i2").tobytes()
    data = (
        b"RIFF" + struct.pack("<I", 36 + len(pcm)) + b"WAVE"
        + b"fmt " + struct.pack("<IHHIIHH", 16, 1, 2, sr, sr * 4, 4, 16)
        + b"data" + struct.pack("<I", len(pcm)) + pcm
    )
    audio, sr2 = parse_wav(data)
    assert sr2 == sr
    assert audio.shape == (100,)
    assert np.max(np.abs(audio)) < 1e-4  # L/R cancel


def test_two_cities_loads(two_cities_path):
    audio, sr = load_wav(two_cities_path)
    assert sr == 16000
    assert audio.size > 16000 * 30  # ~44s clip
    assert np.max(np.abs(audio)) <= 1.0


def _reference_downsample(audio, in_rate, out_rate):
    # Direct transliteration of the reference loop for oracle comparison
    # (reference: core/resampler.cpp:16-50).
    n_in = len(audio)
    n_out = int(n_in * out_rate / in_rate)
    ratio = in_rate / out_rate
    out = np.zeros(n_out, np.float32)
    for i in range(n_out):
        start = int(i * ratio)
        end = min(int((i + 1) * ratio), n_in - 1)
        out[i] = np.mean(audio[start : end + 1])
    return out


def _reference_upsample(audio, in_rate, out_rate):
    n_in = len(audio)
    n_out = int(n_in * out_rate / in_rate)
    ratio = in_rate / out_rate
    out = np.zeros(n_out, np.float32)
    for i in range(n_out):
        pos = i * ratio
        idx = int(pos)
        frac = pos - idx
        if idx >= n_in - 1:
            out[i] = audio[-1]
        else:
            out[i] = audio[idx] + frac * (audio[idx + 1] - audio[idx])
    return out


@pytest.mark.parametrize("in_rate,out_rate", [(44100, 16000), (48000, 16000), (22050, 16000)])
def test_downsample_matches_reference_math(in_rate, out_rate, rng):
    audio = rng.standard_normal(in_rate // 10).astype(np.float32)
    ours = resample_audio(audio, in_rate, out_rate)
    ref = _reference_downsample(audio, in_rate, out_rate)
    assert ours.shape == ref.shape
    np.testing.assert_allclose(ours, ref, atol=1e-5)


@pytest.mark.parametrize("in_rate,out_rate", [(8000, 16000), (11025, 16000)])
def test_upsample_matches_reference_math(in_rate, out_rate, rng):
    audio = rng.standard_normal(in_rate // 10).astype(np.float32)
    ours = resample_audio(audio, in_rate, out_rate)
    ref = _reference_upsample(audio, in_rate, out_rate)
    assert ours.shape == ref.shape
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_same_rate_passthrough(rng):
    audio = rng.standard_normal(1000).astype(np.float32)
    out = resample_audio(audio, 16000, 16000)
    np.testing.assert_array_equal(out, audio)
