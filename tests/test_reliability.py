"""Reliability-suite analogs (reference: core/reliability/ — fuzz targets
for parsers, TSan concurrency tests, long-stream memory regression).

Python build: randomized robustness sweeps over the byte-level parsers,
threaded multi-stream concurrency over one Transcriber, and retained-audio
bounds on long streams via the VAD byte accounting."""

import threading

import numpy as np
import pytest

from moonshine_tpu.audio.resample import resample_audio
from moonshine_tpu.audio.wav import parse_wav
from moonshine_tpu.core.tokenizer import BinTokenizer

HOP = 512


# -- fuzz-style parser robustness (reference: fuzz-bin-tokenizer,
# fuzz-wav-pcm, fuzz-resampler) --------------------------------------------

def test_tokenizer_fuzz_random_bytes():
    rng = np.random.default_rng(0)
    for _ in range(300):
        data = rng.integers(0, 256, rng.integers(0, 200), dtype=np.uint8).tobytes()
        try:
            tok = BinTokenizer.from_bytes(data)
            # Parsed tokenizers must round-trip their wire format.
            assert BinTokenizer.from_bytes(tok.to_bytes()).tokens_to_bytes == tok.tokens_to_bytes
        except ValueError:
            pass  # rejection is fine; crashes are not


def test_tokenizer_fuzz_decode_random_ids():
    tokens = [b"", b"<s>", b"</s>"] + [bytes([65 + i]) for i in range(26)]
    tok = BinTokenizer(tokens)
    rng = np.random.default_rng(1)
    for _ in range(100):
        ids = rng.integers(-5, 40, 10)
        try:
            tok.tokens_to_text([int(i) for i in ids])
        except (ValueError, IndexError):
            pass


def test_wav_fuzz_random_bytes():
    rng = np.random.default_rng(2)
    for _ in range(300):
        data = rng.integers(0, 256, rng.integers(0, 300), dtype=np.uint8).tobytes()
        try:
            parse_wav(data)
        except (ValueError, Exception):
            pass


def test_wav_fuzz_mutated_header():
    import struct

    pcm = np.zeros(100, "<i2").tobytes()
    base = (
        b"RIFF" + struct.pack("<I", 36 + len(pcm)) + b"WAVE"
        + b"fmt " + struct.pack("<IHHIIHH", 16, 1, 1, 16000, 32000, 2, 16)
        + b"data" + struct.pack("<I", len(pcm)) + pcm
    )
    rng = np.random.default_rng(3)
    for _ in range(200):
        data = bytearray(base)
        for _ in range(rng.integers(1, 8)):
            data[rng.integers(0, len(data))] = rng.integers(0, 256)
        try:
            audio, sr = parse_wav(bytes(data))
            assert audio.dtype == np.float32
        except (ValueError, struct.error, ZeroDivisionError):
            pass


def test_resampler_fuzz_rates():
    rng = np.random.default_rng(4)
    for _ in range(100):
        n = int(rng.integers(0, 2000))
        in_rate = float(rng.integers(1, 200000))
        out_rate = float(rng.integers(1, 200000))
        audio = rng.standard_normal(n).astype(np.float32)
        out = resample_audio(audio, in_rate, out_rate)
        assert np.isfinite(out).all()


# -- concurrency (reference: transcriber-concurrency-test.cpp) -------------

def test_concurrent_streams_one_transcriber():
    from moonshine_tpu.core.config import TranscriberOptions, VadOptions
    from moonshine_tpu.pipeline.backends import FakeBackend
    from moonshine_tpu.pipeline.transcriber import Transcriber

    t = Transcriber(
        FakeBackend(),
        TranscriberOptions(
            transcription_interval=0.1,
            vad=VadOptions(threshold=0.0, max_segment_duration=1.0),
        ),
    )
    errors = []

    def run_stream(seed):
        try:
            rng = np.random.default_rng(seed)
            stream = t.create_stream(update_interval=0.1)
            stream.start()
            for _ in range(6):
                stream.add_audio(rng.standard_normal(4 * HOP).astype(np.float32) * 0.1)
            transcript = stream.stop()
            assert transcript.lines
            for line in transcript.lines:
                assert line.is_complete
            t.free_stream(stream)
        except Exception as e:  # noqa: BLE001
            errors.append(e)

    threads = [threading.Thread(target=run_stream, args=(i,)) for i in range(8)]
    for th in threads:
        th.start()
    for th in threads:
        th.join()
    assert errors == []


# -- long-stream memory bounds (reference: transcriber-streaming-memory-test,
# stream_vad_retained_audio_bytes) -----------------------------------------

def test_long_stream_retained_audio_bounded():
    from moonshine_tpu.core.config import TranscriberOptions, VadOptions
    from moonshine_tpu.pipeline.backends import FakeBackend
    from moonshine_tpu.pipeline.transcriber import Transcriber

    options = TranscriberOptions(
        transcription_interval=0.1,
        vad=VadOptions(threshold=0.5, window_size=1, max_segment_duration=2.0),
    )
    t = Transcriber(
        FakeBackend(),
        options,
        hop_prob_fn=lambda hops: np.ones(hops.shape[0], np.float32),
    )
    stream = t.create_stream(update_interval=0.2)
    stream.start()
    rng = np.random.default_rng(5)
    # Two minutes of continuous speech with force-splits every ~1.3 s.
    for _ in range(120):
        stream.add_audio(rng.standard_normal(16000).astype(np.float32) * 0.1)
        # Completed segments' audio is dropped each pass to bound memory.
        stream.segmenter.clear_completed_segment_audio_data()
    retained = stream.segmenter.retained_segment_audio_byte_count()
    completed = stream.segmenter.completed_segment_audio_byte_count()
    assert completed == 0
    # Only the open segment (< ~3 s of float32 + look-behind) is retained.
    assert retained < 4 * 16000 * 4
    stream.stop()
