"""Native host runtime tests: C++ vs Python parity (resampler, ring,
segmenter state machine)."""

import numpy as np
import pytest

from moonshine_tpu.runtime import native_host

lib = native_host.load()
pytestmark = pytest.mark.skipif(lib is None, reason="native lib unavailable")

HOP = 512


def test_version():
    assert lib.mt_host_version().decode() == "0.1.0"


@pytest.mark.parametrize("in_rate,out_rate", [(44100, 16000), (8000, 16000), (16000, 16000)])
def test_native_resample_matches_python(in_rate, out_rate, rng):
    from moonshine_tpu.audio.resample import resample_audio

    audio = rng.standard_normal(in_rate // 7).astype(np.float32)
    ours = native_host.native_resample(audio, in_rate, out_rate)
    ref = resample_audio(audio, in_rate, out_rate)
    assert ours.shape == ref.shape
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_ring_buffer_roundtrip():
    ring = native_host.NativeRing(1024)
    assert ring.capacity == 1024
    data = np.arange(600, dtype=np.float32)
    assert ring.write(data) == 600
    assert ring.available == 600
    out = ring.read(600)
    np.testing.assert_array_equal(out, data)
    assert ring.available == 0


def test_ring_buffer_wraparound_and_overflow():
    ring = native_host.NativeRing(100)
    a = np.arange(80, dtype=np.float32)
    assert ring.write(a) == 80
    np.testing.assert_array_equal(ring.read(50), a[:50])
    b = np.arange(100, 170, dtype=np.float32)
    assert ring.write(b) == 70  # 30 left + 50 freed
    got = ring.read(200)
    np.testing.assert_array_equal(got, np.concatenate([a[50:], b]))
    # Overflow drops the excess.
    big = np.ones(200, np.float32)
    assert ring.write(big) == 100


class OracleProbs:
    def __init__(self, probs):
        self.probs = list(probs)
        self.i = 0

    def __call__(self, hops):
        out = []
        for _ in range(hops.shape[0]):
            out.append(self.probs[self.i] if self.i < len(self.probs) else 0.0)
            self.i += 1
        return np.asarray(out, np.float32)


@pytest.mark.parametrize(
    "probs,kwargs",
    [
        ([0.0, 0.9, 0.9, 0.9, 0.9, 0.0, 0.0], {}),
        ([0.9] * 5, {"max_segment_sample_count": 0}),
        ([1.0] * 40, {"max_segment_sample_count": 10 * HOP}),
        ([1.0] * 40, {"max_segment_sample_count": 10 * HOP, "threshold": 0.0}),
        ([0.0, 0.9, 0.9, 0.0] * 3, {}),
    ],
)
def test_native_segmenter_matches_python(probs, kwargs, rng):
    from moonshine_tpu.pipeline.vad_segmenter import VadSegmenter

    audio = rng.standard_normal(len(probs) * HOP).astype(np.float32) * 0.1

    py = VadSegmenter(OracleProbs(probs), window_size=1, **kwargs)
    py.start()
    py.process_audio(audio)
    py.stop()

    nat = native_host.NativeSegmenter(OracleProbs(probs), window_size=1, **kwargs)
    nat.start()
    nat.process_audio(audio)
    nat.stop()

    ps, ns = py.segments, nat.segments
    assert len(ps) == len(ns)
    for a, b in zip(ps, ns):
        assert a.is_complete == b.is_complete
        assert a.start_time == pytest.approx(b.start_time, abs=1e-6)
        assert a.end_time == pytest.approx(b.end_time, abs=1e-6)
        np.testing.assert_allclose(a.audio_data, b.audio_data, atol=1e-6)
    assert py.retained_segment_audio_byte_count() == nat.retained_segment_audio_byte_count()
    assert py.completed_segment_audio_byte_count() == nat.completed_segment_audio_byte_count()


def test_native_segmenter_in_transcriber_pipeline():
    """The native segmenter slots into the Transcriber unchanged."""
    from moonshine_tpu.core.config import TranscriberOptions, VadOptions
    from moonshine_tpu.pipeline.backends import FakeBackend
    from moonshine_tpu.pipeline.transcriber import Transcriber

    t = Transcriber(
        FakeBackend(),
        TranscriberOptions(
            transcription_interval=0.1,
            vad=VadOptions(threshold=0.5, window_size=1),
        ),
        hop_prob_fn=OracleProbs([0.0, 1.0, 1.0, 1.0, 0.0, 0.0] + [0.0] * 100),
    )
    stream = t.create_stream(update_interval=0.1)
    # Swap in the native segmenter.
    stream.segmenter = native_host.NativeSegmenter(
        t.hop_prob_fn, threshold=0.5, window_size=1
    )
    stream.start()
    stream.add_audio(np.full(6 * HOP, 0.05, np.float32))
    transcript = stream.stop()
    assert transcript.lines
    assert transcript.lines[0].is_complete
