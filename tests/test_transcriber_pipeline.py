"""Transcriber/Stream pipeline + event-contract tests.

Property-tests the user-visible guarantees (reference:
core/moonshine-c-api.h:165-196, README.md:379-397): exactly-once events,
only-last-line-incomplete, frozen completed lines, stable ids.
Model seam is scripted via FakeBackend; VAD probabilities via an oracle.
"""

import numpy as np
import pytest

from moonshine_tpu.core.config import TranscriberOptions, VadOptions
from moonshine_tpu.pipeline.backends import FakeBackend
from moonshine_tpu.pipeline.transcriber import (
    FLAG_FORCE_UPDATE,
    LineCompleted,
    LineStarted,
    LineTextChanged,
    LineUpdated,
    Transcriber,
    TranscriptEventListener,
)

SR = 16000
HOP = 512


class ProbOracle:
    """Speech/silence pattern by hop index."""

    def __init__(self, speech_ranges):
        self.speech_ranges = speech_ranges
        self.hop_index = 0

    def __call__(self, hops):
        out = []
        for _ in range(hops.shape[0]):
            i = self.hop_index
            p = 1.0 if any(a <= i < b for a, b in self.speech_ranges) else 0.0
            out.append(p)
            self.hop_index += 1
        return np.asarray(out, np.float32)


class Recorder(TranscriptEventListener):
    def __init__(self):
        self.events = []

    def on_line_started(self, e):
        self.events.append(("started", e.line.id))

    def on_line_updated(self, e):
        self.events.append(("updated", e.line.id))

    def on_line_text_changed(self, e):
        self.events.append(("text_changed", e.line.id, e.line.text))

    def on_line_completed(self, e):
        self.events.append(("completed", e.line.id))

    def of(self, kind):
        return [e for e in self.events if e[0] == kind]


def make_transcriber(speech_ranges, script=None, **opt_kw):
    options = TranscriberOptions(
        transcription_interval=0.1,
        vad=VadOptions(threshold=0.5, window_size=1, min_silence_duration=0.1),
        **opt_kw,
    )
    backend = FakeBackend(script)
    t = Transcriber(backend, options, hop_prob_fn=ProbOracle(speech_ranges))
    return t, backend


def feed(stream, n_hops, chunk_hops=8):
    audio = np.full(n_hops * HOP, 0.05, np.float32)
    for i in range(0, len(audio), chunk_hops * HOP):
        stream.add_audio(audio[i : i + chunk_hops * HOP])


def test_single_utterance_lifecycle():
    t, backend = make_transcriber([(4, 20)])
    stream = t.create_stream(update_interval=0.1)
    rec = Recorder()
    stream.add_listener(rec)
    stream.start()
    feed(stream, 40)
    stream.stop()

    assert len(rec.of("started")) == 1
    assert len(rec.of("completed")) == 1
    line_id = rec.of("started")[0][1]
    assert rec.of("completed")[0][1] == line_id
    snap = stream.output.snapshot()
    assert len(snap.lines) == 1
    assert snap.lines[0].is_complete
    assert snap.lines[0].text.startswith("seg")


def test_two_utterances_two_lines():
    t, _ = make_transcriber([(2, 10), (30, 40)])
    stream = t.create_stream(update_interval=0.1)
    rec = Recorder()
    stream.add_listener(rec)
    stream.start()
    feed(stream, 60)
    stream.stop()
    assert len(rec.of("started")) == 2
    assert len(rec.of("completed")) == 2
    snap = stream.output.snapshot()
    assert len(snap.lines) == 2
    assert snap.lines[0].id != snap.lines[1].id
    assert snap.lines[0].end_time <= snap.lines[1].start_time + 1e-6


def test_exactly_once_started_and_completed():
    t, _ = make_transcriber([(2, 30)])
    stream = t.create_stream(update_interval=0.1)
    rec = Recorder()
    stream.add_listener(rec)
    stream.start()
    feed(stream, 40, chunk_hops=4)
    stream.stop()
    # Force extra passes after stop: no duplicate events.
    stream.update_transcription(FLAG_FORCE_UPDATE)
    stream.update_transcription(FLAG_FORCE_UPDATE)
    assert len(rec.of("started")) == 1
    assert len(rec.of("completed")) == 1


def test_only_last_line_incomplete_mid_stream():
    t, _ = make_transcriber([(2, 10), (20, 100)])
    stream = t.create_stream(update_interval=0.1)
    stream.start()
    feed(stream, 50, chunk_hops=4)
    snap = stream.output.snapshot()
    assert len(snap.lines) == 2
    assert snap.lines[0].is_complete
    assert not snap.lines[1].is_complete


def test_text_changed_fires_on_revision():
    revisions = iter(["hello", "hello wor", "hello world", "hello world"])
    texts = {}

    def script(audio, seg_id, is_final):
        # Longer audio -> later revision
        n = len(audio) // (8 * HOP)
        seq = ["hello", "hello wor", "hello world", "hello world!"]
        return seq[min(n, 3)]

    t, _ = make_transcriber([(0, 100)], script=script)
    stream = t.create_stream(update_interval=0.1)
    rec = Recorder()
    stream.add_listener(rec)
    stream.start()
    feed(stream, 32, chunk_hops=8)
    stream.stop()
    changed = rec.of("text_changed")
    assert len(changed) >= 2
    # Updates fired for the incomplete line between revisions
    assert len(rec.of("updated")) >= 1


def test_completed_line_text_frozen():
    t, backend = make_transcriber([(2, 10), (20, 60)])
    stream = t.create_stream(update_interval=0.1)
    stream.start()
    feed(stream, 30)
    first_snap = stream.output.snapshot()
    first_text = first_snap.lines[0].text
    assert first_snap.lines[0].is_complete
    feed(stream, 30)
    stream.stop()
    final = stream.output.snapshot()
    assert final.lines[0].text == first_text


def test_update_gate_short_audio_returns_cached():
    t, backend = make_transcriber([(0, 100)])
    stream = t.create_stream(update_interval=0.5)
    stream.start()
    # 0.05s of audio is below transcription_interval=0.1 -> gate holds
    stream.add_audio(np.zeros(800, np.float32))
    snap = stream.update_transcription(0)
    assert backend.calls == []
    # Force flag overrides the gate
    snap = stream.update_transcription(FLAG_FORCE_UPDATE)
    assert backend.calls != []


def test_backoff_update_interval_floor():
    import time as _time

    t, backend = make_transcriber([(0, 1000)])
    stream = t.create_stream(update_interval=0.1)
    stream.start()
    # Make each pass artificially slow: backoff should reduce pass count.
    orig = backend.script

    def slow_script(audio, seg_id, is_final):
        _time.sleep(0.05)
        return "x"

    backend.script = slow_script
    feed(stream, 64, chunk_hops=2)
    n_slow = len(backend.calls)
    assert n_slow < 32  # without backoff every 2-hop chunk would pass the gate


def test_stop_completes_open_lines():
    t, _ = make_transcriber([(2, 1000)])
    stream = t.create_stream(update_interval=0.1)
    rec = Recorder()
    stream.add_listener(rec)
    stream.start()
    feed(stream, 20)
    assert not stream.output.snapshot().lines[0].is_complete
    stream.stop()
    snap = stream.output.snapshot()
    assert snap.lines[0].is_complete
    assert len(rec.of("completed")) == 1


def test_listener_exception_does_not_break_stream():
    t, _ = make_transcriber([(2, 30)])
    stream = t.create_stream(update_interval=0.1)
    rec = Recorder()

    def bad_listener(event):
        raise RuntimeError("boom")

    stream.add_listener(bad_listener)
    stream.add_listener(rec)
    stream.start()
    feed(stream, 40)
    stream.stop()
    assert len(rec.of("completed")) == 1


def test_transcribe_without_streaming():
    t, _ = make_transcriber([(2, 20)])
    audio = np.full(40 * HOP, 0.05, np.float32)
    transcript = t.transcribe_without_streaming(audio)
    assert len(transcript.lines) == 1
    assert transcript.lines[0].is_complete
    assert transcript.lines[0].text.startswith("seg")


def test_latency_recorded_in_lines():
    t, _ = make_transcriber([(2, 20)])
    audio = np.full(40 * HOP, 0.05, np.float32)
    transcript = t.transcribe_without_streaming(audio)
    assert transcript.lines[0].last_transcription_latency_ms >= 0


def test_multiple_streams_independent():
    t, backend = make_transcriber([(0, 1000)])
    # Each stream needs its own prob oracle state; share for simplicity
    s1 = t.create_stream(update_interval=0.1)
    s2 = t.create_stream(update_interval=0.1)
    assert s1.stream_id != s2.stream_id
    s1.start()
    s2.start()
    feed(s1, 16)
    feed(s2, 16)
    s1.stop()
    assert s1.output.snapshot().lines
    assert not s2.output.snapshot().lines or not s2.output.snapshot().lines[0].is_complete
