"""Speech-clip + clone-clip tests (reference: core/speech-clip-test.cpp,
core/clone-clip-test.cpp intent)."""

import numpy as np
import pytest

from moonshine_tpu.core.types import TranscriptWord
from moonshine_tpu.pipeline.speech_clip import (
    CloneClipBounds,
    SpeechClipOptions,
    extract_speech_clip,
    refine_clone_clip_bounds,
)

SR = 16000
HOP = 512


class HopOracle:
    """Speech probability by absolute hop index."""

    def __init__(self, speech_ranges_seconds):
        self.ranges = speech_ranges_seconds
        self.i = 0

    def __call__(self, hops):
        out = []
        for _ in range(hops.shape[0]):
            t = self.i * HOP / SR
            out.append(1.0 if any(a <= t < b for a, b in self.ranges) else 0.0)
            self.i += 1
        return np.asarray(out, np.float32)


def test_speech_clip_picks_speech_window():
    # 12 s recording, speech only in [5, 10).
    audio = np.zeros(12 * SR, np.float32)
    clip = extract_speech_clip(audio, HopOracle([(5.0, 10.0)]))
    assert clip.is_complete
    assert 4.0 <= clip.start_time_seconds <= 6.5
    assert clip.speech_seconds >= 3.5
    assert clip.audio.size == 4 * SR


def test_speech_clip_too_short_recording():
    audio = np.zeros(2 * SR, np.float32)
    clip = extract_speech_clip(audio, HopOracle([(0.0, 2.0)]))
    assert not clip.is_complete


def test_speech_clip_not_enough_speech():
    audio = np.zeros(12 * SR, np.float32)
    clip = extract_speech_clip(audio, HopOracle([(5.0, 6.0)]))  # 1 s < minimum 2 s
    assert not clip.is_complete
    assert clip.speech_seconds > 0  # progress reporting still works


def test_speech_clip_tail_pad():
    audio = np.zeros(12 * SR, np.float32)
    clip = extract_speech_clip(
        audio, HopOracle([(5.0, 10.0)]), SpeechClipOptions(tail_pad_seconds=0.5)
    )
    assert clip.is_complete
    assert clip.audio.size == int(4.5 * SR)


# -- clone clip ------------------------------------------------------------

def W(text, start, end):
    return TranscriptWord(text, start, end)


def test_clone_clip_extends_to_finish_last_word():
    words = [W("hello", 0.2, 0.8), W("world", 3.5, 4.6)]
    b = refine_clone_clip_bounds(0.0, 4.0, words)
    assert b.transcript == "hello world"
    assert b.end_seconds == pytest.approx(4.65, abs=1e-3)
    assert b.start_seconds == pytest.approx(0.2, abs=1e-3)


def test_clone_clip_drops_word_exceeding_budget():
    words = [W("hello", 0.2, 0.8), W("interminable", 3.9, 6.2)]
    b = refine_clone_clip_bounds(0.0, 4.0, words, max_extension_seconds=1.5)
    # Second word can't finish by 5.5: dropped.
    assert b.transcript == "hello"


def test_clone_clip_fallback_no_words():
    b = refine_clone_clip_bounds(2.0, 4.0, [])
    assert b.start_seconds == 2.0
    assert b.end_seconds == 6.0
    assert b.transcript == ""


def test_clone_clip_word_started_before_window_dropped():
    words = [W("early", -0.5, 0.3), W("kept", 0.5, 1.0)]
    b = refine_clone_clip_bounds(0.0, 4.0, words)
    assert b.transcript == "kept"
    # Clip start pushed past the clipped head word.
    assert b.start_seconds >= 0.3


def test_clone_clip_zero_duration_invalid():
    b = refine_clone_clip_bounds(0.0, 0.0, [W("x", 0.1, 0.2)])
    assert b.transcript == ""
