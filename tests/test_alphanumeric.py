"""Alphanumeric session + VoiceClone API tests."""

import numpy as np
import pytest

from moonshine_tpu.agent.alphanumeric import AlphanumericSession
from moonshine_tpu.models.spelling import SpellingPrediction


def test_spelled_session_accumulates():
    s = AlphanumericSession()
    assert s.handle_utterance("bravo").buffer == "b"
    assert s.handle_utterance("Oscar").buffer == "bo"
    assert s.handle_utterance("bee").buffer == "bob"
    ev = s.handle_utterance("stop")
    assert ev.action == "stop"
    assert s.value == "bob"
    assert s.stopped


def test_undo_and_clear():
    s = AlphanumericSession()
    s.handle_utterance("a")
    s.handle_utterance("bee")
    assert s.handle_utterance("undo").buffer == "a"
    s.handle_utterance("sea")
    assert s.handle_utterance("clear").buffer == ""


def test_unrecognized_is_none():
    s = AlphanumericSession()
    ev = s.handle_utterance("the weather is nice")
    assert ev.action == "none"
    assert s.value == ""


def test_digits_mode_rejects_letters():
    s = AlphanumericSession(mode="digits")
    assert s.handle_utterance("five").buffer == "5"
    assert s.handle_utterance("bravo").action == "none"
    assert s.handle_utterance("forty two").buffer == "542"


def test_fusion_with_cnn_prediction():
    s = AlphanumericSession(
        predict_fn=lambda audio: SpellingPrediction("d", 0.9, "d")
    )
    # ASR says "bee" but confident CNN says "d": model wins same-class tie.
    ev = s.handle_utterance("bee", np.ones(16000, np.float32))
    assert ev.buffer == "d"


def test_events_fired():
    events = []
    s = AlphanumericSession(on_event=events.append)
    s.handle_utterance("a")
    s.handle_utterance("stop")
    assert [e.action for e in events] == ["append", "stop"]


# -- VoiceClone API --------------------------------------------------------

class AlwaysSpeech:
    def __call__(self, hops):
        return np.ones(hops.shape[0], np.float32)


def test_voice_clone_capture_and_finalize():
    from moonshine_tpu.core.types import TranscriptWord
    from moonshine_tpu.tts.voice_clone_api import VoiceClone

    progress = []
    vc = VoiceClone(AlwaysSpeech(), on_progress=progress.append)
    with pytest.raises(RuntimeError):
        vc.finalize()
    p = vc.add_audio(np.full(16000 * 6, 0.1, np.float32))
    assert p.ready
    assert progress and progress[-1].ready
    words = [
        TranscriptWord("hello", 0.3, 0.9),
        TranscriptWord("there", 1.0, 1.6),
        TranscriptWord("friend", 3.8, 4.4),
    ]
    clip = vc.finalize(words=words)
    assert clip.is_complete
    assert vc.transcript == "hello there friend"
    assert clip.audio.size > 0
