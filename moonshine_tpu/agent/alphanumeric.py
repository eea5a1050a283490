"""Alphanumeric dictation sessions for Ask(mode=SPELLED/DIGITS).

Capability mirror of the reference's alphanumeric_listener.py (reference:
language-bindings/python/src/moonshine_voice/alphanumeric_listener.py,
1,098 LoC): characters are accumulated one utterance at a time through the
spelling matcher (+ optional spelling-CNN fusion), with STOPPED ending the
session, CLEAR resetting the buffer and UNDO deleting the last character.
DIGITS mode additionally accepts multi-digit number utterances and
restricts letters.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable, Optional

import numpy as np

from ..pipeline.spelling import (
    SpellingMatcher,
    SpellingMatchType,
    fuse_default,
)


@dataclass
class AlphaEvent:
    """One session update: the action taken and the current buffer."""

    action: str  # "append" | "undo" | "clear" | "stop" | "none"
    character: str = ""
    buffer: str = ""


PredictFn = Callable[[np.ndarray], object]  # audio -> SpellingPrediction


class AlphanumericSession:
    """Accumulates characters from successive utterances."""

    def __init__(
        self,
        mode: str = "spelled",  # "spelled" | "digits"
        predict_fn: Optional[PredictFn] = None,
        on_event: Optional[Callable[[AlphaEvent], None]] = None,
    ):
        self.mode = mode
        self.predict_fn = predict_fn
        self.on_event = on_event
        self.matcher = SpellingMatcher()
        self.buffer: list[str] = []
        self.stopped = False

    @property
    def value(self) -> str:
        return "".join(self.buffer)

    def _emit(self, action: str, character: str = "") -> AlphaEvent:
        ev = AlphaEvent(action=action, character=character, buffer=self.value)
        if self.on_event:
            self.on_event(ev)
        return ev

    def handle_utterance(self, text: str, audio: np.ndarray | None = None) -> AlphaEvent:
        """Process one completed line; returns the resulting event."""
        if self.stopped:
            return self._emit("stop")
        match = self.matcher.classify(text)
        prediction = None
        if self.predict_fn is not None and audio is not None and len(audio):
            prediction = self.predict_fn(audio)
        fused = fuse_default(text, match, prediction, self.matcher)

        if fused.type == SpellingMatchType.STOPPED:
            self.stopped = True
            return self._emit("stop")
        if fused.type == SpellingMatchType.CLEAR:
            self.buffer.clear()
            return self._emit("clear")
        if fused.type == SpellingMatchType.UNDO:
            if self.buffer:
                self.buffer.pop()
            return self._emit("undo")
        if fused.type == SpellingMatchType.CHARACTER:
            ch = fused.character
            if self.mode == "digits":
                # Digits mode accepts only digit strings (multi-digit fine).
                if not ch.isdigit():
                    return self._emit("none")
            self.buffer.extend(ch)
            return self._emit("append", ch)
        return self._emit("none")
