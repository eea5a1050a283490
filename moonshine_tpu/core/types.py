"""Transcript data model — the single schema for lines/words/speakers.

The reference keeps five hand-synced copies of these structs across the C
ABI and bindings (reference: core/transcriber.h:22-27 lists the files that
must change together); here one set of dataclasses is the source of truth
for every layer.  Field semantics mirror ``transcript_line_t``
(reference: core/moonshine-c-api.h:151-237).
"""

from __future__ import annotations

from dataclasses import dataclass, field, replace
from typing import Optional

import numpy as np


@dataclass
class TranscriptWord:
    """One aligned word (reference: core/word-alignment.h:38-44)."""

    text: str
    start: float
    end: float
    confidence: float = 0.0


@dataclass
class SpeakerSpan:
    """A diarization span clipped to a line (reference: moonshine-c-api.h
    speaker_span_t)."""

    start_time: float
    duration: float
    speaker_id: int
    speaker_index: int
    start_char: int = 0
    end_char: int = 0


@dataclass
class TranscriptLine:
    """One line of transcription with update-diff flags.

    Contract (reference: moonshine-c-api.h:165-196): completed lines are
    frozen (except speaker spans); only the last line may be incomplete;
    ``is_new``/``has_text_changed``/``is_updated`` are exactly-once flags
    valid for the snapshot they were returned in.
    """

    id: int
    text: Optional[str] = None
    start_time: float = 0.0
    duration: float = 0.0
    is_complete: bool = False
    is_updated: bool = False
    is_new: bool = False
    has_text_changed: bool = False
    have_speakers_changed: bool = False
    last_transcription_latency_ms: int = 0
    audio_data: Optional[np.ndarray] = None
    words: list[TranscriptWord] = field(default_factory=list)
    speaker_spans: list[SpeakerSpan] = field(default_factory=list)

    @property
    def end_time(self) -> float:
        return self.start_time + self.duration

    def copy(self) -> "TranscriptLine":
        return replace(
            self,
            words=list(self.words),
            speaker_spans=list(self.speaker_spans),
            audio_data=None if self.audio_data is None else self.audio_data,
        )


@dataclass
class Transcript:
    """A snapshot of all lines, in order."""

    lines: list[TranscriptLine] = field(default_factory=list)

    @property
    def text(self) -> str:
        return "\n".join(l.text for l in self.lines if l.text)

    def __str__(self) -> str:
        out = [f"{len(self.lines)} lines"]
        for l in self.lines:
            out.append(f"{l.start_time:.1f}s: {l.text if l.text is not None else '<null>'}")
        return "\n".join(out)
