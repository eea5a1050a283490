"""Per-stream transcript state with update-diff flags.

Python counterpart of ``TranscriptStreamOutput`` (reference:
core/transcriber.cpp:1478-1608): lines keyed by stable 64-bit ids, ordered
by segment index, with ``is_new`` / ``has_text_changed`` /
``have_speakers_changed`` computed by diffing against the previous state of
the same line.  Snapshots hand out copies so completed lines stay frozen
for the caller even as diarization revises spans internally.
"""

from __future__ import annotations

import threading

from ..core.types import SpeakerSpan, Transcript, TranscriptLine


class TranscriptOutput:
    def __init__(self) -> None:
        self._lines: dict[int, TranscriptLine] = {}
        self.ordered_line_ids: list[int] = []
        self._lock = threading.Lock()

    def line_count(self) -> int:
        return len(self.ordered_line_ids)

    def get_line(self, line_id: int) -> TranscriptLine | None:
        return self._lines.get(line_id)

    def add_or_update_line(self, line: TranscriptLine) -> None:
        """Insert or update, computing diff flags against the previous state
        (reference: transcriber.cpp:1478-1497)."""
        with self._lock:
            existing = self._lines.get(line.id)
            if existing is not None:
                line.is_new = False
                line.has_text_changed = existing.text != line.text
                # Speaker spans are maintained by apply_speaker_turns; carry
                # them over rather than dropping on each transcription pass.
                line.speaker_spans = existing.speaker_spans
                line.have_speakers_changed = existing.have_speakers_changed
            else:
                line.is_new = True
                line.has_text_changed = line.text is not None
            self._lines[line.id] = line

    def clear_update_flags(self) -> None:
        with self._lock:
            for line_id in self.ordered_line_ids:
                line = self._lines[line_id]
                line.is_updated = False
                line.is_new = False
                line.has_text_changed = False
                line.have_speakers_changed = False

    def mark_all_lines_as_complete(self) -> None:
        with self._lock:
            for line_id in self.ordered_line_ids:
                line = self._lines[line_id]
                if not line.is_complete:
                    line.is_complete = True
                    line.is_updated = True

    def set_speaker_spans(self, line_id: int, spans: list[SpeakerSpan]) -> bool:
        """Replace a line's spans; returns True (and flags) if changed beyond
        boundary jitter (reference: transcriber.cpp apply_speaker_turns,
        kTimeTolerance 0.1s)."""
        tol = 0.1
        with self._lock:
            line = self._lines.get(line_id)
            if line is None:
                return False
            old = line.speaker_spans
            changed = len(old) != len(spans) or any(
                o.speaker_id != n.speaker_id
                or abs(o.start_time - n.start_time) > tol
                or abs(o.duration - n.duration) > tol
                for o, n in zip(old, spans)
            )
            line.speaker_spans = spans
            if changed:
                line.have_speakers_changed = True
            return changed

    def snapshot(self) -> Transcript:
        with self._lock:
            return Transcript(
                lines=[self._lines[i].copy() for i in self.ordered_line_ids]
            )
