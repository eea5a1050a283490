"""VAD segmentation state machine.

Host-side port of the reference's hysteresis segmenter with identical
semantics (reference: core/voice-activity-detector.{h,cpp}): 512-sample
hops, probability smoothing over a 32-hop window, look-behind prepend of
up to 4096 samples, force-split at ``max_segment_sample_count`` via a
linear threshold decay starting at 2/3 of the cap (reference:
voice-activity-detector.cpp:159-170), ``threshold == 0`` treated as
always-voice, and retained/completed byte accounting for leak tests
(reference: voice-activity-detector.h:59-61).

The neural hop probabilities come from a pluggable callable so the machine
runs against the batched JAX VAD (moonshine_tpu.models.vad), a synthetic
oracle in tests, or a trained checkpoint, without changing segmentation
logic.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable, Sequence

import numpy as np

from ..audio.resample import resample_audio

VAD_SAMPLE_RATE = 16000
HOP_SIZE = 512


@dataclass
class VoiceSegment:
    """One detected speech span (reference: voice-activity-detector.h:9-21)."""

    audio_data: np.ndarray
    start_time: float
    end_time: float
    is_complete: bool = False
    just_updated: bool = False

    def clear_audio(self) -> None:
        self.audio_data = np.zeros(0, np.float32)


# A hop-probability function: [H, 512] float32 -> [H] probabilities.
HopProbFn = Callable[[np.ndarray], np.ndarray]


class VadSegmenter:
    def __init__(
        self,
        hop_prob_fn: HopProbFn,
        threshold: float = 0.5,
        window_size: int = 32,
        hop_size: int = HOP_SIZE,
        look_behind_sample_count: int = 4096,
        max_segment_sample_count: int = 15 * VAD_SAMPLE_RATE,
    ):
        self.hop_prob_fn = hop_prob_fn
        self.threshold = threshold
        self.window_size = window_size
        self.hop_size = hop_size
        self.look_behind_sample_count = look_behind_sample_count
        self.max_segment_sample_count = max_segment_sample_count
        self._is_active = False
        self.segments: list[VoiceSegment] = []
        self._reset_state()

    def _reset_state(self) -> None:
        self.probability_window = np.zeros(self.window_size, np.float32)
        self.probability_window_index = 0
        self.samples_processed = 0
        self.current_segment: list[np.ndarray] = []
        self.current_segment_len = 0
        self.look_behind = np.zeros(self.look_behind_sample_count, np.float32)
        self.remainder = np.zeros(0, np.float32)
        self.previous_is_voice = False

    # -- lifecycle (reference: voice-activity-detector.cpp:50-67) ----------

    @property
    def is_active(self) -> bool:
        return self._is_active

    def start(self) -> None:
        self._is_active = True
        self.segments = []
        self._reset_state()

    def stop(self) -> None:
        self._is_active = False
        if self.previous_is_voice:
            self._on_voice_end()
            self.previous_is_voice = False

    # -- accounting --------------------------------------------------------

    def retained_segment_audio_byte_count(self) -> int:
        return sum(s.audio_data.size for s in self.segments) * 4

    def completed_segment_audio_byte_count(self) -> int:
        return sum(s.audio_data.size for s in self.segments if s.is_complete) * 4

    def clear_completed_segment_audio_data(self) -> None:
        for s in self.segments:
            if s.is_complete:
                s.clear_audio()

    # -- main entry --------------------------------------------------------

    def process_audio(self, audio: np.ndarray, sample_rate: int = VAD_SAMPLE_RATE) -> None:
        if not self._is_active:
            return
        for s in self.segments:
            s.just_updated = False
        audio = resample_audio(np.asarray(audio, np.float32), sample_rate, VAD_SAMPLE_RATE)
        buf = np.concatenate([self.remainder, audio])
        n_hops = len(buf) // self.hop_size
        if n_hops == 0:
            self.remainder = buf
            return
        hops = buf[: n_hops * self.hop_size].reshape(n_hops, self.hop_size)
        self.remainder = buf[n_hops * self.hop_size :]

        if self.threshold > 0.0:
            probs = np.asarray(self.hop_prob_fn(hops), np.float32)
        else:
            # threshold==0: everything is voice; force-split still applies
            # (reference: voice-activity-detector.cpp:150-156).
            probs = np.ones(n_hops, np.float32)
        for i in range(n_hops):
            self._process_hop(hops[i], probs[i])

    # -- per-hop state machine (reference: cpp:125-196) --------------------

    def _smoothed(self, prob: float) -> float:
        if self.threshold > 0.0:
            self.probability_window[self.probability_window_index] = prob
            self.probability_window_index = (
                self.probability_window_index + 1
            ) % self.window_size
            return float(self.probability_window.mean())
        return 1.0

    def _process_hop(self, hop: np.ndarray, prob: float) -> None:
        self.samples_processed += len(hop)
        # Slide the look-behind buffer.
        self.look_behind = np.concatenate([self.look_behind[len(hop) :], hop])

        smoothed = self._smoothed(prob)
        # Force-split decay: past 2/3 of the max segment length, scale the
        # probability linearly toward 0 at max length.
        fade_count = (self.max_segment_sample_count * 2) // 3
        if self.max_segment_sample_count and self.current_segment_len > fade_count:
            fade = (self.current_segment_len - fade_count) / fade_count
            smoothed = smoothed * fade

        current_is_voice = smoothed > self.threshold
        if (
            self.threshold <= 0.0
            and self.max_segment_sample_count
            and self.current_segment_len >= self.max_segment_sample_count
        ):
            # Intentional divergence from the reference's literal code: at
            # threshold exactly 0 its faded probability stays strictly
            # positive, so `smoothed > 0` never turns false and the split
            # its own comment promises ("ensures that the voice end event
            # is triggered", voice-activity-detector.cpp:159-170) never
            # fires.  Implement the documented intent: always-voice
            # segments hard-split at max_segment_sample_count.
            current_is_voice = False
        if current_is_voice and not self.previous_is_voice:
            look = min(self.look_behind_sample_count, self.samples_processed)
            prefix = self.look_behind[len(self.look_behind) - look :]
            self.current_segment = [prefix.copy()]
            self.current_segment_len = len(prefix)
            self._on_voice_start()
        elif not current_is_voice and self.previous_is_voice:
            self._append_hop(hop)
            self._on_voice_end()
            self.current_segment = []
            self.current_segment_len = 0
            # The look-behind buffer is RETAINED across voice end: the
            # reference's resize at voice-activity-detector.cpp:186 is a
            # same-size no-op, so a segment starting within the look-behind
            # window of a prior one gets real audio pre-roll, not silence.
        elif current_is_voice and self.previous_is_voice:
            self._append_hop(hop)
            self._on_voice_continuing()
        self.previous_is_voice = current_is_voice

    def _append_hop(self, hop: np.ndarray) -> None:
        self.current_segment.append(hop.copy())
        self.current_segment_len += len(hop)

    def _segment_audio(self) -> np.ndarray:
        if not self.current_segment:
            return np.zeros(0, np.float32)
        return np.concatenate(self.current_segment)

    def _now(self) -> float:
        return self.samples_processed / VAD_SAMPLE_RATE

    def _on_voice_start(self) -> None:
        audio = self._segment_audio()
        now = self._now()
        self.segments.append(
            VoiceSegment(
                audio_data=audio,
                start_time=now - len(audio) / VAD_SAMPLE_RATE,
                end_time=now,
                is_complete=False,
                just_updated=True,
            )
        )

    def _on_voice_continuing(self) -> None:
        seg = self.segments[-1]
        seg.audio_data = self._segment_audio()
        seg.end_time = self._now()
        seg.just_updated = True

    def _on_voice_end(self) -> None:
        seg = self.segments[-1]
        seg.audio_data = self._segment_audio()
        seg.end_time = self._now()
        seg.is_complete = True
        seg.just_updated = True
