"""ASR backends: the model-facing seam of the transcription pipeline.

The reference transcriber dispatches per segment to either MoonshineModel
or MoonshineStreamingModel (reference: core/transcriber.cpp:897-1020).
Here the seam is a small protocol so the pipeline logic is testable with a
scripted fake while production uses the jitted JAX models.

``OfflineBackend`` is the TINY/BASE path: each just-updated segment is
re-transcribed whole.  Audio is padded to exponential duration buckets so
XLA compiles a handful of shapes once instead of one program per length
(the streaming arch keeps incremental state instead — models/streaming.py).
"""

from __future__ import annotations

import math
import time
from typing import Protocol

import jax
import jax.numpy as jnp
import numpy as np

from ..core.config import MoonshineArchConfig
from ..core.tokenizer import BinTokenizer
from ..decoding.greedy import greedy_decode
from ..models import moonshine as mm

INTERNAL_SAMPLE_RATE = 16000


class AsrBackend(Protocol):
    def transcribe_segment(
        self, audio: np.ndarray, segment_id: int, is_final: bool
    ) -> str | None:
        """Transcribe one VAD segment (16 kHz float32). May keep per-segment
        incremental state keyed by ``segment_id``."""
        ...

    def reset(self) -> None:
        ...


class OfflineBackend:
    """Whole-segment greedy transcription with duration bucketing."""

    def __init__(
        self,
        params,
        cfg: MoonshineArchConfig,
        tokenizer: BinTokenizer,
        max_tokens_per_second: float = 6.5,
        min_bucket_seconds: float = 2.0,
        max_bucket_seconds: float = 64.0,
    ):
        self.params = params
        self.cfg = cfg
        self.tokenizer = tokenizer
        self.max_tokens_per_second = max_tokens_per_second
        self.min_bucket = min_bucket_seconds
        self.max_bucket = max_bucket_seconds
        self._encode = jax.jit(
            lambda p, a, l: mm.encode(p, cfg, a, l), static_argnames=()
        )

    def reset(self) -> None:
        pass

    def _bucket_samples(self, n: int) -> int:
        seconds = max(n / INTERNAL_SAMPLE_RATE, 1e-3)
        bucket = self.min_bucket
        while bucket < seconds and bucket < self.max_bucket:
            bucket *= 2
        return int(min(bucket, self.max_bucket) * INTERNAL_SAMPLE_RATE)

    def transcribe_segment(
        self, audio: np.ndarray, segment_id: int, is_final: bool
    ) -> str | None:
        del segment_id, is_final  # stateless: every pass redecodes fully
        audio = np.asarray(audio, np.float32)
        if audio.size < self.cfg.min_samples():
            return ""
        n_bucket = self._bucket_samples(audio.size)
        n_real = min(audio.size, n_bucket)
        padded = np.zeros(n_bucket, np.float32)
        padded[:n_real] = audio[:n_real]
        lengths = jnp.asarray([n_real], jnp.int32)

        memory, mask = self._encode(self.params, jnp.asarray(padded)[None, :], lengths)
        duration = n_real / INTERNAL_SAMPLE_RATE
        cap = max(int(duration * self.max_tokens_per_second), 1)
        # max_tokens is static per bucket so the decode program caches too.
        max_tokens = max(int(n_bucket / INTERNAL_SAMPLE_RATE * self.max_tokens_per_second), 8)
        res = greedy_decode(
            self.params,
            self.cfg,
            memory,
            mask,
            max_tokens=max_tokens,
            token_caps=jnp.asarray([cap], jnp.int32),
        )
        n = int(res.lengths[0])
        ids = np.asarray(res.tokens[0, :n])
        return self.tokenizer.tokens_to_text(ids)


class FakeBackend:
    """Scripted backend for pipeline tests: maps audio spans to canned text.

    The reference tests run real models against real audio; without
    redistributable weights, pipeline *logic* tests script this seam and
    model numerics are covered by the HF parity suite.
    """

    def __init__(self, script=None):
        # script: callable (audio, segment_id, is_final) -> str
        self.script = script or (
            lambda audio, seg_id, is_final: f"seg{seg_id}:{len(audio)}"
        )
        self.calls: list[tuple[int, int, bool]] = []

    def reset(self) -> None:
        self.calls.clear()

    def transcribe_segment(self, audio, segment_id, is_final):
        self.calls.append((segment_id, len(audio), is_final))
        return self.script(audio, segment_id, is_final)
