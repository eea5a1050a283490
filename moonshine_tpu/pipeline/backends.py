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
from typing import NamedTuple, Protocol

import jax
import jax.numpy as jnp
import numpy as np

from ..core.config import MoonshineArchConfig
from ..core.tokenizer import BinTokenizer
from ..decoding.greedy import greedy_decode
from ..models import moonshine as mm

INTERNAL_SAMPLE_RATE = 16000


class SegmentResult(NamedTuple):
    """Output of one segment transcription pass."""

    text: str | None
    words: list  # list[TranscriptWord]; empty unless word timestamps ran


class AsrBackend(Protocol):
    def transcribe_segment(
        self, audio: np.ndarray, segment_id: int, is_final: bool
    ) -> SegmentResult:
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
        word_timestamps: bool = False,
        kv_int8: bool = False,
    ):
        # Fold the rotary pair-swap permutation into the weights once at
        # load (idempotent; the apply side prefers the folded leaves) so
        # the production path never pays the per-step in-trace column
        # gather (ADVICE r4).
        self.params = mm.prepare_rotary_params(params, cfg)
        self.cfg = cfg
        self.tokenizer = tokenizer
        self.max_tokens_per_second = max_tokens_per_second
        self.min_bucket = min_bucket_seconds
        self.max_bucket = max_bucket_seconds
        self.word_timestamps = word_timestamps
        # int8 KV caches with in-einsum dequant (ops/int8_kv.py): +14%
        # decode throughput, verified token-identical on real audio.
        self.kv_int8 = kv_int8
        # Single-process product path: "auto" picks the Pallas encoder
        # attention kernel on a TPU backend (1.33x, docs/PERF.md).
        self._encode = jax.jit(
            lambda p, a, l: mm.encode(p, cfg, a, l, attn_impl="auto"),
            static_argnames=(),
        )

    def reset(self) -> None:
        pass

    def _align(self, memory, mask, ids: np.ndarray, duration: float) -> list:
        """Second teacher-forced pass collecting cross-attention, then DTW
        (reference: moonshine-model.cpp:681-721 runs a separate
        decoder_with_attention.ort pass; here the same decoder collects)."""
        from .alignment import align_words

        dec = self.params["decoder"]
        seq = np.concatenate([[self.cfg.decoder_start_token_id], ids]).astype(np.int32)
        k_cross, v_cross = mm.compute_cross_kv(dec, self.cfg, memory)
        cache = mm.init_cache(self.cfg, 1, len(seq), k_cross, v_cross, mask)
        _, _, cross_w = mm.decoder_apply(
            dec, self.cfg, jnp.asarray(seq)[None], cache, collect_cross_attention=True
        )
        # cross_w: [L, B, H, steps, frames] -> [L*H, steps, frames(valid)]
        w = np.asarray(cross_w)[:, 0]
        n_frames = int(np.asarray(mask[0]).sum())
        att = w.reshape(-1, w.shape[2], w.shape[3])[:, :, :n_frames]
        tokens = [int(seq[0])] + [int(t) for t in ids] + [self.cfg.eos_token_id]
        return align_words(att, tokens, duration / max(n_frames, 1), self.tokenizer)

    def _bucket_samples(self, n: int) -> int:
        seconds = max(n / INTERNAL_SAMPLE_RATE, 1e-3)
        bucket = self.min_bucket
        while bucket < seconds and bucket < self.max_bucket:
            bucket *= 2
        return int(min(bucket, self.max_bucket) * INTERNAL_SAMPLE_RATE)

    def transcribe_segment(
        self, audio: np.ndarray, segment_id: int, is_final: bool
    ) -> SegmentResult:
        del segment_id  # stateless: every pass redecodes fully
        audio = np.asarray(audio, np.float32)
        if audio.size < self.cfg.min_samples():
            return SegmentResult("", [])
        n_bucket = self._bucket_samples(audio.size)
        n_real = min(audio.size, n_bucket)
        padded = np.zeros(n_bucket, np.float32)
        padded[:n_real] = audio[:n_real]
        lengths = jnp.asarray([n_real], jnp.int32)

        from .. import profiling

        with profiling.log_run("encode", samples=n_bucket):
            memory, mask = self._encode(self.params, jnp.asarray(padded)[None, :], lengths)
        duration = n_real / INTERNAL_SAMPLE_RATE
        cap = max(int(duration * self.max_tokens_per_second), 1)
        # max_tokens is static per bucket so the decode program caches too.
        max_tokens = max(int(n_bucket / INTERNAL_SAMPLE_RATE * self.max_tokens_per_second), 8)
        with profiling.log_run("decode", max_tokens=max_tokens):
            res = greedy_decode(
                self.params,
                self.cfg,
                memory,
                mask,
                max_tokens=max_tokens,
                token_caps=jnp.asarray([cap], jnp.int32),
                kv_int8=self.kv_int8,
            )
            n = int(res.lengths[0])
        ids = np.asarray(res.tokens[0, :n])
        text = self.tokenizer.tokens_to_text(ids)
        words = []
        if self.word_timestamps and is_final and n > 0:
            # Alignment costs ~a quarter of a pass and incomplete segments
            # get fully re-transcribed anyway, so align only on completion
            # (reference: transcriber.cpp:966-975 rationale comment).
            words = self._align(memory, mask, ids, duration)
        return SegmentResult(text, words)


class StreamingBackend:
    """Incremental transcription with the streaming model family.

    Mirrors the reference's per-segment incremental flow (reference:
    core/transcriber.cpp:1184-1316): per segment it keeps a device-resident
    ``StreamingState``, feeds ONLY new samples through the stateful
    frontend, emits newly-stable encoder frames, and re-decodes with the
    previous hypothesis as a speculative draft.
    """

    # Frame-count buckets for frontend chunks: any span decomposes into a
    # few calls so only O(log) programs compile.  The 25-multiple rungs
    # make the common update sizes (0.125 s steps at 200 fps) a single
    # dispatch — per-dispatch overhead is ~2.5 ms through the axon relay.
    _BUCKETS = [512, 400, 256, 200, 128, 100, 64, 50, 32, 25, 16, 8, 4, 2, 1]

    def __init__(
        self,
        params,
        cfg,
        tokenizer: BinTokenizer,
        use_speculative_decoding: bool = True,
        max_tokens_per_second: float = 6.5,
        word_timestamps: bool = False,
    ):
        from ..models import streaming as ms

        self.ms = ms
        self.params = params
        self.cfg = cfg
        self.tokenizer = tokenizer
        self.use_speculative = use_speculative_decoding
        self.max_tokens_per_second = max_tokens_per_second
        self.word_timestamps = word_timestamps
        self.reset()

    def reset(self) -> None:
        self._segment_id: int | None = None
        self._state = None
        self._samples_processed = 0
        self._last_tokens: list[int] = []
        self._last_text = ""
        # Exact host mirrors of the device's feat_count / enc_emitted
        # cursors (deterministic integer arithmetic): every int(device
        # scalar) was a relay round trip per update (docs/PERF.md packed
        # control-plane analysis); the mirrors make updates sync-free.
        self._feat_host = 0
        self._emitted_host = 0

    def _begin_segment(self, segment_id: int) -> None:
        self._segment_id = segment_id
        self._state = self.ms.init_state(self.cfg)
        self._samples_processed = 0
        self._last_tokens = []
        self._last_text = ""
        self._feat_host = 0
        self._emitted_host = 0

    def transcribe_segment(
        self, audio: np.ndarray, segment_id: int, is_final: bool
    ) -> SegmentResult:
        if segment_id != self._segment_id:
            self._begin_segment(segment_id)

        audio = np.asarray(audio, np.float32)
        result = self._transcribe(audio, is_final)
        words = []
        if self.word_timestamps and is_final and self._last_tokens:
            words = self._align_streaming()
        return SegmentResult(result, words)

    def _transcribe(self, audio: np.ndarray, is_final: bool) -> str:
        ms, cfg = self.ms, self.cfg
        new = audio[self._samples_processed :]
        frame_len = cfg.frame_len
        n_frames = len(new) // frame_len
        if is_final and len(new) % frame_len and len(new) > 0:
            # Zero-pad the trailing partial frame on segment close.
            pad = frame_len - (len(new) % frame_len)
            new = np.concatenate([new, np.zeros(pad, np.float32)])
            n_frames = len(new) // frame_len

        # Respect the device buffer capacity (VAD force-split keeps real
        # segments far below this).
        n_frames = min(n_frames, ms.SEG_CAP - self._feat_host)

        from .. import profiling

        offset = 0
        remaining = n_frames
        with profiling.log_run("frontend", frames=n_frames):
            for bucket in self._BUCKETS:
                while remaining >= bucket:
                    chunk = jnp.asarray(
                        new[offset : offset + bucket * frame_len]
                    )
                    self._state = ms.frontend_step(self.params, cfg, chunk, self._state)
                    offset += bucket * frame_len
                    remaining -= bucket
                    self._feat_host += bucket
        self._samples_processed += offset

        # Stable-frame arithmetic on host mirrors (no device sync).
        stable = self._feat_host if is_final else max(
            0, self._feat_host - cfg.total_lookahead
        )
        n_new = max(stable - self._emitted_host, 0)
        with profiling.log_run("encode_step"):
            emitted = 0
            while emitted < n_new:
                step = min(n_new - emitted, ms.ENC_STEP)
                self._state = ms.encode_step(
                    self.params, cfg, self._state, jnp.asarray(step, jnp.int32)
                )
                emitted += step
            self._emitted_host += n_new
        if self._emitted_host == 0:
            return ""
        if n_new == 0 and not is_final and self._last_text:
            # Nothing newly stable: previous hypothesis still holds.
            return self._last_text

        duration = self._samples_processed / INTERNAL_SAMPLE_RATE
        cap = min(max(int(duration * self.max_tokens_per_second), 1), cfg.max_seq_len - 2)
        draft_list = (self._last_tokens if self.use_speculative else [])[: cfg.max_seq_len]
        draft = np.full(cfg.max_seq_len, cfg.eos_id, np.int32)
        draft[: len(draft_list)] = draft_list
        # One device program per update: verify + rollback + continue fused.
        with profiling.log_run("decode_full", draft=len(draft_list)):
            tokens_arr, count, self._state = ms.decode_full_fused(
                self.params,
                cfg,
                self._state,
                jnp.asarray(draft),
                jnp.asarray(len(draft_list), jnp.int32),
                jnp.asarray(cap, jnp.int32),
                mem_bucket=ms.mem_bucket_for(self._emitted_host),
            )
            # ONE fetch: tokens are EOS-padded and real tokens are never
            # EOS, so the count is the first EOS position host-side —
            # fetching `count` separately would be a second round trip.
            tok_np = np.asarray(tokens_arr)
            eos_pos = np.nonzero(tok_np == cfg.eos_id)[0]
            n_tok = int(eos_pos[0]) if len(eos_pos) else len(tok_np)
            tokens = [int(t) for t in tok_np[:n_tok]]
        self._last_tokens = tokens
        self._last_text = self.tokenizer.tokens_to_text(tokens)
        return self._last_text

    def _align_streaming(self) -> list:
        """Teacher-forced attention-collecting pass over the final tokens
        (reference: streaming word timestamps, transcriber.cpp:905-950)."""
        from .alignment import align_words

        ms, cfg = self.ms, self.cfg
        seq_list = [cfg.bos_id] + self._last_tokens
        bucket = 1
        while bucket < len(seq_list):
            bucket *= 2
        seq = jnp.asarray(seq_list + [0] * (bucket - len(seq_list)), jnp.int32)
        state = ms.decoder_reset(self._state)
        _, _, cross_w = ms.decode_tokens(
            self.params, cfg, seq, state, collect_attention=True
        )
        mem_len = int(self._state.mem_len)
        # [L, H, s, MEM_CAP] -> [L*H, steps, valid_frames]
        w = np.asarray(cross_w)
        n_steps = len(seq_list)  # rows for [bos, t0..tn-1]
        att = w.reshape(-1, w.shape[2], w.shape[3])[:, :n_steps, :mem_len]
        tokens = [cfg.bos_id] + list(self._last_tokens) + [cfg.eos_id]
        duration = self._samples_processed / INTERNAL_SAMPLE_RATE
        return align_words(att, tokens, duration / max(mem_len, 1), self.tokenizer)


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
        out = self.script(audio, segment_id, is_final)
        if isinstance(out, SegmentResult):
            return out
        return SegmentResult(out, [])
