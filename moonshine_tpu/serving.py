"""Multi-stream streaming service: N live streams on one chip.

Host-side orchestration over models/streaming_batch.service_update — the
TPU-native answer to the reference's thread-per-stream multiplexing
(reference: core/transcriber.h:77-110).  Every update is ONE device
program for all slots: masked frontend ingest, windowed encode, batched
speculative verify + greedy continue.  Optional voice-activity detection
runs the real-weight TinyVad batched over all slots in one call, feeding
per-slot hysteresis segmenters.

Flow per slot (mirrors the reference's stream semantics):
  add_audio() -> [VAD segmenter ->] current segment's pending samples
  update()    -> feed whole frames (cap per update), decode with the
                 previous hypothesis as speculative draft, emit
                 partial/final TranscriptEvents with per-update latency.

Segments are bounded by VAD force-split (15 s, reference:
voice-activity-detector.cpp:159-170) or by the same cap in always-voice
mode (vad=None == the reference's vad_threshold=0 contract).
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field, replace

import numpy as np

from .core.config import StreamingConfig
from .core.tokenizer import BinTokenizer
from .models import streaming_batch as sb

FRAME_LEN = 80
HOP = 512


@dataclass
class StreamEvent:
    slot: int
    segment_id: int
    text: str
    is_final: bool
    start_time: float
    end_time: float
    latency_ms: float  # wall time of the device update that produced this


@dataclass
class _PendingUpdate:
    """A dispatched-but-uncollected service tick (update_begin/update_end)."""

    out: object  # sb.ServiceOutput with device arrays still in flight
    t0: float
    is_final: np.ndarray
    decode_mask: np.ndarray


@dataclass
class _Slot:
    active: bool = False
    eos: bool = False  # end-of-stream: finalize every remaining segment
    segment_id: int = 0
    # Current segment feed state
    pending: np.ndarray = field(default_factory=lambda: np.zeros(0, np.float32))
    fed_samples: int = 0
    seg_start_time: float = 0.0
    seg_final_queued: bool = False  # all segment audio known; flush + finalize
    needs_reset: bool = True
    # Host mirror of the device's stable-frame arithmetic (exact integer
    # twin of streaming_batch.service_update's n_new computation): lets
    # update() dispatch exactly as many encoder passes as the backlog
    # needs — one in steady state — instead of a fixed count.
    feat_total: int = 0
    enc_emitted_host: int = 0
    # Hypothesis
    tokens: list = field(default_factory=list)
    last_text: str = ""
    # Always-voice bookkeeping
    stream_samples: int = 0
    # Segment queue (from VAD): list of (audio, start_time, is_complete)
    raw_buffer: np.ndarray = field(default_factory=lambda: np.zeros(0, np.float32))


class StreamingService:
    """Batched streaming transcription over a fixed number of slots.

    ``device``: optional ``jax.Device`` this service's weights and KV
    state live on.  When set, every update program runs on that device
    (committed inputs pin XLA's placement) — the unit of stream-level
    data parallelism: K services on K mesh devices serve K·S streams
    with ZERO hot-path collectives (each stream's state is private, so
    nothing is exchanged; see docs/SCALING.md).
    """

    def __init__(
        self,
        params,
        cfg: StreamingConfig,
        tokenizer: BinTokenizer | None,
        n_streams: int,
        update_frames: int = 128,  # frames ingested per slot per update (0.64 s)
        mem_bucket: int = 2048,
        draft_cap: int = sb.DRAFT_CAP,
        max_tokens_per_second: float = 6.5,
        max_segment_seconds: float = 15.0,
        vad=None,  # models.vad.TinyVad or None (always-voice)
        vad_threshold: float = 0.5,
        compute_dtype=None,  # e.g. jnp.bfloat16 for the encode/decode path
        kv_int8: bool = False,  # int8 KV caches w/ fused dequant (ops/int8_kv.py)
        device=None,  # jax.Device to pin this service's state/programs to
    ):
        import jax
        import jax.numpy as jnp

        self._jnp = jnp
        self.device = device

        def _put_leaf(x):
            # Skip already-resident leaves: device_put is NOT an identity
            # no-op (it returns a fresh Array object), and cohorts sharing
            # one device must share one weight pytree.
            if getattr(x, "devices", None) and x.devices() == {device}:
                return x
            return jax.device_put(x, device)

        self._place = (
            (lambda t: jax.tree_util.tree_map(_put_leaf, t))
            if device is not None
            else (lambda t: t)
        )
        # Host->device upload for per-tick inputs: straight to this
        # service's device (committed) rather than via the default device.
        self._upload = (
            (lambda x: jax.device_put(x, device)) if device is not None else jnp.asarray
        )
        self.compute_dtype = compute_dtype or jnp.float32
        if self.compute_dtype != jnp.float32:
            params = sb.cast_params(params, self.compute_dtype)
        params = self._place(params)
        self.params = params
        self.cfg = cfg
        self.tokenizer = tokenizer
        self.S = n_streams
        self.F = update_frames
        self.mem_bucket = mem_bucket
        self.draft_cap = draft_cap
        # Verify-length buckets: the speculative verify pass costs
        # O(1 + draft_len) decoder tokens per stream, but early-segment
        # ticks have short hypotheses — pick the smallest compiled bucket
        # covering this tick's longest draft instead of always paying
        # draft_cap (power-of-2 ladder from 32; each bucket is one XLA
        # program, compiled at warmup).
        self.draft_buckets: list[int] = []
        b = 32
        while b < draft_cap:
            self.draft_buckets.append(b)
            b *= 2
        self.draft_buckets.append(draft_cap)
        # Memory-length ladder for the DECODE phases: per-token
        # cross-attention streams the whole sliced cross cache, so early
        # in a segment the decode reads a fraction of mem_bucket (the
        # draft-bucket idea applied to the memory axis).  Each (draft,
        # mem) pair is one compiled program (warmup covers them).
        self.mem_buckets: list[int] = sorted({
            b for b in (1024, 2048, mem_bucket)
            if sb.ENC_STEP * 2 <= b <= mem_bucket
        } | {mem_bucket})
        self.max_tps = max_tokens_per_second
        self.max_segment_samples = int(max_segment_seconds * 16000)
        self.state = self._place(
            sb.init_batch_state(
                cfg, n_streams, dtype=self.compute_dtype, mem_cap=mem_bucket,
                kv_int8=kv_int8,
            )
        )
        self.slots = [_Slot() for _ in range(n_streams)]
        self.vad = vad
        self.vad_threshold = vad_threshold
        if vad is not None:
            from .pipeline.vad_segmenter import VadSegmenter

            self._vad_state = vad.init_state(n_streams)
            self._vad_probs: dict[int, np.ndarray] = {}
            self._segmenters = [
                VadSegmenter(self._prob_reader(i), threshold=vad_threshold)
                for i in range(n_streams)
            ]
            for seg in self._segmenters:
                seg.start()
            self._seg_consumed = [0] * n_streams

    # -- public API ---------------------------------------------------------

    def open_slot(self, slot: int) -> None:
        s = self.slots[slot]
        self.slots[slot] = _Slot(active=True)
        self.slots[slot].needs_reset = True

    def close_slot(self, slot: int) -> None:
        """Mark end-of-stream: every remaining segment (including audio still
        queued in raw_buffer behind an in-flight force-split) finalizes on
        subsequent updates."""
        s = self.slots[slot]
        if s.active:
            s.eos = True
            if self.vad is None:
                self._fill_segment(slot)
                if s.fed_samples > 0 or len(s.pending) > 0:
                    s.seg_final_queued = True
            else:
                self._segmenters[slot].stop()
                self._drain_segments(slot)
        s.active = False

    def add_audio(self, slot: int, audio: np.ndarray) -> None:
        s = self.slots[slot]
        if not s.active:
            raise ValueError(f"slot {slot} is not open")
        audio = np.asarray(audio, np.float32)
        if self.vad is None:
            self._ingest_always_voice(slot, audio)
        else:
            s.raw_buffer = np.concatenate([s.raw_buffer, audio])

    def update(self, decode_tick: bool = True) -> list[StreamEvent]:
        """One fused device call for all slots; returns transcript events."""
        return self.update_end(self.update_begin(decode_tick=decode_tick))

    def update_begin(self, decode_tick: bool = True) -> "_PendingUpdate":
        """Dispatch this tick's device work WITHOUT waiting for it.

        Returns a pending handle for :meth:`update_end`.  Device-placed
        services (``device=``) use this pair to overlap ticks across mesh
        devices: dispatch every device's program first (XLA dispatch is
        async), then collect — the programs run concurrently, so K
        devices serve K× the streams at one device's per-tick latency
        (``ShardedStreamingService.update_all_parallel``).

        ``decode_tick=False`` runs an INGEST-ONLY tick: frontend +
        windowed encode keep up with the incoming audio, but the
        speculative-verify/greedy decode — the dominant per-update cost —
        is skipped and no events are produced (segment finals wait for
        the next decode tick).  This is the unit of the service-tier
        overload backoff (:class:`ServiceGovernor`): decoding every b-th
        period cuts decode work per audio-second ~b× while ingestion
        stays realtime, the service analog of the reference's 10×
        update-interval stretch (reference: transcriber.py:432-542).
        """
        jnp = self._jnp
        t0 = time.monotonic()
        if self.vad is not None:
            self._run_vad_batched()

        S, F = self.S, self.F
        chunk = np.zeros((S, F * FRAME_LEN), np.float32)
        n_frames = np.zeros(S, np.int32)
        reset = np.zeros(S, bool)
        is_final = np.zeros(S, bool)
        draft = np.full((S, self.draft_cap), self.cfg.eos_id, np.int32)
        draft_len = np.zeros(S, np.int32)
        budget = np.zeros(S, np.int32)
        decode_mask = np.zeros(S, bool)
        finals: list[int] = []

        for i, s in enumerate(self.slots):
            if len(s.pending) == 0 and not s.seg_final_queued and s.fed_samples == 0:
                continue
            nf = min(len(s.pending) // FRAME_LEN, F)
            if s.needs_reset and (nf > 0 or s.seg_final_queued):
                reset[i] = True
                s.needs_reset = False
                s.tokens = []
                s.last_text = ""
                s.feat_total = 0
                s.enc_emitted_host = 0
            if nf > 0:
                chunk[i, : nf * FRAME_LEN] = s.pending[: nf * FRAME_LEN]
                s.pending = s.pending[nf * FRAME_LEN :]
                s.fed_samples += nf * FRAME_LEN
                s.feat_total += nf
                n_frames[i] = nf
            flushed = len(s.pending) < FRAME_LEN
            if s.seg_final_queued and flushed and decode_tick:
                is_final[i] = True
                finals.append(i)
            if decode_tick and s.fed_samples > 0 and (nf > 0 or is_final[i]):
                decode_mask[i] = True
                dl = min(len(s.tokens), self.draft_cap)
                if dl:
                    draft[i, :dl] = s.tokens[:dl]
                draft_len[i] = dl
                budget[i] = min(
                    int(self.max_tps * (s.fed_samples / 16000.0)) + 1,
                    self.cfg.max_seq_len - 2,
                )

        # Exact host mirror of the device stable-frame arithmetic: how many
        # ENC_STEP passes does the worst backlog need?  Steady state = 1;
        # prefill bursts / drains catch up with untimed encode-only calls.
        # The device applies the arithmetic to EVERY stream each pass (not
        # just the ones that fed frames), so the mirror does too.
        lookahead = self.cfg.total_lookahead
        passes = 1
        for i, s in enumerate(self.slots):
            la = 0 if is_final[i] else lookahead
            backlog = max(s.feat_total - la - s.enc_emitted_host, 0)
            passes = max(passes, -(-backlog // sb.ENC_STEP))

        def mirror_pass() -> None:
            for i, s in enumerate(self.slots):
                la = 0 if is_final[i] else lookahead
                stable = max(s.feat_total - la, 0)
                s.enc_emitted_host += min(
                    max(stable - s.enc_emitted_host, 0), sb.ENC_STEP
                )

        from . import profiling

        # One-array control plane: rows (n_frames, reset, is_final,
        # draft_len, budget, decode_mask) — a single host→device transfer
        # (the relay charges per transfer, docs/PERF.md).
        def pack_meta(nf, rs):
            return np.stack([
                nf, rs.astype(np.int32), is_final.astype(np.int32),
                draft_len, budget, decode_mask.astype(np.int32),
            ]).astype(np.int32)

        # Smallest verify bucket covering this tick's longest draft
        # (ingest-only ticks carry no draft: smallest bucket).
        max_dl = int(draft_len.max()) if (S and decode_tick) else 0
        cap = next(b for b in self.draft_buckets if b >= max_dl)
        # Smallest memory bucket covering every slot's segment fill:
        # mem_len never exceeds feat_total (enc_emitted <= feat_total by
        # the stable-frame arithmetic), so the host mirror bounds the
        # decode's cross-cache read exactly.
        max_mem = max((s2.feat_total for s2 in self.slots), default=0)
        dmb = next((b for b in self.mem_buckets if b >= max_mem),
                   self.mem_bucket)
        # Device-resident inputs, uploaded ONCE: burst ticks (prefill /
        # drain) reuse the same zero chunk + follow-up meta across every
        # catch-up pass instead of re-paying per-transfer relay cost.
        chunk_dev = self._upload(chunk)
        meta_dev = self._upload(pack_meta(n_frames, reset))
        if passes > 1:
            zeros_chunk_dev = self._upload(np.zeros_like(chunk))
            zeros_s = np.zeros(S, np.int32)
            meta_follow_dev = self._upload(
                pack_meta(zeros_s, zeros_s.astype(bool))
            )
            draft0_dev = self._upload(draft[:, : self.draft_buckets[0]])
        first = True
        for _ in range(passes - 1):  # encode-only catch-up calls
            with profiling.log_run("service_encode_catchup"):
                out = sb.service_update_meta(
                    self.params, self.cfg, self.state,
                    chunk_dev if first else zeros_chunk_dev,
                    meta_dev if first else meta_follow_dev,
                    draft0_dev,
                    mem_bucket=self.mem_bucket, draft_cap=self.draft_buckets[0],
                    enc_passes=1, decode=False,
                )
            self.state = out.state
            mirror_pass()
            first = False
        with profiling.log_run("service_update", streams=S, draft_bucket=cap,
                               mem_bucket=dmb):
            out = sb.service_update_meta(
                self.params, self.cfg, self.state,
                chunk_dev if first else zeros_chunk_dev,
                meta_dev if first else meta_follow_dev,
                self._upload(draft[:, :cap]),
                mem_bucket=self.mem_bucket, draft_cap=cap,
                enc_passes=1, decode=decode_tick,
                decode_mem_bucket=dmb if decode_tick else None,
            )
        mirror_pass()
        self.state = out.state
        return _PendingUpdate(
            out=out, t0=t0, is_final=is_final, decode_mask=decode_mask
        )

    def update_end(self, pending: "_PendingUpdate") -> list[StreamEvent]:
        """Wait for a dispatched tick and turn its output into events."""
        out, t0 = pending.out, pending.t0
        is_final, decode_mask = pending.is_final, pending.decode_mask
        # ONE host transfer fetches tokens||count and is the device fence
        # (axon: block_until_ready is not).
        packed = np.asarray(out.packed)
        tokens, counts = packed[:, :-1], packed[:, -1]
        latency_ms = (time.monotonic() - t0) * 1000.0

        events: list[StreamEvent] = []
        for i, s in enumerate(self.slots):
            if not decode_mask[i]:
                continue
            toks = [int(t) for t in tokens[i, : int(counts[i])]]
            s.tokens = toks
            text = self.tokenizer.tokens_to_text(toks) if self.tokenizer else str(toks)
            final = bool(is_final[i])
            if final or text != s.last_text:
                events.append(
                    StreamEvent(
                        slot=i, segment_id=s.segment_id, text=text, is_final=final,
                        start_time=s.seg_start_time,
                        end_time=s.seg_start_time + s.fed_samples / 16000.0,
                        latency_ms=latency_ms,
                    )
                )
                s.last_text = text
            if final:
                self._finish_segment(i)
        return events

    def warmup(self) -> float:
        """Compile the update program (and VAD) with representative inputs.

        Returns compile wall seconds.  Call once at load; afterwards every
        update() reuses the cached executable.
        """
        t0 = time.monotonic()
        for i in range(self.S):
            if not self.slots[i].active:
                self.open_slot(i)
        # 2F of audio + close: the flush update carries new frames AND the
        # lookahead release, so its backlog needs an encode-only catch-up
        # call — compiling BOTH program variants (decode=False and =True).
        silence = np.zeros(2 * self.F * FRAME_LEN, np.float32)
        for i in range(self.S):
            self.add_audio(i, silence)
            self.close_slot(i)
        self.update()
        self.update()
        self.update()
        # The warm updates above ran with empty drafts (bucket 0); compile
        # the remaining verify buckets so live ticks never hit a compile.
        import jax.numpy as jnp

        for cap in self.draft_buckets:
            for dmb in self.mem_buckets:
                out = sb.service_update_meta(
                    self.params, self.cfg, self.state,
                    jnp.zeros((self.S, self.F * FRAME_LEN), jnp.float32),
                    jnp.zeros((6, self.S), jnp.int32),
                    jnp.full((self.S, cap), self.cfg.eos_id, jnp.int32),
                    mem_bucket=self.mem_bucket, draft_cap=cap,
                    enc_passes=1, decode=True,
                    decode_mem_bucket=dmb,
                )
                self.state = out.state
        if self.vad is not None:
            import jax.numpy as jnp

            # With VAD, silence produces no voiced segments, so the warm
            # updates above never hit (a) the per-tick VAD hop buckets or
            # (b) the encode-only catch-up variant that voiced prefill
            # bursts need.  Compile both explicitly so the first live
            # updates don't pay Mosaic/XLA compiles.
            tick_hops = max(self.F * FRAME_LEN // HOP, 1)
            hb = 1
            while hb < tick_hops:
                hb *= 2
            state = self.vad.init_state(self.S)
            for h in sorted({hb, 2 * hb}):
                self.vad.predict_hops_masked(
                    jnp.zeros((self.S, h, HOP), jnp.float32),
                    jnp.zeros((self.S,), jnp.int32),
                    state,
                )
            out = sb.service_update_meta(
                self.params, self.cfg, self.state,
                jnp.zeros((self.S, self.F * FRAME_LEN), jnp.float32),
                jnp.zeros((6, self.S), jnp.int32),
                jnp.full((self.S, self.draft_buckets[0]), self.cfg.eos_id, jnp.int32),
                mem_bucket=self.mem_bucket, draft_cap=self.draft_buckets[0],
                enc_passes=1, decode=False,
            )
            self.state = out.state
        # Reset everything after the warm pass.
        self.state = self._place(
            sb.init_batch_state(
                self.cfg, self.S, dtype=self.compute_dtype, mem_cap=self.mem_bucket,
                kv_int8=self.state.k_self_scale is not None,
            )
        )
        for i in range(self.S):
            self.slots[i] = _Slot(active=True)
        if self.vad is not None:
            self._vad_state = self.vad.init_state(self.S)
            for seg in self._segmenters:
                seg.start()
            self._seg_consumed = [0] * self.S
        return time.monotonic() - t0

    # -- failover snapshot/restore -------------------------------------------

    def snapshot(self) -> dict:
        """Host-serializable snapshot of every live stream: the device
        state (frontend carries, windowed-encoder memory, cross/self KV,
        cursors) plus each slot's host feed state.  Restoring into a
        fresh process/chip resumes mid-segment with identical
        transcripts (tests/test_sharded_service.py) — the serving
        extension of the reference's incremental-state design
        (moonshine-streaming-model.h:35-70): the state IS the
        checkpoint.  VAD-mode services snapshot between segments only
        (segmenter hysteresis is host-transient); always-voice mode
        snapshots anywhere.
        """
        import copy

        import jax

        if self.vad is not None:
            for i, s in enumerate(self.slots):
                if (
                    s.fed_samples
                    or len(s.pending)
                    or len(s.raw_buffer)
                    or self._seg_consumed[i] < len(self._segmenters[i].segments)
                ):
                    raise ValueError(
                        f"slot {i} mid-segment: VAD-mode snapshots require "
                        "quiescent slots (the segmenter's hysteresis state "
                        "is host-transient and is reset on restore)"
                    )
        # np.array (not asarray): update() DONATES the state buffers, so a
        # zero-copy view would mutate under a source that keeps serving.
        return {
            "device_state": jax.tree_util.tree_map(
                lambda x: np.array(x), self.state
            ),
            "slots": copy.deepcopy(self.slots),
        }

    def restore(self, snap: dict) -> None:
        """Install a :meth:`snapshot` into this (same-config) service.

        Any prior state of THIS service is discarded, including VAD-side
        machinery (segmenters, hop state): a warm standby that served
        other traffic must not leak its old segment audio into the
        restored streams.  jnp.array (not asarray) copies the snapshot's
        host buffers so the donated update cannot corrupt the snapshot
        for a second restore.
        """
        import copy

        import jax

        if len(snap["slots"]) != self.S:
            raise ValueError(
                f"snapshot has {len(snap['slots'])} slots, service has {self.S}"
            )
        jnp = self._jnp
        self.state = jax.tree_util.tree_map(
            lambda x: self._place(jnp.array(x)), snap["device_state"]
        )
        self.slots = copy.deepcopy(snap["slots"])
        if self.vad is not None:
            from .pipeline.vad_segmenter import VadSegmenter

            self._vad_state = self.vad.init_state(self.S)
            self._vad_probs = {}
            self._segmenters = [
                VadSegmenter(self._prob_reader(i), threshold=self.vad_threshold)
                for i in range(self.S)
            ]
            for seg in self._segmenters:
                seg.start()
            self._seg_consumed = [0] * self.S

    # -- always-voice segmentation (reference vad_threshold=0 contract) -----

    def _ingest_always_voice(self, slot: int, audio: np.ndarray) -> None:
        s = self.slots[slot]
        s.raw_buffer = np.concatenate([s.raw_buffer, audio])
        self._fill_segment(slot)

    def _fill_segment(self, slot: int) -> None:
        """Route buffered raw audio into the current segment up to the
        force-split cap (always-voice mode)."""
        s = self.slots[slot]
        if s.seg_final_queued or len(s.raw_buffer) == 0:
            return
        if s.fed_samples == 0 and len(s.pending) == 0:
            s.seg_start_time = s.stream_samples / 16000.0
        room = self.max_segment_samples - (s.fed_samples + len(s.pending))
        take = min(len(s.raw_buffer), max(room, 0))
        s.pending = np.concatenate([s.pending, s.raw_buffer[:take]])
        s.stream_samples += take
        s.raw_buffer = s.raw_buffer[take:]
        if len(s.raw_buffer) > 0:  # segment full: force-split
            s.seg_final_queued = True
        elif s.eos and (s.fed_samples > 0 or len(s.pending) > 0):
            # Stream closed: nothing more is coming, flush this segment too.
            s.seg_final_queued = True

    def _finish_segment(self, slot: int) -> None:
        s = self.slots[slot]
        s.segment_id += 1
        s.fed_samples = 0
        s.seg_final_queued = False
        s.needs_reset = True
        s.tokens = []
        s.last_text = ""
        if self.vad is None:
            self._fill_segment(slot)

    # -- VAD path ------------------------------------------------------------

    def _prob_reader(self, slot: int):
        def fn(hops: np.ndarray) -> np.ndarray:
            probs = self._vad_probs.pop(slot)
            assert len(probs) == len(hops), (len(probs), len(hops))
            return probs

        return fn

    def _run_vad_batched(self) -> None:
        """One batched TinyVad call for all slots' new audio, then advance
        each slot's segmenter and pull out fresh segment samples."""
        import jax.numpy as jnp

        counts = [len(self.slots[i].raw_buffer) // HOP for i in range(self.S)]
        H = max(counts, default=0)
        if H == 0:
            return
        # Bucket the hop axis so only O(log) VAD programs compile.
        Hb = 1
        while Hb < H:
            Hb *= 2
        hops = np.zeros((self.S, Hb, HOP), np.float32)
        for i, c in enumerate(counts):
            if c:
                hops[i, :c] = self.slots[i].raw_buffer[: c * HOP].reshape(c, HOP)
        probs, self._vad_state = self.vad.predict_hops_masked(
            jnp.asarray(hops), jnp.asarray(np.asarray(counts, np.int32)), self._vad_state
        )
        probs = np.asarray(probs)
        for i, c in enumerate(counts):
            if c == 0:
                continue
            s = self.slots[i]
            audio = s.raw_buffer[: c * HOP]
            s.raw_buffer = s.raw_buffer[c * HOP :]
            self._vad_probs[i] = probs[i, :c]
            self._segmenters[i].process_audio(audio)
            s.stream_samples += len(audio)
            self._drain_segments(i)

    def _drain_segments(self, slot: int) -> None:
        """Move new/updated segmenter output into the slot's feed state."""
        s = self.slots[slot]
        segs = self._segmenters[slot].segments
        k = self._seg_consumed[slot]
        if k >= len(segs):
            return
        seg = segs[k]
        new_total = len(seg.audio_data)
        already = s.fed_samples + len(s.pending)
        if new_total > already:
            s.pending = np.concatenate(
                [s.pending, seg.audio_data[already:new_total]]
            )
            if already == 0:
                s.seg_start_time = seg.start_time
        if seg.is_complete:
            s.seg_final_queued = True
            self._seg_consumed[slot] += 1
            seg.clear_audio()


class ShardedStreamingService:
    """``n_streams`` live streams as ``n_cohorts`` staggered device cohorts.

    One fused update program's wall time grows with its stream count (the
    verify pass and greedy continuation are per-stream serial token work),
    so a single 64-stream program pays ~2x the per-update latency of a
    32-stream one.  Sharding the slots into K cohorts and ticking ONE
    cohort per :meth:`update` call keeps every stream's update latency at
    the S/K-stream level while the chip serves all ``n_streams``: the
    caller ticks cohorts round-robin at ``period / n_cohorts`` intervals
    (time-division multiplexing of the chip, the scheduling analog of the
    reference's thread-per-stream multiplexing over one model instance,
    core/transcriber.h:77-110).

    All cohorts share one weight pytree (params are cast once here; the
    per-cohort ``cast_params`` is then a no-op returning the same arrays)
    and — because :func:`models.streaming_batch.service_update` is a
    module-level ``jax.jit`` keyed on shapes — one set of compiled
    executables; only the per-cohort KV state is distinct, so HBM cost
    equals a single ``n_streams``-slot service.

    API mirrors :class:`StreamingService` with GLOBAL slot ids in
    [0, n_streams); cohort ``c`` owns the contiguous range
    ``[c*S/K, (c+1)*S/K)``.  :meth:`update` ticks the next cohort and
    returns its events (slot ids re-mapped to global); :meth:`update_all`
    ticks every cohort once.

    **Multi-device stream-DP** (``devices=``): cohort ``c`` is pinned to
    ``devices[c % len(devices)]`` — its weights, KV state and update
    programs live on that mesh device.  Streams never exchange state, so
    the hot path has ZERO collectives and scaling is bounded only by
    host dispatch; :meth:`update_all_parallel` dispatches every device's
    program before collecting any, so the per-device programs run
    concurrently (weak scaling measured in docs/SCALING.md via
    scripts/weak_scaling.py).  This is the TPU-native serving analog of
    the reference's thread-per-stream multiplexing, lifted from threads
    on one CPU to programs on a device mesh.
    """

    def __init__(
        self,
        params,
        cfg: StreamingConfig,
        tokenizer: BinTokenizer | None,
        n_streams: int,
        n_cohorts: int = 2,
        compute_dtype=None,
        devices=None,  # list[jax.Device]: cohort c -> devices[c % len]
        **kw,
    ):
        if n_streams % n_cohorts != 0:
            raise ValueError(
                f"n_streams={n_streams} not divisible by n_cohorts={n_cohorts}"
            )
        import jax
        import jax.numpy as jnp

        dtype = compute_dtype or jnp.float32
        if dtype != jnp.float32:
            # Cast ONCE so the K cohorts share one weight pytree in HBM
            # (StreamingService's own cast is then a same-dtype no-op).
            params = sb.cast_params(params, dtype)
        self.S = n_streams
        self.K = n_cohorts
        self.per_cohort = n_streams // n_cohorts
        self.devices = list(devices) if devices is not None else None
        if self.devices:
            # One weight copy per DISTINCT device (cohorts on the same
            # device share it — StreamingService's device_put of an
            # already-resident pytree is a no-op returning the same arrays).
            per_dev = {
                d: jax.device_put(params, d)
                for d in dict.fromkeys(self.devices)
            }
            cohort_params = [
                per_dev[self.devices[c % len(self.devices)]]
                for c in range(n_cohorts)
            ]
            cohort_dev = [
                self.devices[c % len(self.devices)] for c in range(n_cohorts)
            ]
        else:
            cohort_params = [params] * n_cohorts
            cohort_dev = [None] * n_cohorts
        self.cohorts = [
            StreamingService(
                cohort_params[c], cfg, tokenizer, self.per_cohort,
                compute_dtype=dtype, device=cohort_dev[c], **kw,
            )
            for c in range(n_cohorts)
        ]
        self._next = 0

    def _route(self, slot: int) -> tuple[StreamingService, int]:
        if not 0 <= slot < self.S:
            raise ValueError(f"slot {slot} out of range [0, {self.S})")
        return self.cohorts[slot // self.per_cohort], slot % self.per_cohort

    @property
    def slots(self) -> list[_Slot]:
        """Flat global-slot-indexed view over the cohorts' slot states
        (read-only introspection, e.g. the server's busy check)."""
        return [s for svc in self.cohorts for s in svc.slots]

    def open_slot(self, slot: int) -> None:
        svc, local = self._route(slot)
        svc.open_slot(local)

    def close_slot(self, slot: int) -> None:
        svc, local = self._route(slot)
        svc.close_slot(local)

    def add_audio(self, slot: int, audio: np.ndarray) -> None:
        svc, local = self._route(slot)
        svc.add_audio(local, audio)

    def cohort_of(self, slot: int) -> int:
        return slot // self.per_cohort

    def update(
        self, cohort: int | None = None, decode_tick: bool = True
    ) -> list[StreamEvent]:
        """Tick ONE cohort (round-robin unless ``cohort`` is given).

        Call this every ``update_period / n_cohorts`` seconds; each stream
        then gets updates at the full period with per-update latency of an
        S/K-stream program.
        """
        c = self._next if cohort is None else cohort
        if cohort is None:
            self._next = (c + 1) % self.K
        base = c * self.per_cohort
        return [
            replace(e, slot=e.slot + base)
            for e in self.cohorts[c].update(decode_tick=decode_tick)
        ]

    def update_all(self) -> list[StreamEvent]:
        """Tick every cohort once (one full update period)."""
        events: list[StreamEvent] = []
        for c in range(self.K):
            events.extend(self.update(cohort=c))
        return events

    def update_all_parallel(self, decode_tick: bool = True) -> list[StreamEvent]:
        """Tick every cohort once, overlapping device execution.

        Phase 1 dispatches each cohort's update program (async XLA
        dispatch); phase 2 collects.  With cohorts on K distinct devices
        the K programs run concurrently, so the wall time of one full
        period approaches a single cohort's tick instead of K× it —
        the multi-device serving mode's hot loop.  Event order matches
        :meth:`update_all` (cohort-major).
        """
        pendings = [
            svc.update_begin(decode_tick=decode_tick) for svc in self.cohorts
        ]
        events: list[StreamEvent] = []
        for c, (svc, p) in enumerate(zip(self.cohorts, pendings)):
            base = c * self.per_cohort
            events.extend(
                replace(e, slot=e.slot + base) for e in svc.update_end(p)
            )
        return events

    def update_live(self, live_slots) -> list[StreamEvent]:
        """Tick the next round-robin cohort that owns a slot in
        ``live_slots``; skip (and don't dispatch device programs for)
        cohorts with no live slots.  Returns [] when none are live."""
        live = {self.cohort_of(s) for s in live_slots}
        for _ in range(self.K):
            c = self._next
            self._next = (c + 1) % self.K
            if c in live:
                return self.update(cohort=c)
        return []

    def warmup(self) -> float:
        """Compile once (cohort 0); siblings reuse the jit cache."""
        return sum(svc.warmup() for svc in self.cohorts)

    def snapshot(self) -> dict:
        """Per-cohort :meth:`StreamingService.snapshot` bundle (plus the
        round-robin cursor so restored ticking resumes where it left off)."""
        return {
            "cohorts": [svc.snapshot() for svc in self.cohorts],
            "next_cohort": self._next,
        }

    def restore(self, snap: dict) -> None:
        if len(snap["cohorts"]) != self.K:
            raise ValueError(
                f"snapshot has {len(snap['cohorts'])} cohorts, service has {self.K}"
            )
        for svc, s in zip(self.cohorts, snap["cohorts"]):
            svc.restore(s)
        self._next = snap.get("next_cohort", 0) % self.K


class ServiceGovernor:
    """Service-tier overload policy: decode backoff + admission control.

    The reference handles an overloaded machine by stretching a stream's
    update interval up to 10x so it batches instead of falling behind
    (reference: language-bindings/python transcriber.py:432-542 and
    README.md:367).  At the service tier the same policy is applied to
    the DECODE cadence: ingestion (frontend + windowed encode) must stay
    realtime no matter what, but the speculative-verify/greedy decode —
    the dominant per-tick cost, and the part that explodes ~5x under a
    hypothesis-churn storm (docs/PERF.md churn floor) — can legitimately
    run every b-th period at the price of transcript latency.

    Protocol: call :meth:`decode_this_tick` once per update period and
    pass its answer as ``decode_tick`` to the service's update; report
    the observed tick wall time back via :meth:`record`.  The governor
    maintains an EWMA of decode-tick cost and picks the smallest backoff
    ``b`` such that the per-period budget covers one decode tick plus
    (b-1) ingest ticks:

        ingest_ewma + (decode_ewma - ingest_ewma) / b  <=  margin * budget

    b rises instantly under overload and decays one step per recovered
    period (slow recovery avoids oscillation).  :meth:`admit` refuses
    new streams when even ``max_backoff`` cannot fit the budget — the
    admission-control tier (shed offered load, never the live streams).
    """

    def __init__(
        self,
        update_period_s: float,
        n_cohorts: int = 1,
        max_backoff: int = 10,
        margin: float = 0.85,
        alpha: float = 0.25,
    ):
        if max_backoff < 1:
            raise ValueError("max_backoff must be >= 1")
        self.budget_ms = update_period_s * 1000.0 / max(n_cohorts, 1)
        self.max_backoff = max_backoff
        self.margin = margin
        self.alpha = alpha
        self.backoff = 1
        self._tick = 0
        self._decode_ewma: float | None = None
        self._ingest_ewma: float | None = None
        self._last_was_decode = True

    # -- per-period protocol -------------------------------------------------

    def decode_this_tick(self) -> bool:
        """True when this period's tick should decode (every b-th)."""
        decode = self._tick % self.backoff == 0
        self._tick += 1
        self._last_was_decode = decode
        return decode

    def record(self, wall_ms: float) -> None:
        """Report the wall time of the tick just executed; adapts b."""
        if self._last_was_decode:
            e = self._decode_ewma
            self._decode_ewma = (
                wall_ms if e is None else e + self.alpha * (wall_ms - e)
            )
        else:
            e = self._ingest_ewma
            self._ingest_ewma = (
                wall_ms if e is None else e + self.alpha * (wall_ms - e)
            )
        self.backoff = self._pick_backoff()

    # -- queries --------------------------------------------------------------

    def projected_tick_ms(self, b: int | None = None) -> float:
        """Average per-period cost at backoff ``b`` under current EWMAs."""
        b = self.backoff if b is None else b
        dec = self._decode_ewma
        if dec is None:
            return 0.0
        ing = self._ingest_ewma if self._ingest_ewma is not None else dec * 0.3
        ing = min(ing, dec)
        return ing + (dec - ing) / b

    def overloaded(self) -> bool:
        return self.projected_tick_ms(1) > self.margin * self.budget_ms

    def admit(self) -> bool:
        """False when even max_backoff cannot keep the service realtime —
        refuse NEW streams rather than degrade live ones further."""
        return self.projected_tick_ms(self.max_backoff) <= self.margin * self.budget_ms

    def _pick_backoff(self) -> int:
        if self._decode_ewma is None:
            return 1
        target = self.margin * self.budget_ms
        for b in range(1, self.max_backoff + 1):
            if self.projected_tick_ms(b) <= target:
                # Decay: recover at most one step per period.
                return min(b, max(self.backoff - 1, 1)) if b < self.backoff else b
        return self.max_backoff

    def stats(self) -> dict:
        return {
            "backoff": self.backoff,
            "decode_ewma_ms": self._decode_ewma,
            "ingest_ewma_ms": self._ingest_ewma,
            "budget_ms": self.budget_ms,
            "overloaded": self.overloaded(),
            "admitting": self.admit(),
        }
