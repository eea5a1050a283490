"""ShardedStreamingService: staggered-cohort scheduling correctness.

Slots are computationally independent inside a service_update program
(masked per-stream vmap), so splitting N streams into K cohorts must not
change any stream's transcript — only the per-update latency profile
(docs/PERF.md).  These tests pin that equivalence plus the slot routing
and the shared-weights invariant.
"""

from __future__ import annotations

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from moonshine_tpu.core.config import StreamingConfig
from moonshine_tpu.models import streaming as ms
from moonshine_tpu.serving import ShardedStreamingService, StreamingService

CFG = StreamingConfig(
    encoder_dim=64, decoder_dim=64, depth=2, nheads=4, head_dim=16,
    vocab_size=96, d_model_frontend=32, c1=48, c2=64, max_seq_len=64,
    encoder_depth=2,
)

S, K = 4, 2
SEG_SECONDS = 1.0


def _params():
    return ms.init_params(CFG, jax.random.PRNGKey(7))


def _audio(slot: int) -> np.ndarray:
    rng = np.random.RandomState(100 + slot)
    return (rng.randn(int(16000 * 2.3)) * 0.1).astype(np.float32)


def _run(svc, tick) -> list[tuple[int, int, str, bool]]:
    """Feed every slot the same per-slot audio, close, drain; return the
    (slot, segment_id, text, is_final) event log sorted per slot.

    Drains with a fixed tick count (no-event ticks are NOT "done": updates
    whose text is unchanged emit nothing while feeding continues): 2.3 s /
    (16 frames * 80 samples) = 29 feed ticks per segment stream + finals.
    """
    for i in range(S):
        svc.open_slot(i)
        svc.add_audio(i, _audio(i))
        svc.close_slot(i)
    log: list[tuple[int, int, str, bool]] = []
    for _ in range(40):
        log.extend(
            (e.slot, e.segment_id, e.text, e.is_final) for e in tick()
        )
    by_slot = {i: [t for t in log if t[0] == i] for i in range(S)}
    return [t for i in range(S) for t in by_slot[i]]


def test_sharded_matches_unsharded_transcripts():
    params = _params()
    plain = StreamingService(
        params, CFG, tokenizer=None, n_streams=S,
        update_frames=16, mem_bucket=256, draft_cap=16,
        max_segment_seconds=SEG_SECONDS,
    )
    sharded = ShardedStreamingService(
        params, CFG, tokenizer=None, n_streams=S, n_cohorts=K,
        update_frames=16, mem_bucket=256, draft_cap=16,
        max_segment_seconds=SEG_SECONDS,
    )
    ref = _run(plain, plain.update)
    got = _run(sharded, sharded.update_all)
    assert ref == got
    # Real segmentation happened: 2.3 s audio / 1 s force-split cap =>
    # exactly 3 final segments per slot (1.0 + 1.0 + 0.3 s).
    finals = [t for t in ref if t[3]]
    assert len(finals) == 3 * S


def test_round_robin_update_covers_all_cohorts():
    params = _params()
    sharded = ShardedStreamingService(
        params, CFG, tokenizer=None, n_streams=S, n_cohorts=K,
        update_frames=16, mem_bucket=256, draft_cap=16,
        max_segment_seconds=SEG_SECONDS,
    )
    # K single-cohort ticks == one update_all; slot ids must be global.
    for i in range(S):
        sharded.open_slot(i)
        sharded.add_audio(i, _audio(i))
    seen: set[int] = set()
    for _ in range(K):
        for e in sharded.update():
            seen.add(e.slot)
    assert seen == set(range(S))


def test_cohorts_share_cast_weight_buffers():
    params = _params()
    sharded = ShardedStreamingService(
        params, CFG, tokenizer=None, n_streams=S, n_cohorts=K,
        update_frames=16, mem_bucket=256, draft_cap=16,
        compute_dtype=jnp.bfloat16,
    )
    a = jax.tree.leaves(sharded.cohorts[0].params)
    b = jax.tree.leaves(sharded.cohorts[1].params)
    assert all(x is y for x, y in zip(a, b))


def test_bad_shard_args_raise():
    params = _params()
    with pytest.raises(ValueError, match="divisible"):
        ShardedStreamingService(params, CFG, None, n_streams=5, n_cohorts=2)
    svc = ShardedStreamingService(
        params, CFG, None, n_streams=S, n_cohorts=K,
        update_frames=16, mem_bucket=256, draft_cap=16,
    )
    with pytest.raises(ValueError, match="out of range"):
        svc.open_slot(S)


def test_update_live_skips_empty_cohorts(monkeypatch):
    params = _params()
    svc = ShardedStreamingService(
        params, CFG, tokenizer=None, n_streams=S, n_cohorts=K,
        update_frames=16, mem_bucket=256, draft_cap=16,
        max_segment_seconds=SEG_SECONDS,
    )
    calls = []
    for c, cohort in enumerate(svc.cohorts):
        orig = cohort.update
        monkeypatch.setattr(
            cohort, "update",
            (lambda c=c, orig=orig, **kw: (calls.append(c), orig(**kw))[1]),
        )
    # Live slots only in cohort 1 (slots 2,3).
    svc.open_slot(2)
    svc.add_audio(2, _audio(2))
    for _ in range(4):
        svc.update_live([2])
    assert calls and set(calls) == {1}
    # No live slots at all: no device program runs.
    calls.clear()
    assert svc.update_live([]) == []
    assert calls == []


def test_w8a8_scales_stay_f32_under_bf16_cast():
    """cast_params must not downcast exec-quantization scales: the int8
    dequant arithmetic the w8a8 tests validate uses f32 per-channel
    scales (code-review finding)."""
    from moonshine_tpu.models import streaming_batch as sb
    from moonshine_tpu.quant import quantize_tree_exec

    params = quantize_tree_exec(_params())
    cast = sb.cast_params(params, jnp.bfloat16)

    def walk(node, path=""):
        if isinstance(node, dict):
            for k, v in node.items():
                yield from walk(v, path + "/" + k)
        elif hasattr(node, "dtype"):
            yield path, node

    saw_scale = saw_bf16 = False
    for path, leaf in walk(cast):
        if path.endswith("/w_scale"):
            assert leaf.dtype == jnp.float32, path
            saw_scale = True
        if path.endswith("/w_q"):
            assert leaf.dtype == jnp.int8, path
        if leaf.dtype == jnp.bfloat16:
            saw_bf16 = True
    assert saw_scale and saw_bf16


def test_snapshot_restore_mid_stream_failover():
    """A service snapshotted mid-segment and restored into a FRESH
    service (new process/chip analog) must continue with transcripts
    identical to an uninterrupted run — live-stream failover/migration
    (the serving extension of the reference's incremental-state design)."""
    params = _params()
    kw = dict(update_frames=16, mem_bucket=256, draft_cap=16,
              max_segment_seconds=SEG_SECONDS)

    def feed_phase1(svc):
        for i in range(S):
            svc.open_slot(i)
            svc.add_audio(i, _audio(i)[:16000])  # first 1.0 s
        out = []
        for _ in range(10):  # mid-segment: 10*16*80 = 12800 of 16000 fed
            out.extend((e.slot, e.segment_id, e.text, e.is_final)
                       for e in svc.update())
        return out

    def feed_phase2(svc):
        for i in range(S):
            svc.add_audio(i, _audio(i)[16000:24000])
            svc.close_slot(i)
        out = []
        for _ in range(30):
            out.extend((e.slot, e.segment_id, e.text, e.is_final)
                       for e in svc.update())
        return out

    # Uninterrupted reference run.
    ref_svc = StreamingService(params, CFG, tokenizer=None, n_streams=S, **kw)
    ref = feed_phase1(ref_svc) + feed_phase2(ref_svc)

    # Interrupted run: snapshot mid-segment, restore into a fresh service.
    a = StreamingService(params, CFG, tokenizer=None, n_streams=S, **kw)
    got1 = feed_phase1(a)
    snap = a.snapshot()
    del a
    b = StreamingService(params, CFG, tokenizer=None, n_streams=S, **kw)
    b.restore(snap)
    got = got1 + feed_phase2(b)
    assert got == ref
    assert any(t[3] for t in ref)  # the run really finalized segments


def test_sharded_snapshot_restore():
    params = _params()
    kw = dict(update_frames=16, mem_bucket=256, draft_cap=16,
              max_segment_seconds=SEG_SECONDS)
    a = ShardedStreamingService(params, CFG, tokenizer=None, n_streams=S,
                                n_cohorts=K, **kw)
    for i in range(S):
        a.open_slot(i)
        a.add_audio(i, _audio(i)[:8000])
    for _ in range(4):
        a.update_all()
    snap = a.snapshot()
    b = ShardedStreamingService(params, CFG, tokenizer=None, n_streams=S,
                                n_cohorts=K, **kw)
    b.restore(snap)
    # Both continue identically from the restore point.
    ev_a = [(e.slot, e.text) for _ in range(4) for e in a.update_all()]
    ev_b = [(e.slot, e.text) for _ in range(4) for e in b.update_all()]
    assert ev_a == ev_b


def test_sharded_restore_preserves_round_robin_cursor():
    params = _params()
    kw = dict(update_frames=16, mem_bucket=256, draft_cap=16,
              max_segment_seconds=SEG_SECONDS)
    a = ShardedStreamingService(params, CFG, tokenizer=None, n_streams=S,
                                n_cohorts=K, **kw)
    a.update()  # advance the round-robin cursor to cohort 1
    snap = a.snapshot()
    b = ShardedStreamingService(params, CFG, tokenizer=None, n_streams=S,
                                n_cohorts=K, **kw)
    b.restore(snap)
    assert b._next == a._next == 1


def test_restore_into_warm_vad_standby_discards_its_segments():
    """A standby that served OTHER traffic must not leak its old VAD
    segments into restored streams (code-review finding)."""
    pytest.importorskip("pathlib")
    import pathlib

    onnx = "/root/reference/micro/models/tinyvad_cnn_speech_mel.onnx"
    if not pathlib.Path(onnx).exists():
        pytest.skip("reference TinyVadCNN onnx not available")
    from moonshine_tpu.models.vad import TinyVad

    vad = TinyVad.from_onnx(onnx)
    kw = dict(update_frames=16, mem_bucket=256, draft_cap=16,
              max_segment_seconds=SEG_SECONDS, vad=vad, vad_threshold=0.1)
    params = _params()

    # Standby serves loud traffic (voiced segments accumulate).
    standby = StreamingService(params, CFG, tokenizer=None, n_streams=S, **kw)
    rng = np.random.RandomState(0)
    for i in range(S):
        standby.open_slot(i)
        standby.add_audio(i, (rng.randn(16000) * 0.5).astype(np.float32))
    for _ in range(3):
        standby.update()

    # Fresh quiescent source: snapshot allowed (all slots idle).
    source = StreamingService(params, CFG, tokenizer=None, n_streams=S, **kw)
    for i in range(S):
        source.open_slot(i)
    snap = source.snapshot()

    standby.restore(snap)
    # The standby's old segmenter history must be gone: updates with no
    # new audio produce no events and no leaked feeds.
    for _ in range(4):
        assert standby.update() == []
    for s in standby.slots:
        assert s.fed_samples == 0 and len(s.pending) == 0


# -- multi-device stream-DP (virtual 8-device CPU mesh, conftest) ----------


def test_device_placed_matches_unplaced_transcripts():
    """Cohorts pinned to distinct mesh devices must produce transcripts
    identical to the single-device service — the stream-DP serving mode's
    correctness contract (zero hot-path collectives: per-stream state is
    private, so placement cannot change any result)."""
    devs = jax.devices()
    if len(devs) < 4:
        pytest.skip("needs the virtual multi-device CPU mesh")
    params = _params()
    kw = dict(update_frames=16, mem_bucket=256, draft_cap=16,
              max_segment_seconds=SEG_SECONDS)
    plain = StreamingService(params, CFG, tokenizer=None, n_streams=S, **kw)
    placed = ShardedStreamingService(
        params, CFG, tokenizer=None, n_streams=S, n_cohorts=4,
        devices=devs[:4], **kw,
    )
    ref = _run(plain, plain.update)
    got = _run(placed, placed.update_all_parallel)
    assert ref == got
    # The cohorts really live on distinct devices.
    owners = {
        next(iter(jax.tree.leaves(svc.state)[0].devices()))
        for svc in placed.cohorts
    }
    assert len(owners) == 4


def test_device_placed_snapshot_restores_across_devices():
    """A snapshot taken from cohorts on devices [0,1] restores into a
    service on devices [2,3] and continues identically — failover across
    mesh devices."""
    devs = jax.devices()
    if len(devs) < 4:
        pytest.skip("needs the virtual multi-device CPU mesh")
    params = _params()
    kw = dict(update_frames=16, mem_bucket=256, draft_cap=16,
              max_segment_seconds=SEG_SECONDS)
    a = ShardedStreamingService(params, CFG, tokenizer=None, n_streams=S,
                                n_cohorts=K, devices=devs[:2], **kw)
    for i in range(S):
        a.open_slot(i)
        a.add_audio(i, _audio(i)[:8000])
    for _ in range(4):
        a.update_all_parallel()
    snap = a.snapshot()
    b = ShardedStreamingService(params, CFG, tokenizer=None, n_streams=S,
                                n_cohorts=K, devices=devs[2:4], **kw)
    b.restore(snap)
    ev_a = [(e.slot, e.text) for _ in range(4) for e in a.update_all_parallel()]
    ev_b = [(e.slot, e.text) for _ in range(4) for e in b.update_all_parallel()]
    assert ev_a == ev_b
    owners = {
        next(iter(jax.tree.leaves(svc.state)[0].devices()))
        for svc in b.cohorts
    }
    assert owners == set(devs[2:4])


def test_same_device_cohorts_share_weight_copy():
    """Two cohorts mapped to ONE device share a single weight pytree
    (no duplicate HBM); cohorts on different devices hold per-device
    copies."""
    devs = jax.devices()
    if len(devs) < 2:
        pytest.skip("needs >=2 devices")
    params = _params()
    kw = dict(update_frames=16, mem_bucket=256, draft_cap=16)
    svc = ShardedStreamingService(
        params, CFG, tokenizer=None, n_streams=8, n_cohorts=4,
        devices=[devs[0], devs[0], devs[1], devs[1]], **kw,
    )
    a, b, c, d = (jax.tree.leaves(s.params) for s in svc.cohorts)
    assert all(x is y for x, y in zip(a, b))
    assert all(x is y for x, y in zip(c, d))
    assert not any(x is y for x, y in zip(a, c))
