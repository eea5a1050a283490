"""ServiceGovernor: decode-backoff + admission under overload.

The service-tier analog of the reference's 10x update-interval stretch
(reference: transcriber.py:432-542): ingest ticks stay realtime, decode
ticks back off, new streams are refused when even max backoff cannot fit
the budget.
"""

from __future__ import annotations

import numpy as np

from moonshine_tpu.core.config import StreamingConfig
from moonshine_tpu.models import streaming as ms
from moonshine_tpu.serving import ServiceGovernor, StreamingService

import jax


def test_backoff_rises_under_overload_and_recovers():
    g = ServiceGovernor(update_period_s=0.64, n_cohorts=1, margin=0.85)
    assert g.budget_ms == 640.0
    # Healthy: decode ticks fit the budget easily.
    for _ in range(5):
        assert g.decode_this_tick() is True
        g.record(100.0)
    assert g.backoff == 1 and not g.overloaded() and g.admit()
    # Overload: decode ticks cost 3x the budget -> b rises so the mix of
    # 1 decode + (b-1) cheap ingest ticks fits again.
    for _ in range(20):
        decode = g.decode_this_tick()
        g.record(2000.0 if decode else 80.0)
    assert g.backoff > 1
    assert g.projected_tick_ms() <= 0.85 * g.budget_ms + 1e-6
    assert g.overloaded()  # b=1 would not fit
    assert g.admit()  # but the backed-off service is keeping up
    # Recovery: decode cost drops back; b decays one step per period.
    seen = [g.backoff]
    for _ in range(60):
        g.decode_this_tick()
        g.record(100.0)
        seen.append(g.backoff)
    assert g.backoff == 1
    assert all(a - b <= 1 for a, b in zip(seen, seen[1:]))  # monotone-ish decay


def test_admission_refused_when_max_backoff_insufficient():
    g = ServiceGovernor(update_period_s=0.64, n_cohorts=1, max_backoff=10)
    for _ in range(10):
        decode = g.decode_this_tick()
        # ingest ticks ALONE blow the budget: no backoff can help.
        g.record(5000.0 if decode else 900.0)
    assert g.backoff == 10
    assert not g.admit()


def test_decode_cadence_matches_backoff():
    g = ServiceGovernor(update_period_s=0.64)
    g.backoff = 3
    got = [g.decode_this_tick() for _ in range(9)]
    assert got == [True, False, False] * 3


CFG = StreamingConfig(
    encoder_dim=64, decoder_dim=64, depth=2, nheads=4, head_dim=16,
    vocab_size=96, d_model_frontend=32, c1=48, c2=64, max_seq_len=64,
    encoder_depth=2,
)


def test_ingest_only_ticks_defer_decode_but_preserve_transcripts():
    """A service driven at backoff b=2 (decode every other tick) must end
    with the same final transcripts as one decoded every tick — encode-only
    ticks keep ingestion realtime and never lose audio."""
    params = ms.init_params(CFG, jax.random.PRNGKey(7))
    kw = dict(update_frames=16, mem_bucket=256, draft_cap=16,
              max_segment_seconds=1.0)
    rng = np.random.RandomState(3)
    audio = (rng.randn(int(16000 * 1.7)) * 0.1).astype(np.float32)

    def run(decode_every: int):
        svc = StreamingService(params, CFG, tokenizer=None, n_streams=2, **kw)
        for i in range(2):
            svc.open_slot(i)
            svc.add_audio(i, audio)
            svc.close_slot(i)
        finals = []
        for t in range(60):
            evs = svc.update(decode_tick=(t % decode_every == 0))
            finals.extend((e.slot, e.segment_id, e.text) for e in evs if e.is_final)
        return finals

    assert run(1) == run(2)
    assert len(run(2)) == 4  # 1.7 s / 1.0 s cap -> 2 finals per slot
