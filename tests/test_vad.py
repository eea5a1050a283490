"""VAD model + segmenter tests (reference: core/voice-activity-detector
semantics, core/silero-vad.h contract)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from moonshine_tpu.models import vad
from moonshine_tpu.pipeline.vad_segmenter import VadSegmenter

SR = 16000
HOP = 512


# -- neural VAD model ------------------------------------------------------

def test_vad_shapes_and_state():
    params = vad.init_params(jax.random.PRNGKey(0))
    state = vad.init_state(batch=2)
    hop = jnp.zeros((2, HOP))
    prob, state2 = vad.predict_hop(params, hop, state)
    assert prob.shape == (2,)
    assert np.all((np.asarray(prob) >= 0) & (np.asarray(prob) <= 1))
    assert state2.context.shape == (2, vad.CONTEXT_SAMPLES)


def test_vad_batched_hops_match_sequential():
    params = vad.init_params(jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    hops = jnp.asarray(rng.standard_normal((1, 6, HOP)).astype(np.float32) * 0.1)

    state = vad.init_state(1)
    seq_probs = []
    for i in range(6):
        p, state = vad.predict_hop(params, hops[:, i], state)
        seq_probs.append(float(p[0]))

    state_b = vad.init_state(1)
    probs, state_b = vad.predict_hops(params, hops, state_b)
    np.testing.assert_allclose(np.asarray(probs)[0], seq_probs, atol=1e-5)
    np.testing.assert_allclose(np.asarray(state_b.h), np.asarray(state.h), atol=1e-5)


def test_vad_state_carries_information():
    """The same hop after different histories must give different outputs."""
    params = vad.init_params(jax.random.PRNGKey(0))
    rng = np.random.default_rng(1)
    hop = jnp.asarray(rng.standard_normal((1, HOP)).astype(np.float32))

    p1, _ = vad.predict_hop(params, hop, vad.init_state(1))
    state = vad.init_state(1)
    for _ in range(4):
        _, state = vad.predict_hop(params, hop, state)
    p2, _ = vad.predict_hop(params, hop, state)
    assert abs(float(p1[0]) - float(p2[0])) > 1e-8


# -- segmenter state machine ----------------------------------------------

class OracleProbs:
    """Deterministic per-hop probabilities for state-machine testing."""

    def __init__(self, probs):
        self.probs = list(probs)
        self.i = 0

    def __call__(self, hops):
        out = []
        for _ in range(hops.shape[0]):
            out.append(self.probs[self.i] if self.i < len(self.probs) else 0.0)
            self.i += 1
        return np.asarray(out, np.float32)


def hops_audio(n_hops, value=0.1):
    return np.full(n_hops * HOP, value, np.float32)


def make_segmenter(probs, **kw):
    seg = VadSegmenter(OracleProbs(probs), window_size=kw.pop("window_size", 1), **kw)
    seg.start()
    return seg


def test_simple_segment_detected():
    # 4 speech hops surrounded by silence
    probs = [0.0, 0.9, 0.9, 0.9, 0.9, 0.0, 0.0]
    seg = make_segmenter(probs)
    seg.process_audio(hops_audio(len(probs)))
    assert len(seg.segments) == 1
    s = seg.segments[0]
    assert s.is_complete
    # Look-behind prepend: 1 silence hop before speech start is included
    # (look_behind covers it); audio = look_behind prefix + 4 speech + 1 end hop.
    assert s.audio_data.size >= 5 * HOP


def test_look_behind_prepend_limited_by_stream_start():
    probs = [0.9, 0.9, 0.0]
    seg = make_segmenter(probs)
    seg.process_audio(hops_audio(3))
    s = seg.segments[0]
    # Only 1 hop had been processed when voice started; look-behind cannot
    # reach before the stream (reference: cpp:173-176).
    assert s.audio_data.size == 3 * HOP
    assert s.start_time == 0.0


def test_incomplete_while_voice_continues():
    probs = [0.9] * 5
    seg = make_segmenter(probs, max_segment_sample_count=0)
    seg.process_audio(hops_audio(5))
    assert len(seg.segments) == 1
    assert not seg.segments[0].is_complete
    assert seg.segments[0].just_updated


def test_stop_completes_open_segment():
    seg = make_segmenter([0.9] * 3, max_segment_sample_count=0)
    seg.process_audio(hops_audio(3))
    assert not seg.segments[0].is_complete
    seg.stop()
    assert seg.segments[0].is_complete
    assert not seg.is_active


def test_threshold_zero_always_voice():
    seg = VadSegmenter(OracleProbs([0.0] * 4), threshold=0.0, window_size=1)
    seg.start()
    seg.process_audio(hops_audio(4))
    assert len(seg.segments) == 1
    assert not seg.segments[0].is_complete


def test_force_split_at_max_segment():
    # Continuous voice with max segment of 10 hops: threshold decay must
    # force completion despite probability staying at 1.0.
    n = 40
    max_seg = 10 * HOP
    seg = make_segmenter([1.0] * n, max_segment_sample_count=max_seg)
    seg.process_audio(hops_audio(n))
    completed = [s for s in seg.segments if s.is_complete]
    assert len(completed) >= 2
    for s in completed:
        assert s.audio_data.size <= max_seg + HOP


def test_smoothing_window_delays_onset():
    # With window_size=4, a single high hop (0.9 avg -> 0.225) stays below
    # a 0.5 threshold; sustained speech crosses it.
    probs = [0.9, 0.9, 0.9, 0.9, 0.9, 0.0]
    seg = VadSegmenter(OracleProbs(probs), window_size=4)
    seg.start()
    seg.process_audio(hops_audio(len(probs)))
    assert len(seg.segments) == 1
    # Onset needed >= 3 hops of 0.9 to cross 0.5 (0.9*3/4 = 0.675).
    assert seg.segments[0].start_time >= 0.0


def test_remainder_buffering():
    # Feeding audio in odd-sized pieces must process identically to one shot.
    probs = [0.0, 0.9, 0.9, 0.0]
    audio = hops_audio(4)
    seg1 = make_segmenter(probs)
    seg1.process_audio(audio)

    seg2 = make_segmenter(probs)
    for piece in np.split(audio, [100, 700, 1300]):
        seg2.process_audio(piece)
    assert len(seg1.segments) == len(seg2.segments) == 1
    np.testing.assert_array_equal(seg1.segments[0].audio_data, seg2.segments[0].audio_data)


def test_byte_accounting_and_clear():
    probs = [0.9, 0.9, 0.0, 0.0]
    seg = make_segmenter(probs)
    seg.process_audio(hops_audio(4))
    assert seg.retained_segment_audio_byte_count() > 0
    assert seg.completed_segment_audio_byte_count() > 0
    seg.clear_completed_segment_audio_data()
    assert seg.completed_segment_audio_byte_count() == 0


def test_just_updated_flags_reset_each_call():
    probs = [0.9, 0.9, 0.0, 0.0, 0.0, 0.0]
    seg = make_segmenter(probs)
    seg.process_audio(hops_audio(3))
    assert seg.segments[0].just_updated
    seg.process_audio(hops_audio(3))
    assert not seg.segments[0].just_updated
