"""Diarization tests: clustering, streaming facade with synthetic oracles,
span application, and neural model shapes (reference:
core/transcriber-test.cpp diarization SUBCASEs + cpp-annote tests intent)."""

import numpy as np
import pytest

from moonshine_tpu.pipeline.diarization import (
    SpeakerDiarizer,
    SpeakerTurn,
    apply_speaker_turns_to_lines,
    cluster_embeddings,
)

SR = 16000


# -- clustering ------------------------------------------------------------

def test_cluster_two_groups():
    rng = np.random.default_rng(0)
    a = rng.normal(0, 0.05, (5, 16)) + np.eye(16)[0]
    b = rng.normal(0, 0.05, (4, 16)) + np.eye(16)[1]
    embs = np.concatenate([a, b])
    labels = cluster_embeddings(embs, threshold=0.5)
    assert len(set(labels[:5])) == 1
    assert len(set(labels[5:])) == 1
    assert labels[0] != labels[5]


def test_cluster_empty_and_single():
    assert cluster_embeddings(np.zeros((0, 8))).size == 0
    assert list(cluster_embeddings(np.ones((1, 8)))) == [0]


def test_cluster_threshold_controls_merging():
    embs = np.stack([np.eye(8)[0], np.eye(8)[1]])
    # Orthogonal vectors: distance 1.0
    assert len(set(cluster_embeddings(embs, threshold=0.5))) == 2
    assert len(set(cluster_embeddings(embs, threshold=1.5))) == 1


# -- synthetic two-speaker stream -----------------------------------------

class TwoSpeakerOracle:
    """Speaker 0 in [0, 12) s, speaker 1 in [12, 24) s.

    The activity oracle reports local speaker 0 active in any window; the
    embedding oracle returns a vector keyed to the *absolute* audio content
    (audio value encodes speaker identity).
    """

    def activities(self, batch: np.ndarray) -> np.ndarray:
        b, n = batch.shape
        t = 250
        out = np.zeros((b, t, 3), np.float32)
        out[:, :, 0] = 0.9  # one local speaker per window
        return out

    def embeddings(self, batch: np.ndarray, weights: np.ndarray) -> np.ndarray:
        out = np.zeros((len(batch), 16), np.float32)
        for i, clip in enumerate(batch):
            # Audio value ~ +1 for speaker A, -1 for speaker B.
            out[i, 0 if clip.mean() > 0 else 1] = 1.0
        return out


def make_stream_audio():
    a = np.full(12 * SR, 0.5, np.float32)
    b = np.full(12 * SR, -0.5, np.float32)
    return np.concatenate([a, b])


def test_streaming_two_speakers():
    oracle = TwoSpeakerOracle()
    d = SpeakerDiarizer(oracle.activities, oracle.embeddings, cluster_threshold=0.5)
    sid = d.create_stream()
    audio = make_stream_audio()
    for i in range(0, len(audio), 2 * SR):
        d.add_audio(sid, audio[i : i + 2 * SR])
    turns = d.finish_stream(sid)
    assert turns
    ids = {t.speaker_id for t in turns}
    assert len(ids) == 2
    # Earlier audio belongs to the first speaker_index.
    first = min(turns, key=lambda t: t.start_time)
    assert first.speaker_index == 0
    # Speakers partition the timeline roughly at 12 s.
    for t in turns:
        mid = t.start_time + t.duration / 2
        expected = 0 if mid < 12 else 1
        # speaker_index order follows first appearance.
        assert t.speaker_index in (0, 1)


def test_stable_ids_across_reclustering():
    oracle = TwoSpeakerOracle()
    d = SpeakerDiarizer(oracle.activities, oracle.embeddings, cluster_threshold=0.5, cluster_cadence=1.0)
    sid = d.create_stream()
    audio = make_stream_audio()
    seen_ids_for_first: set[int] = set()
    for i in range(0, len(audio), SR):
        d.add_audio(sid, audio[i : i + SR])
        turns = d.get_turns(sid)
        for t in turns:
            if t.start_time < 1.0:
                seen_ids_for_first.add(t.speaker_id)
    # The speaker covering the stream start keeps one stable id throughout.
    assert len(seen_ids_for_first) == 1


def test_one_shot_diarize():
    oracle = TwoSpeakerOracle()
    d = SpeakerDiarizer(oracle.activities, oracle.embeddings, cluster_threshold=0.5)
    turns = d.diarize(make_stream_audio())
    assert len({t.speaker_id for t in turns}) == 2


def test_finish_stream_idempotent():
    oracle = TwoSpeakerOracle()
    d = SpeakerDiarizer(oracle.activities, oracle.embeddings, cluster_threshold=0.5)
    sid = d.create_stream()
    d.add_audio(sid, make_stream_audio())
    t1 = d.finish_stream(sid)
    t2 = d.finish_stream(sid)
    assert [(t.start_time, t.speaker_id) for t in t1] == [
        (t.start_time, t.speaker_id) for t in t2
    ]


# -- span application ------------------------------------------------------

def test_apply_speaker_turns_to_lines():
    from moonshine_tpu.core.types import TranscriptLine, TranscriptWord
    from moonshine_tpu.pipeline.transcript_output import TranscriptOutput

    out = TranscriptOutput()
    out.ordered_line_ids = [0]
    line = TranscriptLine(
        id=0,
        text="hello world",
        start_time=0.0,
        duration=4.0,
        words=[
            TranscriptWord("hello", 0.5, 1.5),
            TranscriptWord("world", 2.5, 3.5),
        ],
    )
    out.add_or_update_line(line)

    turns = [
        SpeakerTurn(start_time=0.0, duration=2.0, speaker_id=7, speaker_index=0),
        SpeakerTurn(start_time=2.0, duration=5.0, speaker_id=9, speaker_index=1),
    ]
    changed = apply_speaker_turns_to_lines(turns, out)
    assert changed
    spans = out.get_line(0).speaker_spans
    assert len(spans) == 2
    # Second turn clipped to the line end.
    assert spans[1].start_time == 2.0
    assert spans[1].duration == pytest.approx(2.0)
    # Char ranges point at the words each span covers.
    assert (spans[0].start_char, spans[0].end_char) == (0, 5)
    assert (spans[1].start_char, spans[1].end_char) == (6, 11)
    # Re-applying identical turns: no change flagged.
    out.clear_update_flags()
    assert not apply_speaker_turns_to_lines(turns, out)


# -- neural models ---------------------------------------------------------

def test_segmentation_model_shapes():
    import jax

    from moonshine_tpu.models import diarization as dm

    params = dm.init_segmentation_params(jax.random.PRNGKey(0))
    audio = np.random.default_rng(0).standard_normal((2, dm.WINDOW_SAMPLES)).astype(np.float32) * 0.1
    acts = np.asarray(dm.segmentation_activations(params, audio))
    assert acts.shape[0] == 2
    assert acts.shape[2] == dm.MAX_LOCAL_SPEAKERS
    assert np.all((acts >= 0) & (acts <= 1))


def test_embedding_model_shapes_and_masking():
    import jax

    from moonshine_tpu.models import diarization as dm

    params = dm.init_embedding_params(jax.random.PRNGKey(1))
    rng = np.random.default_rng(1)
    audio = rng.standard_normal((2, dm.WINDOW_SAMPLES)).astype(np.float32) * 0.1
    e = np.asarray(dm.embedding_forward(params, audio))
    assert e.shape == (2, dm.EMBED_DIM)
    np.testing.assert_allclose(np.linalg.norm(e, axis=1), 1.0, atol=1e-5)
    # Masking changes the embedding.
    n_mel = dm.WINDOW_SAMPLES // 160 + 1
    w = np.zeros((2, n_mel), np.float32)
    w[:, : n_mel // 2] = 1.0
    e2 = np.asarray(dm.embedding_forward(params, audio, w))
    assert not np.allclose(e, e2)


def test_powerset_mapping():
    from moonshine_tpu.models.diarization import POWERSET, powerset_to_multilabel

    m = powerset_to_multilabel()
    assert m.shape == (len(POWERSET), 3)
    assert m[0].sum() == 0  # empty set
    assert m[4].sum() == 2  # {0,1}


# -- end-to-end through Transcriber ---------------------------------------

def test_identify_speakers_in_pipeline():
    from moonshine_tpu.core.config import TranscriberOptions, VadOptions
    from moonshine_tpu.pipeline.backends import FakeBackend
    from moonshine_tpu.pipeline.transcriber import Transcriber

    oracle = TwoSpeakerOracle()
    diarizer = SpeakerDiarizer(
        oracle.activities, oracle.embeddings, cluster_threshold=0.5
    )
    # Always-speech probabilities with a positive threshold so the
    # force-split decay actually severs lines at ~2/3 of max_segment.
    t = Transcriber(
        FakeBackend(lambda a, i, f: "hello there"),
        TranscriberOptions(
            transcription_interval=0.2,
            identify_speakers=True,
            vad=VadOptions(threshold=0.5, window_size=1, max_segment_duration=8.0),
        ),
        diarizer=diarizer,
        hop_prob_fn=lambda hops: np.ones(hops.shape[0], np.float32),
    )
    stream = t.create_stream(update_interval=0.5)
    stream.start()
    audio = make_stream_audio()
    for i in range(0, len(audio), 2 * SR):
        stream.add_audio(audio[i : i + 2 * SR])
    transcript = stream.stop()
    assert len(transcript.lines) >= 2
    spans = [s for l in transcript.lines for s in l.speaker_spans]
    assert spans, "expected speaker spans on lines"
    assert len({s.speaker_id for s in spans}) == 2
