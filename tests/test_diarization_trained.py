"""Trained diarization on real voices: the first measured DER/EER.

Zero-egress analog of the reference's real-model diarization test
(reference: core/transcriber-test.cpp:1063-1119 diarizes the labeled
two-speaker fixture endgame_nagg_nell.wav, which
scripts/generate-diarization-test-audio.py manufactures by stitching two
distinct voices).  Here the two distinct voices are the reference's real
recordings (two_cities_16k.wav vs beckett.wav — different speakers,
different recording chains), the models are trained on the first part of
each via train/diarization.py, and a conversation stitched from HELD-OUT
audio is scored with eval/der.py through the full SpeakerDiarizer.
"""

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # training-heavy (fast/slow split, conftest)

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from moonshine_tpu.audio.wav import load_wav  # noqa: E402
from moonshine_tpu.eval.der import der  # noqa: E402
from moonshine_tpu.eval.speaker_id import evaluate_pairs  # noqa: E402
from moonshine_tpu.models.diarization import (  # noqa: E402
    MEL_HOP,
    WINDOW_SAMPLES,
    embedding_forward,
    segmentation_activations,
)
from moonshine_tpu.pipeline.diarization import SpeakerDiarizer  # noqa: E402
from moonshine_tpu.train.diarization import (  # noqa: E402
    stitch_conversation,
    train_diarization_models,
    voiced_crops,
)

MEL_FRAMES = WINDOW_SAMPLES // MEL_HOP + 1


@pytest.fixture(scope="module")
def trained(two_cities_path, beckett_path):
    a, _ = load_wav(two_cities_path)
    b, _ = load_wav(beckett_path)
    # Train on the head of each recording, hold out the tail.
    train_a, eval_a = a[: int(0.8 * len(a))], a[int(0.8 * len(a)) :]
    train_b, eval_b = b[: int(0.7 * len(b))], b[int(0.7 * len(b)) :]
    out = train_diarization_models(
        jax.random.PRNGKey(0), [train_a, train_b], seg_steps=150, emb_steps=120
    )
    out["eval_crops"] = [
        voiced_crops(eval_a, hop_seconds=0.25),
        voiced_crops(eval_b, hop_seconds=0.25),
    ]
    return out


def _fns(trained):
    segp, embp = trained["segmentation"], trained["embedding"]

    def acts_fn(batch):
        return np.asarray(segmentation_activations(segp, jnp.asarray(batch)))

    def emb_fn(batch, weights):
        return np.asarray(
            embedding_forward(embp, jnp.asarray(batch), jnp.asarray(weights))
        )

    return acts_fn, emb_fn


def _held_out_conversation(trained, seed=42):
    rng = np.random.default_rng(seed)
    return stitch_conversation(rng, trained["eval_crops"], n_turns=10)


def test_training_converged(trained):
    assert trained["seg_loss"] < 0.2
    assert trained["emb_loss"] < 0.05


def test_der_ahc_held_out(trained):
    conv = _held_out_conversation(trained)
    acts_fn, emb_fn = _fns(trained)
    dia = SpeakerDiarizer(acts_fn, emb_fn, cluster_threshold=0.5)
    turns = dia.diarize(conv.audio)
    assert len({t.speaker_id for t in turns}) == 2
    m = der(conv.turns, turns)
    # Measured 2.0% at commit time; generous bound against seed drift.
    assert m["der"] < 0.10, m
    assert m["confusion"] < 0.03, m


def test_der_vbx_held_out(trained):
    conv = _held_out_conversation(trained)
    acts_fn, emb_fn = _fns(trained)
    dia = SpeakerDiarizer(acts_fn, emb_fn, plda=trained["plda"])
    turns = dia.diarize(conv.audio)
    assert len({t.speaker_id for t in turns}) == 2
    m = der(conv.turns, turns)
    assert m["der"] < 0.10, m
    assert m["confusion"] < 0.03, m


def test_streaming_turns_match_one_shot_speakers(trained):
    """Chunked add_audio matches the one-shot diarization of the same audio."""
    conv = _held_out_conversation(trained, seed=7)
    acts_fn, emb_fn = _fns(trained)
    dia = SpeakerDiarizer(acts_fn, emb_fn, cluster_threshold=0.5)
    sid = dia.create_stream()
    chunk = 16000
    for i in range(0, len(conv.audio), chunk):
        dia.add_audio(sid, conv.audio[i : i + chunk])
    turns = dia.finish_stream(sid)
    assert len({t.speaker_id for t in turns}) == 2
    m = der(conv.turns, turns)
    assert m["der"] < 0.15, m
    # The real claim: streaming output agrees with the one-shot result on
    # the SAME audio (scored as reference vs hypothesis, DER ≈ 0 up to
    # window-boundary jitter).
    one_shot = SpeakerDiarizer(
        acts_fn, emb_fn, cluster_threshold=0.5
    ).diarize(conv.audio)
    agreement = der(one_shot, turns)
    assert agreement["der"] < 0.10, agreement


def test_speaker_eer_held_out(trained):
    """Verification EER on held-out crops (eval/speaker_id harness)."""
    crops_a, crops_b = trained["eval_crops"]
    _, emb_fn = _fns(trained)

    def embed(crop):
        win = np.zeros((1, WINDOW_SAMPLES), np.float32)
        win[0, : len(crop)] = crop
        w = np.zeros((1, MEL_FRAMES), np.float32)
        w[0, : len(crop) // MEL_HOP + 1] = 1.0
        return emb_fn(win, w)[0]

    rng = np.random.default_rng(3)
    pairs = []
    for _ in range(20):
        ia, ib = rng.integers(len(crops_a), size=2)
        pairs.append((crops_a[ia], crops_a[ib], True))
        ja = rng.integers(len(crops_a))
        jb = rng.integers(len(crops_b))
        pairs.append((crops_a[ja], crops_b[jb], False))
    out = evaluate_pairs(embed, pairs)
    assert out["trials"] == 40
    assert out["eer"] <= 0.05, out["eer"]


def test_plda_space_separates_speakers(trained):
    """fit_plda: between-speaker distance dominates within-speaker."""
    crops_a, crops_b = trained["eval_crops"]
    _, emb_fn = _fns(trained)

    def embed_many(crops):
        n = len(crops)
        win = np.zeros((n, WINDOW_SAMPLES), np.float32)
        win[:, : crops.shape[1]] = crops
        w = np.zeros((n, MEL_FRAMES), np.float32)
        w[:, : crops.shape[1] // MEL_HOP + 1] = 1.0
        return emb_fn(win, w)

    fa = trained["plda"](embed_many(crops_a))
    fb = trained["plda"](embed_many(crops_b))
    d = fa.shape[1]
    # Compare in the top between-class dimensions where phi is largest.
    k = min(8, d)
    within = np.linalg.norm(fa[:, :k] - fa[:, :k].mean(0), axis=1).mean()
    between = np.linalg.norm(fa[:, :k].mean(0) - fb[:, :k].mean(0))
    assert between > 2.0 * within, (between, within)


# -- DER metric self-checks --------------------------------------------------


def test_der_identity_is_zero():
    ref = [(0, 0.0, 2.0), (1, 3.0, 5.0)]
    m = der(ref, ref)
    assert m["der"] == 0.0


def test_der_label_permutation_is_free():
    ref = [(0, 0.0, 2.0), (1, 3.0, 5.0)]
    hyp = [(9, 0.0, 2.0), (4, 3.0, 5.0)]
    assert der(ref, hyp)["der"] == 0.0


def test_der_empty_hypothesis_is_all_miss():
    ref = [(0, 0.0, 2.0)]
    m = der(ref, [], collar=0.0)
    assert m["miss"] == pytest.approx(1.0, abs=0.02)
    assert m["der"] == pytest.approx(1.0, abs=0.02)


def test_der_confusion_counted():
    ref = [(0, 0.0, 2.0), (1, 2.0, 4.0)]
    hyp = [(5, 0.0, 4.0)]  # one speaker covers both
    m = der(ref, hyp, collar=0.0)
    assert m["confusion"] == pytest.approx(0.5, abs=0.03)
    assert m["miss"] == 0.0


def test_der_collar_forgives_boundaries():
    ref = [(0, 1.0, 2.0)]
    hyp = [(0, 1.1, 2.1)]  # 100 ms boundary slop
    assert der(ref, hyp, collar=0.25)["der"] == 0.0
    assert der(ref, hyp, collar=0.0)["der"] > 0.0
