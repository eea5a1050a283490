"""G2P accuracy harness: metric math + real-data smoke.

PER/word-accuracy semantics mirror the reference's dictionary-agreement
methodology (reference: micro/g2p/tools/build_g2p_dict.py filters CMUdict
by rule disagreement; the harness scores predictors against that dict).
"""

import pytest

from moonshine_tpu.eval.g2p_accuracy import (
    _edit_distance,
    evaluate,
    phone_tokens,
    rules_predictor,
)
from moonshine_tpu.tts.g2p_dict import load_baked_dict


def test_phone_tokens_units_and_stress():
    assert phone_tokens("tɹˌɪpəlˈeɪ") == ["t", "ɹ", "ɪ", "p", "ə", "l", "eɪ"]
    assert phone_tokens("tʃaɪld") == ["tʃ", "aɪ", "l", "d"]
    assert phone_tokens("ˈæbi", strip_stress=False)[0] == "ˈ"


def test_edit_distance():
    assert _edit_distance(list("abc"), list("abc")) == 0
    assert _edit_distance(list("abc"), list("axc")) == 1
    assert _edit_distance([], list("ab")) == 2
    assert _edit_distance(list("kitten"), list("sitting")) == 3


def test_evaluate_metrics():
    pairs = [("a", "æ"), ("b", "bi")]
    res = evaluate({"a": "æ", "b": "di"}.get, pairs)
    assert res["words"] == 2
    assert res["word_acc"] == 0.5
    assert res["per"] == pytest.approx(1 / 3)
    assert res["errors"] == [("b", "di", "bi")]


def test_rules_engine_on_real_dictionary_sample():
    d = sorted(load_baked_dict().items())
    if not d:
        pytest.skip("reference assets not mounted")
    res = evaluate(rules_predictor("en"), d[:500])
    # These words are by construction the rules engine's failures; the
    # harness must still show partial phone-level credit (PER well under
    # a total miss) — full-dict numbers live in docs/EVAL.md.
    assert 0 < res["word_acc"] < 1
    assert res["per"] < 0.6
