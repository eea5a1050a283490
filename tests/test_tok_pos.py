"""Tokenizer-POS tagger (zh/ja text-frontend neural tier).

The reference's zh/ja G2P runs ONNX tokenizer-POS helpers (reference:
core/moonshine-tts/src/lang-specific/chinese-tok-pos-onnx.h,
japanese-tok-pos-onnx.h); ours is trained in-repo on the reference's own
annotated corpora (tests/data/{zh_hans,ja}/tok_pos_wiki*.txt).  These
tests pin the training/eval protocol and the annotate() contract on a
reduced-step run; the full held-out numbers live in docs/EVAL.md
(scripts measured by train/tok_pos.py main).
"""

from __future__ import annotations

import numpy as np
import pytest

from moonshine_tpu.train.tok_pos import (
    CORPORA,
    load_corpus,
    train_tok_pos,
    word_f1,
)
from moonshine_tpu.tts.tok_pos import TokPosConfig, TokPosTagger

pytestmark = [pytest.mark.skipif(
    not CORPORA["zh"].is_file(), reason="reference zh corpus not mounted"
), pytest.mark.slow]  # training-heavy (fast/slow split, conftest)


@pytest.fixture(scope="module")
def zh_tagger():
    # Reduced steps for CI; the measured EVAL.md numbers use the default.
    return train_tok_pos("zh", steps=300, seed=0)


def test_corpus_loads_with_annotations():
    rows = load_corpus("zh")
    assert len(rows) == 96
    text, toks = rows[0]
    assert text.startswith("数学")
    assert all(tag for _, tag in toks)
    # surfaces concatenate back to the source text
    assert "".join(s for s, _ in toks) == text


def test_train_fit_and_heldout_generalization(zh_tagger):
    tagger, train_rows, held_rows = zh_tagger
    assert word_f1(tagger, train_rows) > 0.95  # memorization capacity
    # Honest held-out floor (measured 0.66 at full steps; reduced-step CI
    # floor set safely below).
    assert word_f1(tagger, held_rows) > 0.45
    f1_pos = word_f1(tagger, held_rows, with_pos=True)
    assert f1_pos > 0.3


def test_annotate_contract(zh_tagger):
    tagger, _, _ = zh_tagger
    assert tagger.annotate("") == []
    words = tagger.annotate("数学是研究数量的学科")
    assert words, "non-empty text must yield words"
    assert "".join(w for w, _ in words) == "数学是研究数量的学科"
    assert all(t in tagger.tags for _, t in words)
    assert tagger.segment("数学是研究数量的学科") == [w for w, _ in words]


def test_save_load_roundtrip(zh_tagger, tmp_path):
    tagger, _, held_rows = zh_tagger
    p = tmp_path / "zh_tok_pos.safetensors"
    tagger.save(p)
    loaded = TokPosTagger.load(p)
    text = held_rows[0][0]
    assert loaded.annotate(text) == tagger.annotate(text)


def test_load_rejects_non_artifact(tmp_path):
    from safetensors.numpy import save_file

    p = tmp_path / "junk.safetensors"
    save_file({"x": np.zeros((2, 2), np.float32)}, str(p))
    with pytest.raises(ValueError, match="not a TokPosTagger artifact"):
        TokPosTagger.load(p)
