"""Japanese neural kanji-reading tier (train/ja_reader.py).

Mirrors the reference's ja ONNX helper tier (reference:
core/moonshine-tts/src/lang-specific/japanese-tok-pos-onnx.h +
japanese-onnx-g2p.cpp): a span->IPA model backstops the reading lexicon
for kanji the lexicon misses.  Trained here from the reference's own
shipped wiki corpus by kana-anchored alignment (tts/ja_align.py).

Reduced-step smoke here; the honest held-out table is in docs/EVAL.md
(scripts/eval_ja_neural.py).
"""

from __future__ import annotations

import pytest

from moonshine_tpu.tts import ja_align
from moonshine_tpu.tts.g2p_transformer import G2PTransformer
from moonshine_tpu.tts.lang_rules import JapaneseG2P, kana_to_ipa

pytestmark = [pytest.mark.skipif(
    not ja_align.REF_JA_DIR.is_dir(), reason="reference ja corpus not mounted"
), pytest.mark.slow]  # training-heavy (fast/slow split, conftest)


@pytest.fixture(scope="module")
def reader():
    from moonshine_tpu.train.ja_reader import train_ja_reader

    return train_ja_reader(train_lines=40, steps=300, seed=0)


def test_alignment_module_matches_committed_lexicon():
    # The committed ja_readings.tsv was produced by this machinery; the
    # refactored module must still reproduce its pairs.
    corpus = ja_align.load_corpus()
    known, n_aligned = ja_align.em_harvest(corpus)
    assert n_aligned >= 40
    committed = {}
    import pathlib

    p = pathlib.Path(__file__).parent / "data" / "g2p_ref" / "ja_readings.tsv"
    for line in p.read_text(encoding="utf-8").splitlines():
        if "\t" in line and not line.startswith("#"):
            k, v = line.split("\t", 1)
            committed[k] = v
    assert committed == known


def test_reader_learns_training_spans(reader):
    data, readings = __import__(
        "moonshine_tpu.train.ja_reader", fromlist=["build_ja_dataset"]
    ).build_ja_dataset(40)
    some = sorted(set(data))[:40]
    preds = reader.predict_batch([s for s, _ in some])
    acc = sum(p == ipa for p, (_, ipa) in zip(preds, some)) / len(some)
    assert acc > 0.6  # reduced-step fit floor (full run fits 100%)


def test_custom_in_vocab_roundtrip(reader, tmp_path):
    p = tmp_path / "ja_reader.safetensors"
    reader.save(p)
    loaded = G2PTransformer.load(p)
    assert loaded.in_vocab == reader.in_vocab
    word = reader.in_vocab[len(reader.in_vocab) // 2] * 2
    assert loaded.predict(word) == reader.predict(word)


def test_japanese_g2p_neural_backstop(reader):
    g = JapaneseG2P(lexicon={"学校": "gakkoɯ"}, use_harvested=False,
                    neural=reader)
    # lexicon hit stays exact
    assert g.word_to_ipa("学校") == "gakkoɯ"
    # kana stays on the deterministic table
    assert g.word_to_ipa("ひらがな") == kana_to_ipa("ひらがな")
    # unknown kanji now produce a (neural) reading instead of dropping
    out = g.word_to_ipa("山川")
    assert out != ""
    # without the neural AND on'yomi tiers the same word is dropped
    # (on'yomi composition — round 4 — now reads it when enabled)
    g0 = JapaneseG2P(lexicon={"学校": "gakkoɯ"}, use_harvested=False,
                     use_onyomi=False)
    assert g0.word_to_ipa("山川") == ""
