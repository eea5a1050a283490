"""Honest-split evaluation of the ja neural kanji-reading tier.

Protocol (mirrors VERDICT r2 task 5): lexicon harvest AND neural training
see only wiki lines 1..80; every configuration is scored on the held-out
lines 81..100 of the reference's own shipped corpus
(tests/data/g2p_ref/ja.golden.tsv = tok_pos_wiki_100 source + full
ONNX-pipeline IPA).  Rows:

  kana-only            — reference kana table, no kanji readings
  lexicon(80)          — + readings harvested from the train lines
  lexicon(80)+neural   — + the distilled reading transformer for spans
                         the lexicon misses (train/ja_reader.py)

Usage: MOONSHINE_TPU_PLATFORM=cpu python scripts/eval_ja_neural.py
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from moonshine_tpu.eval.g2p_reference_agreement import score_language  # noqa: E402
from moonshine_tpu.tts import ja_align, lang_rules  # noqa: E402
from moonshine_tpu.tts.g2p import GraphemeToPhonemizer  # noqa: E402
from moonshine_tpu.train.ja_reader import train_ja_reader  # noqa: E402

TRAIN_LINES = 80
HELD_OUT = (TRAIN_LINES, 100)


def make_phonemizer(lexicon, neural=None):
    g = GraphemeToPhonemizer(language="ja")
    g.engine = lang_rules.JapaneseG2P(
        lexicon=lexicon if lexicon else {"__none__": ""},
        use_harvested=False, neural=neural)
    if not lexicon:
        g.engine.lexicon = {}
    return g


def main():
    corpus = ja_align.load_corpus()[:TRAIN_LINES]
    lexicon, n_aligned = ja_align.em_harvest(corpus)
    print(f"train lexicon: {len(lexicon)} readings from {n_aligned}/{TRAIN_LINES} lines")
    print("training neural reading tier on the same lines...", flush=True)
    model = train_ja_reader(TRAIN_LINES)

    rows = [
        ("kana-only", make_phonemizer({})),
        (f"lexicon({TRAIN_LINES})", make_phonemizer(lexicon)),
        (f"lexicon({TRAIN_LINES})+neural", make_phonemizer(lexicon, model)),
    ]
    print(f"\nheld-out lines {HELD_OUT[0]+1}..{HELD_OUT[1]}:")
    print(f"{'config':24} {'words':>6} {'agree':>7} {'charsim':>8}")
    for name, g in rows:
        s = score_language("ja", phonemizer=g, line_range=HELD_OUT)
        print(f"{name:24} {s.ref_words:>6} {s.word_agreement:>7.1%} "
              f"{s.char_similarity:>8.3f}", flush=True)


if __name__ == "__main__":
    main()
