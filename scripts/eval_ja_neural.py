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


def make_phonemizer(lexicon, neural=None, core=False, onyomi=False,
                    tagger=False):
    """``tagger=False`` pins the pre-LUW greedy path (the ablation
    baselines); None would take the new script-run LUW default."""
    g = GraphemeToPhonemizer(language="ja")
    g.engine = lang_rules.JapaneseG2P(
        lexicon=lexicon if lexicon else {"__none__": ""},
        use_harvested=False, neural=neural, use_core=core,
        use_onyomi=onyomi, tagger=tagger)
    if not lexicon and not core:
        g.engine.lexicon = {k: v for k, v in g.engine.lexicon.items()
                            if k != "__none__"}
    return g


def main(line_range=HELD_OUT, label="held-out"):
    corpus = ja_align.load_corpus()[:TRAIN_LINES]
    lexicon, n_aligned = ja_align.em_harvest(corpus)
    print(f"train lexicon: {len(lexicon)} readings from {n_aligned}/{TRAIN_LINES} lines")
    print("training neural reading tier on the same lines...", flush=True)
    model = train_ja_reader(TRAIN_LINES)

    ref_tagger = ja_align.reference_annotator()
    rows = [
        ("kana-only", make_phonemizer({})),
        (f"lexicon({TRAIN_LINES})", make_phonemizer(lexicon)),
        (f"lexicon({TRAIN_LINES})+neural", make_phonemizer(lexicon, model)),
        ("+core(authored)", make_phonemizer(lexicon, core=True)),
        ("+core+onyomi", make_phonemizer(lexicon, core=True, onyomi=True)),
        ("+core+onyomi+neural",
         make_phonemizer(lexicon, model, core=True, onyomi=True)),
        # The reference's exact tagger→merge→per-unit flow
        # (lang_rules.JaLuwPipeline) with the helper's own shipped
        # annotations as the tagger tier
        ("+luw(ref-tagger)",
         make_phonemizer(lexicon, core=True, onyomi=True,
                         tagger=ref_tagger)),
        # the self-contained production default (script-run annotate)
        ("+luw(script-run)",
         make_phonemizer(lexicon, core=True, onyomi=True,
                         tagger=lang_rules.ja_script_run_annotator)),
    ]
    # Same LUW flow with OUR trained tok_pos tagger (trained on the same
    # rows 1-80 of the ja annotation corpus) as the annotate tier — the
    # fully self-contained production path for arbitrary text.
    from moonshine_tpu.train.tok_pos import train_tok_pos

    print("training ja tok_pos tagger (rows 1-80)...", flush=True)
    tagger, _, _ = train_tok_pos("ja", train_frac=0.8)
    rows.append(("+luw(trained-tagger)",
                 make_phonemizer(lexicon, core=True, onyomi=True,
                                 tagger=tagger.annotate)))
    print(f"\n{label} lines {line_range[0]+1}..{line_range[1]}:")
    print(f"{'config':24} {'words':>6} {'agree':>7} {'charsim':>8}")
    for name, g in rows:
        s = score_language("ja", phonemizer=g, line_range=line_range)
        print(f"{name:24} {s.ref_words:>6} {s.word_agreement:>7.1%} "
              f"{s.char_similarity:>8.3f}", flush=True)


if __name__ == "__main__":
    main()
