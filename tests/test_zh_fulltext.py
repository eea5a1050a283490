"""zh FULL-TEXT G2P engine parity ratchet (VERDICT r3 item 4).

The golden (tests/data/g2p_ref/zh_fulltext.golden.tsv) is the reference
ChineseRuleG2p's output — compiled unmodified in scripts/g2p_oracle —
over the 96 reconstructed zh wiki lines + numeral grid, with BOTH
engines loading the SAME hand-authored reading lexicon
(tts/data/zh_pinyin.tsv expanded by scripts/eval_zh_fulltext.py).  This
scores the engine tier: CJK-run tokenization, per-char fallback with
space joining, arabic→han numeral expansion, ASCII passthrough
(chinese.cpp:497-546).  Measured round 4: 100.00% / 3,387 words.
"""

from __future__ import annotations

import difflib
from pathlib import Path

import pytest

from moonshine_tpu.eval.g2p_reference_agreement import _tokens, strip_stress
from moonshine_tpu.tts.lang_rules import ChineseHanziG2P, zh_numeral_to_hanzi

GOLDEN = Path(__file__).parent / "data" / "g2p_ref" / "zh_fulltext.golden.tsv"


def test_fulltext_engine_parity_floor():
    if not GOLDEN.exists():
        pytest.skip("golden not generated")
    rows = [line.split("\t", 1) for line in
            GOLDEN.read_text(encoding="utf-8").splitlines() if line.strip()]
    assert len(rows) >= 95
    g = ChineseHanziG2P()
    ref_words = matched = 0
    for text, ref in rows:
        hyp = g.text_to_ipa(text)
        rt = [strip_stress(t) for t in _tokens(ref)]
        ht = [strip_stress(t) for t in _tokens(hyp)]
        ref_words += len(rt)
        sm = difflib.SequenceMatcher(a=rt, b=ht, autojunk=False)
        matched += sum(b.size for b in sm.get_matching_blocks())
    assert ref_words >= 3300
    agree = matched / ref_words
    assert agree >= 0.999, f"zh full-text agreement {agree:.4f} < 0.999"


def test_numeral_to_hanzi_contract():
    # chinese-numbers.cpp arabic_numeral_token_to_han semantics
    assert zh_numeral_to_hanzi("42") == "四十二"
    assert zh_numeral_to_hanzi("1,234") == "一千二百三十四"
    assert zh_numeral_to_hanzi("3.14") == "三点一四"
    assert zh_numeral_to_hanzi("007") == "零零七"
    assert zh_numeral_to_hanzi("-7") == "负七"
    assert zh_numeral_to_hanzi("0.5") == "零点五"
    assert zh_numeral_to_hanzi("abc") is None


def test_pinyin_path_still_serves_latin_input():
    from moonshine_tpu.tts.g2p import GraphemeToPhonemizer

    g = GraphemeToPhonemizer(language="zh")
    # hanzi text flows through the full-text engine
    assert g.text_to_ipa("上海是一座城市")
    # diacritic pinyin keeps the per-token rules (no CJK -> fall-through)
    assert g.text_to_ipa("nǐ hǎo")
