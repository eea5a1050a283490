#!/usr/bin/env python
"""First measured zh FULL-TEXT G2P number (VERDICT r3 item 4).

The reference's zh pipeline needs its CDN `zh_hans/dict.tsv`, so its
shipped goldens can't be reproduced — but the ENGINE can be measured:
feed the reference's ChineseRuleG2p (compiled unmodified in the oracle)
and our ChineseHanziG2P the SAME reading lexicon (the hand-authored
tts/data/zh_pinyin.tsv — original data — converted to IPA and expanded
to the reference's repeated-key dict.tsv format), then compare
full-text IPA on the 96 reconstructed zh wiki lines.  This scores the
engine tier — CJK-run tokenization, per-char fallback with space
joining, arabic→han numeral expansion, ASCII passthrough — exactly the
way English is scored with the shared in-tree dictionary.

Usage: python scripts/eval_zh_fulltext.py [--update-golden]
Writes tests/data/g2p_ref/zh_fulltext.golden.tsv for the ratchet test.
"""

from __future__ import annotations

import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

from moonshine_tpu.eval.g2p_reference_agreement import (  # noqa: E402
    _tokens, strip_stress)
from moonshine_tpu.tts.lang_rules import (ChineseHanziG2P,  # noqa: E402
                                          zh_authored_lexicon)

ORACLE = REPO / "scripts" / "g2p_oracle" / "g2p_oracle"
ZH_CORPUS = Path("/root/reference/core/moonshine-tts/tests/data/zh_hans/"
                 "tok_pos_wiki_filtered.txt")
GOLDEN = REPO / "tests" / "data" / "g2p_ref" / "zh_fulltext.golden.tsv"
DICT_OUT = REPO / "tests" / "data" / "g2p_ref" / "bulk" / "zh_dict.tsv"


def sources() -> list[str]:
    out = []
    for line in ZH_CORPUS.read_text(encoding="utf-8").splitlines():
        src = "".join(t.rsplit("/", 1)[0] for t in line.split(" ") if t)
        if src.strip():
            out.append(src)
    # numeral grid: exercises arabic→han expansion in both engines
    # (chinese-numbers.cpp arabic_numeral_token_to_han)
    out += ["42 137 2024 10000 100000",
            "3.14 0.5 -7 007 1,234",
            "公元2024年有365天",
            "第1章 第99节 100分"]
    return out


def write_shared_dict() -> Path:
    DICT_OUT.parent.mkdir(exist_ok=True)
    with DICT_OUT.open("w", encoding="utf-8") as f:
        for word, readings in sorted(zh_authored_lexicon().items()):
            for r in readings:  # repeated-key = readings vector
                f.write(f"{word}\t{r}\n")
    return DICT_OUT


def score(hyp_lines, ref_lines):
    import difflib

    ref_words = m = 0
    sim = 0.0
    for ref, hyp in zip(ref_lines, hyp_lines):
        rt = [strip_stress(t) for t in _tokens(ref)]
        ht = [strip_stress(t) for t in _tokens(hyp)]
        ref_words += len(rt)
        sm = difflib.SequenceMatcher(a=rt, b=ht, autojunk=False)
        m += sum(b.size for b in sm.get_matching_blocks())
        sim += difflib.SequenceMatcher(
            a=" ".join(rt), b=" ".join(ht), autojunk=False).ratio()
    return (m / max(1, ref_words), sim / max(1, len(ref_lines)), ref_words)


def main(argv=None) -> int:
    srcs = sources()
    dict_tsv = write_shared_dict()
    proc = subprocess.run(
        [str(ORACLE), "zh", str(dict_tsv)], input="\n".join(srcs) + "\n",
        capture_output=True, text=True, timeout=600)
    if proc.returncode != 0:
        print(f"oracle failed: {proc.stderr[-400:]}", file=sys.stderr)
        return 1
    ref = proc.stdout.splitlines()
    assert len(ref) == len(srcs), (len(ref), len(srcs))

    g = ChineseHanziG2P()
    hyp = [g.text_to_ipa(s) for s in srcs]
    agree, charsim, words = score(hyp, ref)
    print(f"zh full-text engine agreement vs reference ChineseRuleG2p "
          f"(shared authored lexicon, {len(srcs)} lines, {words} words): "
          f"{agree:.2%}  charsim {charsim:.3f}")

    if "--update-golden" in (argv or sys.argv[1:]):
        with GOLDEN.open("w", encoding="utf-8") as f:
            for s, r in zip(srcs, ref):
                f.write(f"{s}\t{r}\n")
        print(f"wrote {GOLDEN}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
