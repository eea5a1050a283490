#!/usr/bin/env python
"""Dump per-word G2P disagreements vs the bulk oracle goldens.

For each mismatching aligned token pair prints source-word (when the
line's source/ref token counts line up, which pseudo-word lines do),
reference IPA and our IPA — the worklist for driving bulk agreement up.
"""

from __future__ import annotations

import sys
from collections import Counter
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

from moonshine_tpu.eval.g2p_reference_agreement import (  # noqa: E402
    DIALECT_TO_LANG, _tokens, strip_stress)

BULK = REPO / "tests" / "data" / "g2p_ref" / "bulk"


def diff_language(dialect: str, limit: int = 40, strict: bool = False):
    import difflib

    from moonshine_tpu.tts.g2p import GraphemeToPhonemizer

    g = GraphemeToPhonemizer(language=DIALECT_TO_LANG[dialect])
    rows = []
    for line in (BULK / f"{dialect}.golden.tsv").read_text(
            encoding="utf-8").splitlines():
        if line.strip():
            text, ipa = line.split("\t", 1)
            rows.append((text, ipa))
    bad = Counter()
    examples = {}
    for text, ref_ipa in rows:
        hyp_ipa = g.text_to_ipa(text)
        rt, ht = _tokens(ref_ipa), _tokens(hyp_ipa)
        if not strict:
            rt = [strip_stress(t) for t in rt]
            ht = [strip_stress(t) for t in ht]
        src = text.split()
        sm = difflib.SequenceMatcher(a=rt, b=ht, autojunk=False)
        for tag, i1, i2, j1, j2 in sm.get_opcodes():
            if tag == "equal":
                continue
            for k in range(max(i2 - i1, j2 - j1)):
                r = rt[i1 + k] if i1 + k < i2 else "∅"
                h = ht[j1 + k] if j1 + k < j2 else "∅"
                w = (src[i1 + k] if len(src) == len(rt) and i1 + k < len(src)
                     else "?")
                bad[(w, r, h)] += 1
                examples.setdefault((w, r, h), text[:60])
    print(f"== {dialect}: {sum(bad.values())} mismatched tokens, "
          f"{len(bad)} distinct ==")
    for (w, r, h), c in bad.most_common(limit):
        print(f"  {c:>3}x  {w:20} ref={r:24} hyp={h}")
    return bad


if __name__ == "__main__":
    dialects = sys.argv[1:] or ["en", "es_es", "de", "fr", "nl", "it", "ru",
                                "uk", "pt_br", "tr", "ko", "vi", "hi", "ar"]
    for d in dialects:
        diff_language(d)
