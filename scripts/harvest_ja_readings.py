"""Harvest kanji surface->IPA readings from the reference's shipped ja
corpus by kana-anchored alignment.

Thin CLI over moonshine_tpu.tts.ja_align (the alignment/EM machinery,
shared with the neural reading-tier trainer train/ja_reader.py).

Usage: python scripts/harvest_ja_readings.py [--train-lines N] [-o OUT]
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from moonshine_tpu.tts.ja_align import em_harvest, load_corpus  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--train-lines", type=int, default=100,
                    help="harvest only the first N lines")
    ap.add_argument("-o", "--out", default=None)
    args = ap.parse_args()
    root = Path(__file__).resolve().parents[1]
    corpus = load_corpus()[: args.train_lines]
    known, n_aligned = em_harvest(corpus)
    out_path = Path(args.out) if args.out else (
        root / "tests" / "data" / "g2p_ref" / "ja_readings.tsv")
    rows = [f"{span}\t{known[span]}"
            for span in sorted(known, key=lambda s: (-len(s), s))]
    header = ("# surface<TAB>IPA readings harvested from the reference's "
              "in-tree ja wiki corpus\n"
              f"# ({n_aligned} aligned lines of {len(corpus)}; "
              "kana-anchored alignment, scripts/harvest_ja_readings.py)\n")
    out_path.write_text(header + "\n".join(rows) + "\n", encoding="utf-8")
    print(f"{len(rows)} readings from {n_aligned}/{len(corpus)} lines "
          f"-> {out_path}")


if __name__ == "__main__":
    main()
