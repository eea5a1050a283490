"""Ratchet test: G2P agreement with the reference engines must not regress.

Goldens are pre-generated reference-engine IPA (see
tests/data/g2p_ref/README.md and scripts/g2p_oracle/). Floors sit just
below the currently measured per-dialect word agreement; raise them as the
engines improve.
"""

import pytest

from moonshine_tpu.eval.g2p_reference_agreement import (
    DIALECT_TO_LANG,
    default_data_dir,
    score_language,
)

# dialect -> (word_agreement floor, char_similarity floor)
FLOORS = {
    "ar": (0.97, 0.97),
    "de": (0.97, 0.99),
    "en": (0.98, 0.99),
    "es_es": (0.97, 0.99),
    "es_mx": (0.97, 0.99),
    "fr": (0.97, 0.99),
    "hi": (0.97, 0.99),
    "it": (0.97, 0.99),
    # round 4: LUW pipeline + authored core/on'yomi tiers lifted ja
    # in-corpus 0.65 -> 0.845; round 5: the katakana-middle-dot
    # separator fix -> 0.850 (held-out: tests/test_ja_heldout.py)
    "ja": (0.84, 0.925),
    "ko": (0.97, 0.99),
    "nl": (0.97, 0.99),
    "pt_br": (0.97, 0.99),
    "pt_pt": (0.97, 0.99),
    "ru": (0.97, 0.99),
    "tr": (0.97, 0.99),
    "uk": (0.97, 0.99),
    "vi": (0.97, 0.97),
}


@pytest.mark.parametrize("dialect", sorted(FLOORS))
def test_agreement_floor(dialect):
    s = score_language(dialect)
    floor, char_floor = FLOORS[dialect]
    assert s.word_agreement >= floor, (
        f"{dialect}: word agreement {s.word_agreement:.1%} fell below the "
        f"ratchet floor {floor:.0%}")
    assert s.char_similarity >= char_floor


def test_all_goldens_have_floors():
    present = {p.name.split(".")[0]
               for p in default_data_dir().glob("*.golden.tsv")}
    # goldens with their own ratchet harness (zh full-text engine
    # parity: tests/test_zh_fulltext.py) are not per-dialect floors
    present -= {"zh_fulltext"}
    assert present == set(FLOORS)
    assert present <= set(DIALECT_TO_LANG)
