"""TTS tests: text normalization, G2P, acoustic model, facade
(reference: core/moonshine-tts/tests/ per-language G2P goldens,
text-normalize tests, synthesis speed test intent)."""

import numpy as np
import pytest

from moonshine_tpu.tts.g2p import GraphemeToPhonemizer, load_cmudict_lexicon
from moonshine_tpu.tts.text_normalize import (
    normalize_text,
    number_to_words,
    ordinal_to_words,
    year_to_words,
)


# -- text normalization ----------------------------------------------------

@pytest.mark.parametrize(
    "n,words",
    [
        (0, "zero"),
        (7, "seven"),
        (13, "thirteen"),
        (21, "twenty one"),
        (100, "one hundred"),
        (345, "three hundred forty five"),
        (1000, "one thousand"),
        (1000000, "one million"),
        (-5, "minus five"),
    ],
)
def test_number_to_words(n, words):
    assert number_to_words(n) == words


def test_ordinals():
    assert ordinal_to_words(1) == "first"
    assert ordinal_to_words(2) == "second"
    assert ordinal_to_words(3) == "third"
    assert ordinal_to_words(4) == "fourth"
    assert ordinal_to_words(12) == "twelfth"
    assert ordinal_to_words(20) == "twentieth"
    assert ordinal_to_words(21) == "twenty first"


def test_years():
    assert year_to_words(1984) == "nineteen eighty four"
    assert year_to_words(1900) == "nineteen hundred"
    assert year_to_words(2005) == "two thousand five"


@pytest.mark.parametrize(
    "text,expected",
    [
        ("I have 3 cats", "I have 3 cats"),  # digits stay for the engine
        ("$5", "five dollars"),
        ("$1.50", "one dollar and fifty cents"),
        ("50%", "fifty percent"),
        ("the 2nd time", "the second time"),
        ("Dr. Smith", "doctor Smith"),
        ("meet at 3:30", "meet at three thirty"),
        ("in 1984 there", "in 1984 there"),  # fused cardinal IPA in-engine
        ("A&B", "A and B"),
    ],
)
def test_normalize_text(text, expected):
    assert normalize_text(text) == expected


# -- G2P -------------------------------------------------------------------

def test_g2p_english_basics():
    # Reference-engine outputs (scripts/g2p_oracle en en_dict.tsv):
    # every path emits a primary stress (english-hand-oov.cpp).
    g = GraphemeToPhonemizer("en")
    assert g.word_to_ipa("the") == "ðˈə"  # function word
    assert g.word_to_ipa("cat") == "kˈæt"  # hand rules
    assert g.word_to_ipa("ship") == "ʃˈɪp"
    assert g.word_to_ipa("make") == "mˈeɪk"  # magic e
    assert g.word_to_ipa("see") == "sˈiː"  # baked dictionary
    assert g.word_to_ipa("charge").startswith("tʃ")
    assert "ŋ" in g.word_to_ipa("sing")


def test_g2p_sentence_with_pauses():
    g = GraphemeToPhonemizer("en")
    ipa = g.text_to_ipa("Hello, world.")
    assert "|" in ipa  # comma pause
    assert "‖" in ipa  # full stop pause
    assert ipa.index("|") < ipa.index("‖")


def test_g2p_normalizes_numbers():
    # Numeric tokens render through the reference's fused cardinal IPA
    # (english-numbers.cpp) rather than a words-then-dict detour.
    g = GraphemeToPhonemizer("en")
    assert g.text_to_ipa("3", with_pauses=False) == "θɹˈi"
    assert g.text_to_ipa("25", with_pauses=False) == "twˈɛntiˌfˈaɪv"
    assert (g.text_to_ipa("1891", with_pauses=False)
            == "wˈʌnˌθˈaʊzəndˌˈeɪtˌhˈʌndɹɪdˌnˈaɪntiˌwˈʌn")


def test_g2p_spanish():
    g = GraphemeToPhonemizer("es")
    assert g.word_to_ipa("casa") == "kˈasa"
    assert g.word_to_ipa("cielo").startswith("s")
    assert g.word_to_ipa("llama").startswith("ʝ")
    assert "x" in g.word_to_ipa("jamon")


def test_g2p_unknown_language():
    with pytest.raises(ValueError):
        GraphemeToPhonemizer("xx")


def test_cmudict_lexicon_loading(tmp_path):
    p = tmp_path / "dict.txt"
    p.write_text(
        ";;; comment\n"
        "HELLO  HH AH0 L OW1\n"
        "HELLO(1)  HH EH0 L OW1\n"
        "WORLD  W ER1 L D\n"
    )
    lex = load_cmudict_lexicon(p)
    assert lex["hello"] == "hʌloʊ"
    assert lex["world"] == "wɝld"
    g = GraphemeToPhonemizer("en")
    g.engine.add_lexicon(lex)
    assert g.word_to_ipa("hello") == "hʌlˈoʊ"  # stress added on emit


# -- acoustic model --------------------------------------------------------

def test_ipa_to_ids_roundtrip_structure():
    from moonshine_tpu.models.tts import BOS, EOS, ipa_to_ids

    ids = ipa_to_ids("kæt")
    assert ids[0] == BOS and ids[-1] == EOS
    assert len(ids) == 5  # bos k æ t eos
    # Two-char symbols match greedily.
    ids2 = ipa_to_ids("tʃaɪ")
    assert len(ids2) == 4


def test_synthesize_shapes_and_speed():
    import jax

    from moonshine_tpu.models import tts as tm

    cfg = tm.TTSConfig(dim=64, encoder_layers=1, decoder_layers=1, heads=4)
    params = tm.init_params(cfg, jax.random.PRNGKey(0))
    ids = tm.ipa_to_ids("hɛloʊ wɝld")
    phon = np.zeros(tm.MAX_PHONEMES, np.int32)
    phon[: len(ids)] = ids
    style = tm.make_voice(jax.random.PRNGKey(1))
    r1 = tm.synthesize(params, cfg, phon, len(ids), style, speed=1.0)
    n1 = int(r1.n_frames)
    assert 0 < n1 <= tm.MAX_FRAMES
    wav = np.asarray(r1.waveform[: n1 * tm.HOP])
    assert np.isfinite(wav).all()
    # Faster speed -> fewer frames.
    r2 = tm.synthesize(params, cfg, phon, len(ids), style, speed=2.0)
    assert int(r2.n_frames) < n1


def test_facade_synthesize_and_queue():
    from moonshine_tpu.models.tts import TTSConfig
    from moonshine_tpu.tts.facade import SAMPLE_RATE, TextToSpeech

    played = []
    tts = (
        TextToSpeech(cfg=TTSConfig(dim=64, encoder_layers=1, decoder_layers=1, heads=4))
        .voice("test_voice")
        .play_with(lambda wav, sr: played.append((len(wav), sr)))
        .load()
    )
    wav, sr = tts.synthesize("hi there")
    assert sr == SAMPLE_RATE
    assert wav.size > 0
    assert np.max(np.abs(wav)) <= 1.0 + 1e-5  # normalized

    tts.say("one")
    tts.say("two")
    tts.wait_for_all()
    tts.stop()
    assert len(played) == 2
    assert all(sr == SAMPLE_RATE for _, sr in played)


def test_facade_requires_load():
    from moonshine_tpu.tts.facade import TextToSpeech

    with pytest.raises(RuntimeError):
        TextToSpeech().synthesize("x")


def test_facade_speed_option():
    from moonshine_tpu.models.tts import TTSConfig
    from moonshine_tpu.tts.facade import TTSOptions, TextToSpeech

    tts = TextToSpeech(cfg=TTSConfig(dim=64, encoder_layers=1, decoder_layers=1, heads=4)).load()
    w1, _ = tts.synthesize("a longer sentence to say", TTSOptions(speed=1.0))
    w2, _ = tts.synthesize("a longer sentence to say", TTSOptions(speed=2.0))
    assert len(w2) < len(w1)


@pytest.mark.parametrize(
    "lang,word,expected",
    [
        ("fr", "bonjour", "bɔ̃ʒˈuʁ"),
        ("fr", "eau", "ˈo"),
        ("de", "buch", "bˈʊx"),
        ("de", "schiff", "ʃˈɪff"),
        ("it", "ciao", "t͡ʃˈao"),
        ("it", "gnocchi", "ɲɲˈokki"),
        ("pt", "chave", "ʃˈavɪ"),  # final-e reduction (pt_br)
    ],
)
def test_g2p_more_languages(lang, word, expected):
    g = GraphemeToPhonemizer(lang)
    assert g.word_to_ipa(word) == expected


def test_g2p_supported_languages_listing():
    from moonshine_tpu.tts.g2p import SUPPORTED_LANGUAGES

    assert set(SUPPORTED_LANGUAGES) >= {"en", "es", "fr", "de", "it", "pt"}


def test_voice_pack_roundtrip(tmp_path):
    """Voice packs (style vectors + optional trained params) round-trip
    through one safetensors file and load via TextToSpeech.load(path)."""
    import jax
    import numpy as np

    from moonshine_tpu.models import tts as tts_model
    from moonshine_tpu.tts.facade import (
        TextToSpeech, load_voice_pack, save_voice_pack,
    )

    params = tts_model.init_params(tts_model.TTSConfig(), jax.random.PRNGKey(7))
    voices = {
        "af_custom": np.asarray(tts_model.make_voice(jax.random.PRNGKey(8))),
        "am_other": np.asarray(tts_model.make_voice(jax.random.PRNGKey(9))),
    }
    path = tmp_path / "pack.safetensors"
    save_voice_pack(path, voices, params=params)

    p2, v2 = load_voice_pack(path)
    assert set(v2) == set(voices)
    np.testing.assert_array_equal(v2["af_custom"], voices["af_custom"])
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(p2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    tts = TextToSpeech().voice("af_custom").load(str(path))
    wav, sr = tts.synthesize("hello")
    assert sr == 24000 and len(wav) > 0
    # Voices-only pack (no params) leaves the model randomly initialised.
    path2 = tmp_path / "voices_only.safetensors"
    save_voice_pack(path2, voices)
    p3, v3 = load_voice_pack(path2)
    assert p3 is None and set(v3) == set(voices)


def test_split_say_utterances():
    from moonshine_tpu.tts.facade import split_say_utterances

    assert split_say_utterances("One. Two! Three? Four: five") == [
        "One.", "Two!", "Three?", "Four:", "five",
    ]
    # No split without trailing whitespace (decimals, URLs).
    assert split_say_utterances("pi is 3.14 okay") == ["pi is 3.14 okay"]
    assert split_say_utterances("   ") == []
    assert split_say_utterances("plain") == ["plain"]


def test_say_pipeline_splits_and_overlaps():
    """say() splits into clauses; synthesis of clause N+1 overlaps playback
    of clause N through the bounded play queue (reference: tts.py:823-827)."""
    import threading

    from moonshine_tpu.models.tts import TTSConfig
    from moonshine_tpu.tts.facade import TextToSpeech

    played = []
    gate = threading.Event()

    def slow_play(wav, sr):
        played.append(len(wav))
        gate.set()

    tts = (
        TextToSpeech(cfg=TTSConfig(dim=64, encoder_layers=1, decoder_layers=1, heads=4))
        .play_with(slow_play)
        .load()
    )
    tts.say("First clause. Second clause! Third?")
    tts.wait()
    tts.stop()
    assert len(played) == 3
    assert gate.is_set()
    assert not tts.is_talking()


def test_play_error_and_success_beeps_ordered():
    from moonshine_tpu.models.tts import TTSConfig
    from moonshine_tpu.tts.facade import SAMPLE_RATE, TextToSpeech, _make_beep

    played = []
    tts = (
        TextToSpeech(cfg=TTSConfig(dim=64, encoder_layers=1, decoder_layers=1, heads=4))
        .play_with(lambda wav, sr: played.append(np.asarray(wav)))
        .load()
    )
    tts.say("hello")
    tts.play_error()
    tts.play_success()
    tts.wait()
    tts.stop()
    assert len(played) == 3
    # Beeps play after the in-flight say, in order; cached arrays match.
    np.testing.assert_array_equal(played[1], _make_beep("error"))
    np.testing.assert_array_equal(played[2], _make_beep("success"))
    # Error descends, success ascends: compare dominant frequency halves.
    err = _make_beep("error")
    half = len(err) // 2
    zc_first = np.count_nonzero(np.diff(np.signbit(err[:half])))
    zc_second = np.count_nonzero(np.diff(np.signbit(err[half:])))
    assert zc_first > zc_second
    suc = _make_beep("success")
    zc_first_s = np.count_nonzero(np.diff(np.signbit(suc[:half])))
    zc_second_s = np.count_nonzero(np.diff(np.signbit(suc[half:])))
    assert zc_first_s < zc_second_s
    assert _make_beep("error").dtype == np.float32
    assert SAMPLE_RATE == 24000


def test_tts_backend_works_with_alphanumeric_listener():
    """The facade satisfies the AlphanumericListener tts contract."""
    from moonshine_tpu.agent.alphanumeric import AlphanumericListener
    from moonshine_tpu.core.types import TranscriptLine
    from moonshine_tpu.models.tts import TTSConfig
    from moonshine_tpu.pipeline.transcriber import LineCompleted
    from moonshine_tpu.tts.facade import TextToSpeech

    played = []
    tts = (
        TextToSpeech(cfg=TTSConfig(dim=64, encoder_layers=1, decoder_layers=1, heads=4))
        .play_with(lambda wav, sr: played.append(len(wav)))
        .load()
    )
    lst = AlphanumericListener(lambda e: None, tts=tts)
    lst(LineCompleted(line=TranscriptLine(id=0, text="bravo"), stream_id=0))
    lst(LineCompleted(line=TranscriptLine(id=1, text="xyzzy"), stream_id=0))
    tts.wait()
    tts.stop()
    assert lst.text == "b"
    assert len(played) == 2  # "bee" echo + error beep
