"""Per-language number expansion goldens (reference: the per-language
number rules in core/moonshine-tts/src/lang-specific/)."""

import pytest

from moonshine_tpu.tts.number_words import (
    number_to_words_lang,
    supported_number_languages,
)

GOLDENS = {
    "en": [(0, "zero"), (21, "twenty one"), (105, "one hundred five")],
    "es": [
        (0, "cero"), (15, "quince"), (21, "veintiuno"), (31, "treinta y uno"),
        (100, "cien"), (101, "ciento uno"), (500, "quinientos"),
        (742, "setecientos cuarenta y dos"), (1000, "mil"),
        (2023, "dos mil veintitrés"), (1_000_000, "un millón"),
        (2_000_000, "dos millones"),
    ],
    "pt": [
        (0, "zero"), (16, "dezesseis"), (21, "vinte e um"), (100, "cem"),
        (101, "cento e um"), (200, "duzentos"), (345, "trezentos e quarenta e cinco"),
        (1000, "mil"), (2001, "dois mil e um"), (1_000_000, "um milhão"),
    ],
    "it": [
        (0, "zero"), (17, "diciassette"), (21, "ventuno"), (28, "ventotto"),
        (33, "trentatré"), (23, "ventitré"), (100, "cento"), (200, "duecento"),
        (345, "trecentoquarantacinque"), (1000, "mille"), (2000, "duemila"),
        (1_000_000, "un milione"),
    ],
    "fr": [
        (0, "zéro"), (17, "dix-sept"), (21, "vingt et un"), (71, "soixante et onze"),
        (75, "soixante-quinze"), (80, "quatre-vingts"), (91, "quatre-vingt-onze"),
        (100, "cent"), (200, "deux cents"), (201, "deux cent un"),
        (1000, "mille"), (1_000_000, "un million"),
    ],
    "de": [
        (0, "null"), (1, "eins"), (17, "siebzehn"), (21, "einundzwanzig"),
        (35, "fünfunddreißig"), (100, "einhundert"), (101, "einhunderteins"),
        (345, "dreihundertfünfundvierzig"), (1000, "eintausend"),
        (2023, "zweitausenddreiundzwanzig"), (1_000_000, "eine Million"),
    ],
    "nl": [
        (0, "nul"), (13, "dertien"), (21, "eenentwintig"), (22, "tweeëntwintig"),
        (33, "drieëndertig"), (100, "honderd"), (245, "tweehonderdvijfenveertig"),
        (1000, "duizend"), (3000, "drieduizend"),
    ],
    "tr": [
        (0, "sıfır"), (11, "on bir"), (21, "yirmi bir"), (100, "yüz"),
        (200, "iki yüz"), (345, "üç yüz kırk beş"), (1000, "bin"),
        (2023, "iki bin yirmi üç"), (1_000_000, "bir milyon"),
    ],
    "vi": [
        (0, "không"), (10, "mười"), (15, "mười lăm"), (21, "hai mươi mốt"),
        (24, "hai mươi tư"), (25, "hai mươi lăm"), (100, "một trăm"),
        (105, "một trăm lẻ năm"), (345, "ba trăm bốn mươi lăm"),
        (1000, "một nghìn"), (2_000_000, "hai triệu"),
    ],
    "ru": [
        (0, "ноль"), (11, "одиннадцать"), (21, "двадцать один"),
        (40, "сорок"), (100, "сто"), (200, "двести"),
        (345, "триста сорок пять"), (1000, "одна тысяча"),
        (2000, "две тысячи"), (5000, "пять тысяч"),
        (21000, "двадцать одна тысяча"), (1_000_000, "один миллион"), (2_000_000, "два миллиона"),
        (5_000_000, "пять миллионов"),
    ],
    "uk": [
        (0, "нуль"), (14, "чотирнадцять"), (21, "двадцять один"),
        (100, "сто"), (200, "двісті"), (1000, "одна тисяча"),
        (2000, "дві тисячі"), (7000, "сім тисяч"),
    ],
    "ja": [
        (0, "ぜろ"), (1, "いち"), (10, "じゅう"), (11, "じゅういち"),
        (25, "にじゅうご"), (100, "ひゃく"), (300, "さんびゃく"),
        (600, "ろっぴゃく"), (800, "はっぴゃく"), (1000, "せん"),
        (3000, "さんぜん"), (8000, "はっせん"), (10000, "いちまん"),
        (25000, "にまんごせん"),
    ],
    "ko": [
        (0, "영"), (1, "일"), (10, "십"), (21, "이십일"), (100, "백"),
        (345, "삼백사십오"), (1000, "천"), (2023, "이천이십삼"),
        (10000, "만"), (25000, "이만 오천"),
    ],
    "zh": [
        (0, "零"), (10, "十"), (25, "二十五"), (100, "一百"),
        (105, "一百零五"), (1000, "一千"),
    ],
    "ar": [
        (0, "صفر"), (1, "واحد"), (11, "أحد عشر"), (20, "عشرون"),
        (25, "خمسة وعشرون"), (100, "مئة"), (200, "مئتان"),
        (345, "ثلاثمئة وخمسة وأربعون"), (1000, "ألف"), (2000, "ألفان"),
        (3000, "ثلاثة آلاف"),
    ],
    "hi": [
        (0, "शून्य"), (5, "पाँच"), (21, "इक्कीस"), (35, "पैंतीस"),
        (40, "चालीस"), (53, "तिरपन"), (99, "निन्यानवे"), (100, "एक सौ"),
        (345, "तीन सौ पैंतालीस"), (1000, "एक हज़ार"),
        (100000, "एक लाख"),
    ],
}


def test_all_16_languages_supported():
    assert len(supported_number_languages()) == 16


@pytest.mark.parametrize("lang", sorted(GOLDENS))
def test_number_goldens(lang):
    for n, expected in GOLDENS[lang]:
        assert number_to_words_lang(n, lang) == expected, (lang, n)


def test_negative_uses_language_minus():
    assert number_to_words_lang(-5, "de") == "minus fünf"
    assert number_to_words_lang(-3, "fr") == "moins trois"
    assert number_to_words_lang(-2, "ru") == "минус два"


def test_unknown_language_falls_back_to_english():
    assert number_to_words_lang(42, "xx") == "forty two"


def test_every_language_total_function():
    # No crashes and non-empty output over a sweep, every language.
    for lang in supported_number_languages():
        for n in [0, 1, 7, 10, 11, 15, 20, 21, 99, 100, 101, 110, 999, 1000,
                  1001, 9999, 10000, 99999, 123456]:
            out = number_to_words_lang(n, lang)
            assert isinstance(out, str) and out.strip(), (lang, n)


def test_normalize_text_routes_by_language():
    from moonshine_tpu.tts.text_normalize import normalize_text

    # Spanish digits stay for the engine (reference-style expansion
    # happens inside SpanishG2P).
    assert normalize_text("tengo 25 años", "es") == "tengo 25 años"
    from moonshine_tpu.tts.lang_rules import SpanishG2P

    assert (SpanishG2P("es-MX").word_to_ipa("25")
            == SpanishG2P("es-MX").word_to_ipa("veinticinco"))
    # French digits stay for the engine; "80" resolves through the
    # pre-phonemized compound map (french-compound-map.cpp).
    from moonshine_tpu.tts.lang_rules import FrenchG2P

    assert FrenchG2P().word_to_ipa("80") == "kˈatʁvˈɛ̃"
    # German digits stay for the engine (reference-style compound
    # expansion happens inside GermanG2P); only the % sign is worded.
    assert normalize_text("es sind 50%", "de") == "es sind 50 Prozent"
    from moonshine_tpu.tts.lang_rules import GermanG2P

    assert GermanG2P().word_to_ipa("50") == GermanG2P().word_to_ipa("fünfzig")
    assert normalize_text("50%", "zh") == "百分之五十"
    assert normalize_text("%50 indirim", "tr") != "%50 indirim"  # expanded
    # English: plain digits stay for the engine's fused cardinal IPA;
    # currency still expands in normalize.
    assert normalize_text("I have 25 dollars") == "I have 25 dollars"
    assert normalize_text("I have $25") == "I have twenty five dollars"


def test_g2p_expands_numbers_in_language():
    from moonshine_tpu.tts.g2p import GraphemeToPhonemizer

    es = GraphemeToPhonemizer("es").text_to_ipa("25")
    en = GraphemeToPhonemizer("en").text_to_ipa("25")
    assert es and en and es != en
