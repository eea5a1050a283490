"""Grapheme-to-phoneme engine (IPA output).

Capability mirror of the reference's from-scratch MoonshineG2P (reference:
core/moonshine-tts/src/moonshine-g2p.{h,cpp} + lang-specific rules +
lexicons): per-language engines behind one registry, lexicon lookup first,
rule-based letter-to-sound fallback, with the reference's API shape
(``text_to_ipa``).  English ships a compact context-sensitive rule set
plus optional CMUdict-format lexicon loading; Spanish ships as the
near-phonemic second language; other languages register engines as their
rule sets land.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from pathlib import Path
from typing import Callable, Optional

from .text_normalize import normalize_text

# ARPABET -> IPA (for CMUdict-format lexicons).
ARPA_TO_IPA = {
    "AA": "ɑ", "AE": "æ", "AH": "ʌ", "AO": "ɔ", "AW": "aʊ", "AY": "aɪ",
    "B": "b", "CH": "tʃ", "D": "d", "DH": "ð", "EH": "ɛ", "ER": "ɝ",
    "EY": "eɪ", "F": "f", "G": "ɡ", "HH": "h", "IH": "ɪ", "IY": "i",
    "JH": "dʒ", "K": "k", "L": "l", "M": "m", "N": "n", "NG": "ŋ",
    "OW": "oʊ", "OY": "ɔɪ", "P": "p", "R": "ɹ", "S": "s", "SH": "ʃ",
    "T": "t", "TH": "θ", "UH": "ʊ", "UW": "u", "V": "v", "W": "w",
    "Y": "j", "Z": "z", "ZH": "ʒ",
}


def load_cmudict_lexicon(path: str | Path) -> dict[str, str]:
    """CMUdict format -> {word: ipa} (stress digits dropped, first variant)."""
    lex: dict[str, str] = {}
    with open(path, encoding="utf-8", errors="replace") as f:
        for line in f:
            if line.startswith(";;;") or not line.strip():
                continue
            parts = line.split()
            word = parts[0].lower()
            if "(" in word:  # alternate pronunciations: keep the first
                continue
            phones = []
            ok = True
            for p in parts[1:]:
                base = re.sub(r"\d", "", p)
                ipa = ARPA_TO_IPA.get(base)
                if ipa is None:
                    ok = False
                    break
                phones.append(ipa)
            if ok:
                lex[word] = "".join(phones)
    return lex


@dataclass
class G2PResult:
    ipa: str
    words: list[tuple[str, str]] = field(default_factory=list)  # (word, ipa)


class RuleG2P:
    """Ordered context-sensitive rewrite rules over a word.

    Each rule is (pattern, ipa): pattern is a regex anchored at the cursor;
    the longest/first match wins.  '#' in patterns marks word edges.
    """

    def __init__(self, rules: list[tuple[str, str]], lexicon: dict[str, str] | None = None):
        self.lexicon = dict(lexicon or {})
        # Pre-compile, preserving order.
        self._rules = [(re.compile(p), ipa) for p, ipa in rules]

    def add_lexicon(self, lexicon: dict[str, str]) -> None:
        self.lexicon.update(lexicon)

    def word_to_ipa(self, word: str) -> str:
        w = word.lower()
        if w in self.lexicon:
            return self.lexicon[w]
        text = "#" + w + "#"
        i = 1  # skip leading '#'
        out: list[str] = []
        while i < len(text) - 1:
            matched = False
            for pat, ipa in self._rules:
                m = pat.match(text, i)
                if m and m.end() > i:
                    out.append(ipa)
                    i = m.end()
                    matched = True
                    break
            if not matched:
                i += 1  # unpronounceable byte: skip
        return "".join(out)


# ---- English rules (compact; longest-context first) -----------------------

_EN_RULES: list[tuple[str, str]] = [
    # multigraph consonants
    (r"tch", "tʃ"), (r"ch", "tʃ"), (r"sh", "ʃ"), (r"ph", "f"),
    (r"th(?=e#|e[mnsy])", "ð"), (r"th", "θ"), (r"wh", "w"), (r"ck", "k"),
    (r"ng(?=#)", "ŋ"), (r"ng", "ŋɡ"), (r"qu", "kw"), (r"gh(?=#)", ""),
    (r"kn", "n"), (r"wr", "ɹ"), (r"mb(?=#)", "m"), (r"dge", "dʒ"),
    (r"x", "ks"),
    # vowel teams
    (r"igh", "aɪ"), (r"eigh", "eɪ"), (r"ould(?=#)", "ʊd"),
    (r"ought", "ɔt"), (r"augh", "ɔ"), (r"tion", "ʃən"), (r"sion", "ʒən"),
    (r"ture(?=#)", "tʃɝ"), (r"ai", "eɪ"), (r"ay", "eɪ"), (r"ee", "i"),
    (r"ea", "i"), (r"oo(?=k)", "ʊ"), (r"oo", "u"), (r"ou(?=s)", "ə"),
    (r"ou", "aʊ"), (r"ow(?=#)", "oʊ"), (r"ow", "aʊ"), (r"oa", "oʊ"),
    (r"oi", "ɔɪ"), (r"oy", "ɔɪ"), (r"au", "ɔ"), (r"aw", "ɔ"),
    (r"ie(?=#)", "aɪ"), (r"ie", "i"), (r"ei", "eɪ"), (r"ey(?=#)", "i"),
    (r"ue(?=#)", "u"), (r"ui", "u"),
    # r-colored vowels; final -er(s) is unstressed -> ɚ (paper, workers)
    (r"ar(?=#|[bcdfgklmnpstvz])", "ɑɹ"), (r"or", "ɔɹ"), (r"er(?=s?#)", "ɚ"),
    (r"er", "ɝ"), (r"ir", "ɝ"), (r"ur", "ɝ"),
    # magic-e long vowels: a_e, i_e, o_e, u_e
    (r"a(?=[bcdfgklmnpstvz]e#)", "eɪ"),
    (r"i(?=[bcdfgklmnpstvz]e#)", "aɪ"),
    (r"o(?=[bcdfgklmnpstvz]e#)", "oʊ"),
    (r"u(?=[bcdfgklmnpstvz]e#)", "ju"),
    (r"e(?=[bcdfgklmnpstvz]e#)", "i"),
    # inflection endings whose vowel survives after a coronal/sibilant
    # (wanted, needed; boxes, wishes)
    (r"(?<=[td])ed(?=#)", "əd"), (r"(?<=[sxz])es(?=#)", "əz"),
    (r"(?<=[cs]h)es(?=#)", "əz"),
    # syllabic -le after a true consonant (little, table; not smile)
    (r"(?<=[bcdfgkptz])le(?=#)", "əl"),
    # a before l-clusters backs to ɔ (all, also, salt, always)
    (r"a(?=ll|l[ktwsm])", "ɔ"),
    # word-initial unstressed a- (about, abandon, ago, away)
    (r"(?<=#)a(?=[bcdfgklmnpstvz][aeiouy])", "ə"),
    # open-syllable long vowels: single consonant + vowel follows
    # (paper, basic, open, moment, silent, music)
    (r"a(?=[bcdfgklmnpstvz][aeiouy])", "eɪ"),
    (r"o(?=[bcdfgklmnpstvz][aeiouy])", "oʊ"),
    (r"i(?=[bcdfgklmnpstvz][aeiouy])", "aɪ"),
    (r"u(?=[bcdfgklmnpstvz][aeiouy])", "ju"),
    # soft c / g
    (r"cc(?=[eiy])", "ks"), (r"c(?=[eiy])", "s"), (r"g(?=[eiy])", "dʒ"),
    # degemination: English has no geminates within morphemes
    # (abbey, summer, dinner...); doubled consonants sound single.
    (r"bb", "b"), (r"cc", "k"), (r"dd", "d"), (r"ff", "f"), (r"gg", "ɡ"),
    (r"ll", "l"), (r"mm", "m"), (r"nn", "n"), (r"pp", "p"), (r"rr", "ɹ"),
    (r"ss", "s"), (r"tt", "t"), (r"zz", "z"),
    # single letters
    (r"a(?=#)", "ə"), (r"a", "æ"), (r"b", "b"), (r"c", "k"), (r"d", "d"),
    (r"e(?=#)", ""), (r"e(?=d#)", ""), (r"e", "ɛ"), (r"f", "f"), (r"g", "ɡ"),
    (r"h", "h"), (r"i", "ɪ"), (r"j", "dʒ"), (r"k", "k"), (r"l", "l"),
    (r"m", "m"), (r"n(?=k)", "ŋ"), (r"n", "n"), (r"o(?=#)", "oʊ"),
    (r"o", "ɑ"), (r"p", "p"), (r"r", "ɹ"),
    # final -s agrees in voicing with what precedes it (cats vs dogs)
    (r"(?<=[ptkfθ])s(?=#)", "s"), (r"s(?=#)", "z"), (r"s", "s"),
    (r"t", "t"), (r"u", "ʌ"),
    (r"v", "v"), (r"w", "w"), (r"y(?=#)", "i"), (r"y(?=[aeiou])", "j"),
    (r"y", "ɪ"), (r"z", "z"), (r"'", ""),
]

# Core function-word lexicon (the worst offenders for rule-based G2P).
_EN_LEXICON = {
    "the": "ðə", "a": "ə", "an": "ən", "of": "ʌv", "to": "tu", "and": "ænd",
    "was": "wʌz", "is": "ɪz", "are": "ɑɹ", "were": "wɝ", "have": "hæv",
    "has": "hæz", "he": "hi", "she": "ʃi", "you": "ju", "they": "ðeɪ",
    "we": "wi", "i": "aɪ", "one": "wʌn", "two": "tu", "do": "du",
    "does": "dʌz", "done": "dʌn", "what": "wʌt", "who": "hu",
    "where": "wɛɹ", "there": "ðɛɹ", "their": "ðɛɹ", "said": "sɛd",
    "says": "sɛz", "again": "əɡɛn", "against": "əɡɛnst", "been": "bɪn",
    "could": "kʊd", "would": "wʊd", "should": "ʃʊd", "some": "sʌm",
    "come": "kʌm", "love": "lʌv", "move": "muv", "give": "ɡɪv",
    "live": "lɪv", "very": "vɛɹi", "only": "oʊnli", "once": "wʌns",
    "people": "pipəl", "water": "wɔtɝ", "world": "wɝld", "hello": "hɛloʊ",
    "yes": "jɛs", "no": "noʊ", "ok": "oʊkeɪ", "okay": "oʊkeɪ",
    # -gh family
    "through": "θɹu", "though": "ðoʊ", "although": "ɔlðoʊ",
    "thought": "θɔt", "thorough": "θɝoʊ", "enough": "ɪnʌf",
    "tough": "tʌf", "rough": "ɹʌf", "laugh": "læf", "cough": "kɔf",
    "eight": "eɪt", "eighth": "eɪtθ", "weight": "weɪt", "height": "haɪt",
    "neighbor": "neɪbɝ", "daughter": "dɔtɝ", "caught": "kɔt",
    "bought": "bɔt", "brought": "bɹɔt", "fought": "fɔt", "ought": "ɔt",
    "night": "naɪt", "light": "laɪt", "right": "ɹaɪt", "might": "maɪt",
    "straight": "stɹeɪt",
    # silent letters
    "island": "aɪlənd", "isle": "aɪl", "aisle": "aɪl", "answer": "ænsɝ",
    "listen": "lɪsən", "often": "ɔfən", "castle": "kæsəl",
    "whistle": "wɪsəl", "debt": "dɛt", "doubt": "daʊt", "subtle": "sʌtəl",
    "receipt": "ɹɪsit", "iron": "aɪɝn", "sword": "sɔɹd", "half": "hæf",
    "calf": "kæf", "talk": "tɔk", "walk": "wɔk", "chalk": "tʃɔk",
    "folk": "foʊk", "yolk": "joʊk", "salmon": "sæmən", "comb": "koʊm",
    "climb": "klaɪm", "thumb": "θʌm", "lamb": "læm", "plumber": "plʌmɝ",
    "knee": "ni", "knife": "naɪf", "know": "noʊ", "knew": "nu",
    "knight": "naɪt", "wrist": "ɹɪst", "write": "ɹaɪt", "wrong": "ɹɔŋ",
    "hour": "aʊɝ", "honest": "ɑnɪst", "honor": "ɑnɝ", "heir": "ɛɹ",
    # loanwords / fossils
    "colonel": "kɝnəl", "choir": "kwaɪɝ", "yacht": "jɑt",
    "queue": "kju", "quay": "ki", "suite": "swit", "corps": "kɔɹ",
    "genre": "ʒɑnɹə", "rendezvous": "ɹɑndeɪvu", "ballet": "bæleɪ",
    "buffet": "bəfeɪ", "bouquet": "bukeɪ", "croissant": "kwɑsɑnt",
    "chef": "ʃɛf", "machine": "məʃin", "chicago": "ʃɪkɑɡoʊ",
    "michigan": "mɪʃɪɡən", "arkansas": "ɑɹkənsɔ", "tucson": "tusɑn",
    # irregular core vocabulary
    "women": "wɪmɪn", "woman": "wʊmən", "busy": "bɪzi",
    "business": "bɪznɪs", "pretty": "pɹɪti", "friend": "fɹɛnd",
    "great": "ɡɹeɪt", "break": "bɹeɪk", "steak": "steɪk",
    "heart": "hɑɹt", "bear": "bɛɹ", "wear": "wɛɹ", "pear": "pɛɹ",
    "sure": "ʃʊɹ", "sugar": "ʃʊɡɝ", "blood": "blʌd", "flood": "flʌd",
    "shoe": "ʃu", "lose": "luz", "whose": "huz", "gone": "ɡɔn",
    "any": "ɛni", "many": "mɛni", "money": "mʌni", "month": "mʌnθ",
    "other": "ʌðɝ", "mother": "mʌðɝ", "brother": "bɹʌðɝ",
    "father": "fɑðɝ", "nothing": "nʌθɪŋ", "something": "sʌmθɪŋ",
    "son": "sʌn", "ton": "tʌn", "won": "wʌn", "front": "fɹʌnt",
    "eye": "aɪ", "buy": "baɪ", "guy": "ɡaɪ", "bury": "bɛɹi",
    "key": "ki", "police": "pəlis", "pizza": "pitsə", "prove": "pɹuv",
    # days / months (the spoken-date workhorses)
    "monday": "mʌndeɪ", "tuesday": "tuzdeɪ", "wednesday": "wɛnzdeɪ",
    "thursday": "θɝzdeɪ", "friday": "fɹaɪdeɪ", "saturday": "sætɝdeɪ",
    "sunday": "sʌndeɪ", "january": "dʒænjuɛɹi", "february": "fɛbjuɛɹi",
    "august": "ɔɡəst",
}

# ---- Spanish (near-phonemic orthography) ----------------------------------


# ---- French -----------------------------------------------------------


# ---- German ------------------------------------------------------------


# ---- Italian -----------------------------------------------------------


# ---- Portuguese --------------------------------------------------------

_PT_RULES: list[tuple[str, str]] = [
    (r"lh", "ʎ"), (r"nh", "ɲ"), (r"ch", "ʃ"), (r"qu(?=[ei])", "k"),
    (r"gu(?=[ei])", "ɡ"), (r"ç", "s"), (r"c(?=[ei])", "s"),
    (r"g(?=[ei])", "ʒ"), (r"j", "ʒ"), (r"h", ""),
    (r"ão(?=#)", "ɐ̃w̃"), (r"õe", "õj̃"), (r"ã", "ɐ̃"),
    (r"ou", "o"), (r"ei", "ej"), (r"s(?=#)", "ʃ"),
    (r"á", "a"), (r"â", "ɐ"), (r"é", "ɛ"), (r"ê", "e"), (r"í", "i"),
    (r"ó", "ɔ"), (r"ô", "o"), (r"ú", "u"),
    (r"x", "ʃ"), (r"z(?=#)", "ʃ"), (r"z", "z"),
    # nasal vowels before m/n + consonant (gente, campo, onde, um)
    (r"am(?=[pbctdgfsvqk])", "ɐ̃"), (r"an(?=[pbctdgfsvqk])", "ɐ̃"),
    (r"em(?=[pbctdgfsvqk]|#)", "ẽ"), (r"en(?=[pbctdgfsvqk])", "ẽ"),
    (r"im(?=[pbctdgfsvqk]|#)", "ĩ"), (r"in(?=[pbctdgfsvqk])", "ĩ"),
    (r"om(?=[pbctdgfsvqk]|#)", "õ"), (r"on(?=[pbctdgfsvqk])", "õ"),
    (r"um(?=[pbctdgfsvqk]|#)", "ũ"), (r"un(?=[pbctdgfsvqk])", "ũ"),
    (r"rr", "ʁ"),
    # single r: tap between vowels and finally, guttural at word start
    # (lookbehind sees INPUT graphemes, hence the orthographic vowels)
    (r"(?<=[aeiouãõáâéêíóôú])r(?=[aeiou])", "ɾ"),
    (r"r(?=#)", "ɾ"), (r"r", "ʁ"),
    # unstressed final vowels reduce (filho -> fiʎu, gente -> ʒẽti)
    (r"o(?=s?#)", "u"), (r"e(?=s?#)", "i"),
    (r"a", "a"), (r"e", "e"), (r"i", "i"), (r"o", "o"), (r"u", "u"),
    (r"b", "b"), (r"c", "k"), (r"d", "d"), (r"f", "f"), (r"g", "ɡ"),
    (r"k", "k"), (r"l", "l"), (r"m", "m"), (r"n", "n"), (r"p", "p"),
    (r"s", "s"), (r"t", "t"), (r"v", "v"), (r"w", "w"), (r"y", "i"),
]

_PUNCT_PAUSE = {".": "‖", "!": "‖", "?": "‖", ",": "|", ";": "|", ":": "|"}


def _tokenize_words(text: str) -> list[str]:
    """Words (letters/digits + COMBINING MARKS + apostrophe) and pause
    punctuation.  ``\\w`` alone drops category-M marks, which shreds any
    script that writes vowels as combining signs (Devanagari matras,
    virama, Arabic harakat, decomposed Latin accents)."""
    import unicodedata as _ud

    toks: list[str] = []
    cur: list[str] = []

    def flush():
        if cur:
            t = "".join(cur).strip("-")
            if t:
                toks.append(t)
            cur.clear()

    for ch in text:
        if ch in "'-" or _ud.category(ch)[0] in ("L", "M", "N"):
            cur.append(ch)
        else:
            flush()
            if ch in ".,!?;:":
                toks.append(ch)
    flush()
    return toks


class GraphemeToPhonemizer:
    """Public G2P API (reference binding: GraphemeToPhonemizer;
    C ABI: moonshine-c-api.h:1140-1184)."""

    def __init__(
        self,
        language: str = "en",
        lexicon_path: str | None = None,
        oov_model=None,
        use_baked_dict: bool = True,
    ):
        """``oov_model``: a trained ``G2PTransformer`` (or a path to its
        safetensors artifact) consulted for words the lexicon misses —
        the neural-helper slot of the reference's G2P (reference:
        lang-specific/g2p-transformer-model.h, english-hand-oov.h).
        Lexicon hits always stay exact; rules remain the fallback when
        no model is given.

        ``use_baked_dict``: for English, consult the shipped 10,855-word
        real-pronunciation dictionary (tts/g2p_dict.py; reference:
        micro/g2p/src/g2p_dict_data.h) after the hand lexicon and before
        the neural/rule fallbacks.  Loads lazily; silently empty when the
        artifact is not mounted."""
        self.language = language
        self.engine = _make_engine(language)
        if lexicon_path:
            self.engine.add_lexicon(load_cmudict_lexicon(lexicon_path))
        if isinstance(oov_model, (str, Path)):
            from .g2p_transformer import G2PTransformer

            oov_model = G2PTransformer.load(oov_model)
        self.oov_model = oov_model
        self.baked_dict: dict[str, str] = {}
        if use_baked_dict and language.startswith("en"):
            from .g2p_dict import load_baked_dict

            self.baked_dict = load_baked_dict()

    def text_to_ipa(self, text: str, with_pauses: bool = True) -> str:
        normalized = normalize_text(text, self.language)
        tokens = _tokenize_words(normalized)
        words = [t for t in tokens if t not in _PUNCT_PAUSE]
        out: list[str] = []
        wi = 0
        prev_word: str | None = None  # last WORD (liaison spans punctuation,
        prev_word_idx = -1            # mirroring the reference's word list)
        liaison = getattr(self.engine, "liaison_pair", None)
        for token in tokens:
            if token in _PUNCT_PAUSE:
                if with_pauses and out:
                    out.append(_PUNCT_PAUSE[token])
                continue
            ipa = None
            if self.language.startswith("en"):
                from .lang_rules import resolve_heteronym

                prev_w = words[wi - 1] if wi > 0 else ""
                next_w = words[wi + 1] if wi + 1 < len(words) else ""
                ipa = resolve_heteronym(token, prev_w, next_w)
            if ipa is None:
                ipa = self.word_to_ipa(token)
            if (liaison is not None and prev_word is not None
                    and prev_word_idx >= 0 and ipa):
                out[prev_word_idx] = liaison(
                    prev_word, out[prev_word_idx], token, ipa)
            wi += 1
            if ipa:
                out.append(ipa)
                prev_word = token
                prev_word_idx = len(out) - 1
        return " ".join(out)

    def word_to_ipa(self, word: str) -> str:
        w = word.lower()
        if w not in self.engine.lexicon:
            if self.baked_dict:
                from .g2p_dict import normalize_word_key

                hit = self.baked_dict.get(normalize_word_key(w))
                if hit:
                    return hit
            if self.oov_model is not None:
                ipa = self.oov_model.predict(w)
                if ipa:
                    return ipa
        return self.engine.word_to_ipa(word)


def _lang_engine(name: str) -> Callable[[], "RuleG2P"]:
    def make():
        from . import lang_rules as lr

        return {
            "ru": lambda: lr.RussianG2P(),
            "uk": lambda: lr.UkrainianG2P(),
            "tr": lambda: lr.TurkishG2P(),
            "nl": lambda: lr.DutchG2P(),
            "vi": lambda: lr.VietnameseG2P(),
            "hi": lambda: lr.DevanagariG2P(),
            "ar": lambda: lr.ArabicG2P(),
            "ja": lambda: lr.KanaG2P(),
            "ko": lambda: lr.HangulG2P(),
            "zh": lambda: lr.PinyinG2P(),
        }[name]()

    return make


_ENGINES: dict[str, Callable[[], RuleG2P]] = {
    "en": lambda: RuleG2P(_EN_RULES, _EN_LEXICON),
    "es": lambda: __import__(
        "moonshine_tpu.tts.lang_rules", fromlist=["SpanishG2P"]
    ).SpanishG2P("es-MX"),
    "fr": lambda: __import__(
        "moonshine_tpu.tts.lang_rules", fromlist=["FrenchG2P"]
    ).FrenchG2P(),
    "de": lambda: __import__(
        "moonshine_tpu.tts.lang_rules", fromlist=["GermanG2P"]
    ).GermanG2P(),
    "it": lambda: __import__(
        "moonshine_tpu.tts.lang_rules", fromlist=["ItalianG2P"]
    ).ItalianG2P(),
    "pt": lambda: __import__(
        "moonshine_tpu.tts.lang_rules", fromlist=["PortugueseG2P"]
    ).PortugueseG2P(is_portugal=False),
    # The reference's remaining ten languages (reference:
    # core/moonshine-tts/src/lang-specific/) — rules in tts/lang_rules.py.
    **{k: _lang_engine(k) for k in ("ru", "uk", "tr", "nl", "vi", "hi", "ar", "ja", "ko", "zh")},
}

SUPPORTED_LANGUAGES = tuple(sorted(_ENGINES))


def _make_engine(language: str) -> RuleG2P:
    norm = language.lower().replace("-", "_")
    if norm in ("pt_pt", "pt_portugal"):
        from .lang_rules import PortugueseG2P

        return PortugueseG2P(is_portugal=True)
    if norm.startswith("es_") and norm != "es_419":
        from .lang_rules import SpanishG2P

        return SpanishG2P(norm)
    if norm == "es_419":
        from .lang_rules import SpanishG2P

        return SpanishG2P("es-419")
    factory = _ENGINES.get(language.split("_")[0].split("-")[0])
    if factory is None:
        raise ValueError(
            f"G2P language {language!r} not available; supported: {SUPPORTED_LANGUAGES}"
        )
    return factory()
