"""AlphanumericListener + extended matcher surfaces.

Mirrors the reference listener's behavior (reference:
language-bindings/python/src/moonshine_voice/alphanumeric_listener.py):
sequence classification, custom words, class filters, spoken_form, line
deduplication, TTS echo/error feedback, undo/clear/stop dispatch.
"""

from moonshine_tpu.agent.alphanumeric import AlphanumericListener
from moonshine_tpu.core.types import TranscriptLine
from moonshine_tpu.pipeline.spelling import (
    SpellingMatcher,
    SpellingMatchType,
    digits_only_matcher,
    letters_only_matcher,
    spoken_form,
)
from moonshine_tpu.pipeline.transcriber import LineCompleted, LineTextChanged


def _completed(line_id, text):
    return LineCompleted(
        line=TranscriptLine(id=line_id, text=text, is_complete=True), stream_id=0
    )


# -- matcher extensions -----------------------------------------------------


def test_classify_sequence_per_token_fallback():
    m = SpellingMatcher()
    seq = m.classify_sequence("h o m e")
    assert [s.character for s in seq] == ["h", "o", "m", "e"]
    assert all(s.type == SpellingMatchType.CHARACTER for s in seq)


def test_classify_sequence_whole_utterance_wins():
    m = SpellingMatcher()
    # "forty two" resolves whole as the number 42 — no per-token fallback.
    seq = m.classify_sequence("forty two")
    assert len(seq) == 1 and seq[0].character == "42"


def test_classify_sequence_stops_after_stop():
    m = SpellingMatcher()
    seq = m.classify_sequence("a stop b")
    assert seq[0].character == "a"
    assert seq[1].type == SpellingMatchType.STOPPED
    assert len(seq) == 2  # "b" never classified


def test_classify_sequence_single_token_none():
    m = SpellingMatcher()
    seq = m.classify_sequence("flurble")
    assert len(seq) == 1 and seq[0].type == SpellingMatchType.NONE


def test_custom_words_override():
    m = SpellingMatcher(custom_words={"smiley": ":)", "Bee": "8"})
    assert m.classify("smiley").character == ":)"
    # Custom word overrides the built-in letter homophone.
    assert m.classify("bee").character == "8"
    # Built-ins unaffected for other keys.
    assert m.classify("sea").character == "c"


def test_letters_only_matcher_filters():
    m = letters_only_matcher()
    assert m.classify("bravo").character == "b"
    assert m.classify("seven").type == SpellingMatchType.NONE
    assert m.classify("hash").type == SpellingMatchType.NONE
    # Commands still pass.
    assert m.classify("stop").type == SpellingMatchType.STOPPED


def test_digits_only_matcher_filters():
    m = digits_only_matcher()
    assert m.classify("seven").character == "7"
    assert m.classify("forty two").character == "42"
    assert m.classify("bravo").type == SpellingMatchType.NONE
    assert m.classify("comma").type == SpellingMatchType.NONE


def test_spoken_form():
    assert spoken_form("h") == "haitch"
    assert spoken_form("H") == "capital haitch"
    assert spoken_form("w") == "double you"
    assert spoken_form("1") == "one"
    assert spoken_form("#") == "hash"
    assert spoken_form(" ") == "space"
    assert spoken_form("é") == "é"  # unknown letter: lowercase passthrough
    assert spoken_form("42") == "42"  # multi-char passthrough


# -- listener ----------------------------------------------------------------


def test_listener_assembles_from_completed_lines():
    events = []
    lst = AlphanumericListener(events.append)
    lst(_completed(0, "bravo"))
    lst(_completed(1, "Oscar"))
    lst(_completed(2, "bee"))
    assert lst.text == "bob"
    assert [e.action for e in events] == ["append"] * 3
    assert events[-1].buffer == "bob"


def test_listener_dedupes_line_ids():
    events = []
    lst = AlphanumericListener(events.append)
    lst(_completed(0, "a"))
    lst(_completed(0, "a"))  # same line re-emitted
    assert lst.text == "a"
    assert len(events) == 1


def test_listener_ignores_text_changed_by_default():
    events = []
    lst = AlphanumericListener(events.append)
    ev = LineTextChanged(line=TranscriptLine(id=0, text="a"), stream_id=0)
    lst(ev)
    assert lst.text == ""
    lst2 = AlphanumericListener(events.append, use_line_completed=False)
    lst2(ev)
    assert lst2.text == "a"


def test_listener_stop_clear_undo():
    events = []
    lst = AlphanumericListener(events.append)
    lst(_completed(0, "a"))
    lst(_completed(1, "bee"))
    lst(_completed(2, "undo"))
    assert lst.text == "a"
    lst(_completed(3, "sea"))
    lst(_completed(4, "clear"))
    assert lst.text == ""
    lst(_completed(5, "x"))
    lst(_completed(6, "done"))
    assert lst.stopped
    lst(_completed(7, "y"))  # ignored after stop
    assert lst.text == "x"
    assert [e.action for e in events] == [
        "append", "append", "undo", "append", "clear", "append", "stop",
    ]


def test_listener_multichar_token_undoes_atomically():
    lst = AlphanumericListener(lambda e: None)
    lst(_completed(0, "forty two"))
    assert lst.text == "42"
    assert lst.undo() == "42"
    assert lst.text == ""
    assert lst.undo() is None


def test_listener_raw_single_codepoint_fallback():
    # Spelling-fusion writes bare specials into line.text; the normalizer
    # strips them, so the listener must fall back to the raw codepoint.
    lst = AlphanumericListener(lambda e: None)
    lst(_completed(0, "."))
    assert lst.text == "."


class _StubTTS:
    def __init__(self, fail=False):
        self.said = []
        self.errors = 0
        self.fail = fail

    def say(self, text):
        if self.fail:
            raise RuntimeError("tts down")
        self.said.append(text)

    def play_error(self):
        self.errors += 1


def test_listener_tts_echo_and_error_feedback():
    tts = _StubTTS()
    lst = AlphanumericListener(lambda e: None, tts=tts)
    lst(_completed(0, "haitch"))
    lst(_completed(1, "upper case bee"))
    lst(_completed(2, "flurble"))  # unrecognized -> error beep
    assert tts.said == ["haitch", "capital bee"]
    assert tts.errors == 1


def test_listener_tts_failure_does_not_break_dictation():
    tts = _StubTTS(fail=True)
    lst = AlphanumericListener(lambda e: None, tts=tts)
    lst(_completed(0, "a"))
    assert lst.text == "a"


def test_listener_custom_matcher_and_clear_resets_stop():
    lst = AlphanumericListener(lambda e: None, matcher=digits_only_matcher())
    lst(_completed(0, "bravo"))
    lst(_completed(1, "nine"))
    assert lst.text == "9"
    lst(_completed(2, "stop"))
    assert lst.stopped
    lst.clear()
    assert not lst.stopped and lst.text == ""
    lst(_completed(3, "one"))
    assert lst.text == "1"
