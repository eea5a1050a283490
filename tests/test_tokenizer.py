"""BinTokenizer golden tests against the reference tokenizer.bin format
(reference: core/bin-tokenizer/bin-tokenizer.cpp, tests mirror
core/bin-tokenizer/bin-tokenizer-test.cpp intent)."""

import pytest

from moonshine_tpu.core.tokenizer import BinTokenizer


def make_toy_tokenizer():
    # id 0: empty (invalid), id 1: <s>, 2: </s>, then bytes and merges.
    tokens = [b"", b"<s>", b"</s>", "▁".encode(), b"a", b"b", b"ab", "▁a".encode(), b"hello"]
    return BinTokenizer(tokens)


def test_roundtrip_wire_format():
    tok = make_toy_tokenizer()
    data = tok.to_bytes()
    tok2 = BinTokenizer.from_bytes(data)
    assert tok2.tokens_to_bytes == tok.tokens_to_bytes


def test_wire_format_long_token():
    long_tok = b"x" * 300
    tok = BinTokenizer([b"", long_tok])
    tok2 = BinTokenizer.from_bytes(tok.to_bytes())
    assert tok2.tokens_to_bytes[1] == long_tok


def test_longest_match_encoding():
    tok = make_toy_tokenizer()
    # "ab" should match the merged token 6, not 4+5.
    assert tok.text_to_tokens("ab") == [6]
    # " a b" -> ▁a (merged), ▁, b
    assert tok.text_to_tokens(" a b") == [7, 3, 5]


def test_encode_decode_roundtrip():
    tok = make_toy_tokenizer()
    assert tok.tokens_to_text(tok.text_to_tokens("a ab b")) == "a ab b"


def test_specials_skipped():
    tok = make_toy_tokenizer()
    assert tok.tokens_to_text([1, 4, 2]) == "a"
    assert tok.tokens_to_text([1, 4, 2], skip_specials=False) == "<s>a</s>"


def test_special_token_lookup():
    tok = make_toy_tokenizer()
    assert tok.text_to_special_token("<s>") == 1
    with pytest.raises(ValueError):
        tok.text_to_special_token("ab ab")


def test_invalid_token_raises():
    tok = make_toy_tokenizer()
    with pytest.raises(ValueError):
        tok.tokens_to_text([0])


def test_truncated_data_raises():
    tok = make_toy_tokenizer()
    data = tok.to_bytes()
    with pytest.raises(ValueError):
        BinTokenizer.from_bytes(data[:-1])


# -- real tokenizer.bin ----------------------------------------------------

def test_real_tokenizer_loads(tokenizer_bin_path):
    tok = BinTokenizer.from_file(tokenizer_bin_path)
    assert tok.vocab_size == 32768


def test_real_tokenizer_roundtrip(tokenizer_bin_path):
    tok = BinTokenizer.from_file(tokenizer_bin_path)
    for text in (
        "hello world",
        "It was the best of times, it was the worst of times.",
        "alphanumeric A1B2 C3",
    ):
        ids = tok.text_to_tokens(text)
        assert tok.tokens_to_text(ids) == text


def test_real_tokenizer_specials(tokenizer_bin_path):
    tok = BinTokenizer.from_file(tokenizer_bin_path)
    # BOS/EOS ids per streaming_config (bos_id 1, eos_id 2,
    # reference: core/moonshine-streaming-model.h:24-25).
    assert tok.tokens_to_bytes[1].startswith(b"<")
    assert tok.tokens_to_bytes[2].startswith(b"<")
