"""Byte-level tokenizer reading the reference ``tokenizer.bin`` format.

Format (reference: core/bin-tokenizer/bin-tokenizer.cpp:12-48): a flat
sequence of length-prefixed byte strings, one per token id, in id order.
A zero first byte encodes an empty (invalid/padding) token.  Lengths < 128
are one byte; otherwise ``len = second*128 + first - 128``.

Decoding skips special tokens (``<...>`` wrappers), maps the "▁" word
boundary back to spaces, and trims (reference: bin-tokenizer.cpp:226-246).
Encoding is greedy longest-match over the vocabulary, identical in output
to the reference's scan (bin-tokenizer.cpp:172-216) but backed by a prefix
index so it runs in O(len * max_token_len) instead of O(len * vocab).
"""

from __future__ import annotations

import os
from typing import Iterable, Sequence

SPACE_STRING = "▁"  # "▁"


class BinTokenizer:
    """Token-id <-> byte-string mapping with reference-equivalent semantics."""

    def __init__(self, tokens_to_bytes: list[bytes], space_string: str = SPACE_STRING):
        if not tokens_to_bytes:
            raise ValueError("No tokens found in tokenizer data")
        self.tokens_to_bytes = tokens_to_bytes
        self.space_string = space_string
        self._space_bytes = space_string.encode("utf-8")
        # Longest-match index: map first byte -> list of (bytes, id) sorted by
        # descending length, so the first prefix hit is the longest match.
        index: dict[int, list[tuple[bytes, int]]] = {}
        for tok_id, bs in enumerate(tokens_to_bytes):
            if not bs:
                continue
            index.setdefault(bs[0], []).append((bs, tok_id))
        for entries in index.values():
            # Stable sort keeps the lowest id among equal byte strings first,
            # matching the reference's first-longest-match scan order.
            entries.sort(key=lambda e: -len(e[0]))
        self._index = index
        self._max_len = max((len(b) for b in tokens_to_bytes), default=0)

    # -- construction ------------------------------------------------------

    @classmethod
    def from_bytes(cls, data: bytes, space_string: str = SPACE_STRING) -> "BinTokenizer":
        tokens: list[bytes] = []
        off = 0
        n = len(data)
        while off < n:
            first = data[off]
            off += 1
            if first == 0:
                tokens.append(b"")
                continue
            if first < 128:
                count = first
            else:
                if off >= n:
                    raise ValueError(f"Truncated tokenizer data: missing length byte at offset {off}")
                count = data[off] * 128 + first - 128
                off += 1
            if count > n - off:
                raise ValueError(
                    f"Truncated tokenizer data: token of {count} bytes at offset {off} "
                    f"exceeds input size {n}"
                )
            tokens.append(data[off : off + count])
            off += count
        return cls(tokens, space_string)

    @classmethod
    def from_file(cls, path: str | os.PathLike, space_string: str = SPACE_STRING) -> "BinTokenizer":
        with open(path, "rb") as f:
            return cls.from_bytes(f.read(), space_string)

    def to_bytes(self) -> bytes:
        """Serialize back to the tokenizer.bin wire format."""
        out = bytearray()
        for bs in self.tokens_to_bytes:
            n = len(bs)
            if n == 0:
                out.append(0)
                continue
            if n < 128:
                out.append(n)
            else:
                if n >= 128 * 256:
                    raise ValueError(f"Token too long for wire format: {n} bytes")
                out.append((n % 128) + 128)
                out.append(n // 128)
            out += bs
        return bytes(out)

    # -- core API (reference: bin-tokenizer.h:12-31) -----------------------

    @property
    def vocab_size(self) -> int:
        return len(self.tokens_to_bytes)

    def text_to_tokens(self, text: str) -> list[int]:
        data = text.replace(" ", self.space_string).encode("utf-8")
        out: list[int] = []
        pos = 0
        n = len(data)
        while pos < n:
            entries = self._index.get(data[pos], ())
            match_id = -1
            match_len = 0
            for bs, tok_id in entries:
                if data.startswith(bs, pos):
                    match_id, match_len = tok_id, len(bs)
                    break
            if match_id < 0:
                raise ValueError(
                    f"No token match for bytes {data[pos:pos+16]!r} at offset {pos}"
                )
            out.append(match_id)
            pos += match_len
        return out

    def tokens_to_text(self, tokens: Iterable[int], skip_specials: bool = True) -> str:
        parts: list[bytes] = []
        for tok in tokens:
            tok = int(tok)
            bs = self.tokens_to_bytes[tok]
            if len(bs) == 0:
                raise ValueError(f"Invalid token {tok}")
            if skip_specials and len(bs) > 2 and bs[0] == ord("<") and bs[-1] == ord(">"):
                continue
            parts.append(bs)
        text = b"".join(parts).decode("utf-8", errors="replace")
        return text.replace(self.space_string, " ").strip()

    def text_to_special_token(self, text: str) -> int:
        tokens = self.text_to_tokens(text)
        if len(tokens) != 1:
            raise ValueError(f"Expected 1 token, got {len(tokens)} for text {text!r}")
        return tokens[0]
