"""Word alignment tests (reference: core/word-alignment-test.cpp intent)."""

import numpy as np
import pytest

from moonshine_tpu.core.tokenizer import BinTokenizer
from moonshine_tpu.pipeline.alignment import (
    align_words,
    dtw,
    median_filter,
    token_starts_new_word,
)


def make_tokenizer():
    sp = "▁".encode()
    tokens = [b"", b"<s>", b"</s>", sp + b"hello", sp + b"world", b"ing", sp + b"go"]
    return BinTokenizer(tokens)


# -- dtw -------------------------------------------------------------------

def test_dtw_identity_diagonal():
    n = 5
    cost = np.ones((n, n), np.float32)
    np.fill_diagonal(cost, 0.0)
    ti, fi = dtw(cost)
    assert ti[0] == 0 and fi[0] == 0
    assert ti[-1] == n - 1 and fi[-1] == n - 1
    # Optimal path follows the zero diagonal.
    on_diag = [(a, b) for a, b in zip(ti, fi) if a == b]
    assert len(on_diag) == n


def test_dtw_monotonic_path():
    rng = np.random.default_rng(0)
    cost = rng.random((6, 10)).astype(np.float32)
    ti, fi = dtw(cost)
    assert (np.diff(ti) >= 0).all()
    assert (np.diff(fi) >= 0).all()
    assert (np.diff(ti) + np.diff(fi) >= 1).all()


def test_dtw_reference_loop_oracle():
    """Compare against a direct transliteration of the reference loops."""

    def ref_dtw(cost):
        n, m = cost.shape
        D = np.full((n + 1, m + 1), np.inf, np.float32)
        D[0, 0] = 0.0
        trace = np.zeros((n, m), np.int8)
        for i in range(n):
            for j in range(m):
                c0, c1, c2 = D[i, j], D[i, j + 1], D[i + 1, j]
                if c0 <= c1 and c0 <= c2:
                    trace[i, j] = 0
                    mv = c0
                elif c1 <= c0 and c1 <= c2:
                    trace[i, j] = 1
                    mv = c1
                else:
                    trace[i, j] = 2
                    mv = c2
                D[i + 1, j + 1] = cost[i, j] + mv
        i, j = n - 1, m - 1
        ti, fi = [], []
        while i >= 0 or j >= 0:
            ti.append(i)
            fi.append(j)
            if i == 0 and j == 0:
                break
            d = trace[i, j]
            if d == 0:
                i, j = i - 1, j - 1
            elif d == 1:
                i -= 1
            else:
                j -= 1
        return np.asarray(ti[::-1]), np.asarray(fi[::-1])

    rng = np.random.default_rng(1)
    for shape in [(4, 7), (8, 8), (3, 12)]:
        cost = rng.random(shape).astype(np.float32)
        t1, f1 = dtw(cost)
        t2, f2 = ref_dtw(cost)
        np.testing.assert_array_equal(t1, t2)
        np.testing.assert_array_equal(f1, f2)


# -- median filter ---------------------------------------------------------

def test_median_filter_matches_reference_loops():
    def ref_filter(data, width):
        if width % 2 == 0:
            width += 1
        pad = width // 2
        c, h, w = data.shape
        out = data.copy()
        for ci in range(c):
            for hi in range(h):
                row = data[ci, hi]
                padded = np.zeros(w + 2 * pad, np.float32)
                for p in range(pad):
                    padded[p] = row[min(pad - p, w - 1)]
                padded[pad : pad + w] = row
                for p in range(pad):
                    padded[pad + w + p] = row[max(w - 2 - p, 0)]
                for wi in range(w):
                    out[ci, hi, wi] = np.median(padded[wi : wi + width])
        return out

    rng = np.random.default_rng(2)
    data = rng.random((2, 3, 20)).astype(np.float32)
    np.testing.assert_allclose(median_filter(data, 7), ref_filter(data, 7), atol=1e-6)


def test_median_filter_width_one_noop():
    x = np.random.default_rng(3).random((1, 2, 9)).astype(np.float32)
    np.testing.assert_array_equal(median_filter(x, 1), x)


# -- word grouping + timing ------------------------------------------------

def test_word_boundary_detection():
    tok = make_tokenizer()
    assert token_starts_new_word(tok, 3)
    assert token_starts_new_word(tok, 4)
    assert not token_starts_new_word(tok, 5)
    assert not token_starts_new_word(tok, 999)


def test_align_words_synthetic_attention():
    """Attention concentrated on distinct frame bands must produce ordered,
    non-overlapping word timings."""
    tok = make_tokenizer()
    # tokens: BOS, ▁hello, ▁go, ing, EOS -> words "hello", "going"
    tokens = [1, 3, 6, 5, 2]
    n_steps, frames = 4, 20
    att = np.zeros((2, n_steps, frames), np.float32)
    att[:, 0, 2:6] = 1.0  # ▁hello -> frames 2-5
    att[:, 1, 8:12] = 1.0  # ▁go -> frames 8-11
    att[:, 2, 12:16] = 1.0  # ing -> frames 12-15
    att[:, 3, 18:] = 1.0  # EOS step
    time_per_frame = 0.1
    words = align_words(att, tokens, time_per_frame, tok)
    assert [w.text for w in words] == ["hello", "going"]
    # Ordered, non-overlapping, within the clip (DTW paths start at (0,0),
    # so the first word's start is pinned to 0 — same as the reference).
    assert words[0].start < words[0].end <= words[1].start < words[1].end
    assert words[0].end >= 0.5  # covers the hello band (frames 2-5)
    assert words[1].end <= frames * time_per_frame


def test_align_words_empty_inputs():
    tok = make_tokenizer()
    assert align_words(np.zeros((2, 0, 5), np.float32), [1, 2], 0.1, tok) == []
    assert align_words(np.zeros((2, 3, 5), np.float32), [1, 2], 0.1, tok) == []


def test_overlap_snapping():
    tok = make_tokenizer()
    tokens = [1, 3, 4, 2]
    att = np.zeros((1, 3, 10), np.float32)
    # Both words attend to overlapping frames.
    att[:, 0, 3:7] = 1.0
    att[:, 1, 4:8] = 1.0
    att[:, 2, 9:] = 1.0
    words = align_words(att, tokens, 0.1, tok)
    assert len(words) == 2
    assert words[0].end <= words[1].start + 1e-6
