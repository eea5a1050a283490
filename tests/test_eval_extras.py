"""Alphanumeric + speaker-id eval harness tests."""

import numpy as np
import pytest

from moonshine_tpu.eval.speaker_id import equal_error_rate, evaluate_pairs


def test_eer_perfect_separation():
    scores = np.asarray([0.9, 0.8, 0.95, 0.1, 0.2, 0.05])
    labels = np.asarray([1, 1, 1, 0, 0, 0])
    assert equal_error_rate(scores, labels) == pytest.approx(0.0, abs=1e-9)


def test_eer_random_scores():
    rng = np.random.default_rng(0)
    scores = rng.random(2000)
    labels = rng.integers(0, 2, 2000)
    eer = equal_error_rate(scores, labels)
    assert 0.4 < eer < 0.6  # chance level


def test_eer_degenerate():
    assert equal_error_rate(np.asarray([0.5]), np.asarray([1])) == 0.0


def test_evaluate_pairs_with_synthetic_embedder():
    rng = np.random.default_rng(1)
    speakers = {s: rng.normal(0, 1, 32) for s in "abcd"}

    def embed(audio_key):
        s, noise_seed = audio_key
        noise = np.random.default_rng(noise_seed).normal(0, 0.1, 32)
        return speakers[s] + noise

    pairs = []
    for i in range(20):
        s = "abcd"[i % 4]
        pairs.append(((s, i), (s, 100 + i), True))
        t = "abcd"[(i + 1) % 4]
        pairs.append(((s, 200 + i), (t, 300 + i), False))
    out = evaluate_pairs(embed, pairs)
    assert out["trials"] == 40
    assert out["eer"] < 0.1  # clean synthetic clusters separate


def test_alphanumeric_eval(tmp_path):
    from moonshine_tpu.audio.wav import save_wav
    from moonshine_tpu.eval.alphanumeric import evaluate

    rng = np.random.default_rng(2)
    # Classes 'b' and 'five' with 2 clips each.
    for label in ("b", "five"):
        d = tmp_path / label
        d.mkdir()
        for i in range(2):
            save_wav(str(d / f"{i}.wav"), rng.standard_normal(16000).astype(np.float32) * 0.1, 16000)

    # Scripted ASR: transcribes 'b' clips as "bee", 'five' clips wrong.
    state = {"i": 0}

    def transcribe(audio):
        state["i"] += 1
        return "bee" if state["i"] <= 2 else "wrong words"

    out = evaluate(tmp_path, transcribe, class_to_char={"b": "b", "five": "5"})
    assert out["total"] == 4
    assert out["per_class"]["b"]["accuracy"] == 1.0
    assert out["per_class"]["five"]["accuracy"] == 0.0
    assert out["accuracy"] == 0.5


class TestTtsIntelligibility:
    def test_perfect_roundtrip_is_zero_cer(self):
        from moonshine_tpu.eval import tts_intelligibility as ti

        store = {}

        def synth(text):
            wav = np.zeros(2400, np.float32)
            store[id(wav)] = text
            store["last"] = text
            return wav, 24000

        def asr(wav, sr):
            return store["last"]

        res = ti.evaluate(synth, asr, sentences=("hello there", "good day"))
        assert res.cer == 0.0
        assert res.summary().startswith("G2P intelligibility CER: 0.0%")

    def test_cer_counts_character_edits(self):
        from moonshine_tpu.eval import tts_intelligibility as ti

        def synth(text):
            return np.zeros(10, np.float32), 24000

        # ASR drops one character from a 10-char (space-stripped) ref.
        res = ti.evaluate(
            synth, lambda wav, sr: "helloworl", sentences=("hello world",)
        )
        assert res.cer == pytest.approx(1 / 10)

    def test_normalization_applies(self):
        from moonshine_tpu.eval import tts_intelligibility as ti

        def synth(text):
            return np.zeros(10, np.float32), 24000

        # Case/punctuation differences normalize away.
        res = ti.evaluate(
            synth, lambda wav, sr: "Hello, World!", sentences=("hello world",)
        )
        assert res.cer == 0.0


def test_lane_aligned_bucketing():
    """Eval buckets sit at 128-aligned encoder frame counts (the +10.5%
    lane-alignment result, docs/PERF.md) with a finer ladder than the old
    whole-second buckets."""
    import numpy as np

    from moonshine_tpu.core.config import ARCHS
    from moonshine_tpu.eval.librispeech import _buckets
    from moonshine_tpu.models.moonshine import (
        frames_for_samples,
        lane_aligned_samples,
    )

    cfg = ARCHS["base"]

    class U:  # minimal utterance stand-in
        pass

    utts = [
        (U(), np.zeros(int(16000 * d), np.float32))
        for d in (1.0, 3.9, 4.1, 8.0, 9.3, 10.0, 15.0)
    ]
    seen = []
    for n, items in _buckets(cfg, utts, batch_size=4):
        f = frames_for_samples(cfg, n)
        assert f % 128 == 0
        assert all(len(a) <= n for _, a in items)
        seen.append(f)
    assert seen == sorted(seen) and len(seen) >= 5  # finer than 4/8/16/32 s
    # Helper invariants: minimal aligned padding.
    for secs in (1, 4, 8, 10, 16):
        n = lane_aligned_samples(cfg, secs * 16000)
        assert frames_for_samples(cfg, n) % 128 == 0
        assert n >= secs * 16000
