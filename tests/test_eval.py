"""Eval harness tests: WER math, dataset iteration, latency bench."""

import numpy as np
import pytest

from moonshine_tpu.eval.wer import corpus_wer, edit_distance, normalize


def test_edit_distance_basics():
    assert edit_distance([], []) == 0
    assert edit_distance(["a"], []) == 1
    assert edit_distance([], ["a", "b"]) == 2
    assert edit_distance(["a", "b", "c"], ["a", "b", "c"]) == 0
    assert edit_distance(["a", "b", "c"], ["a", "x", "c"]) == 1
    assert edit_distance(["a", "b"], ["b", "a"]) == 2
    assert edit_distance("kitten".split(), "sitting".split()) == 1


def test_corpus_wer_sums_over_corpus():
    refs = ["the cat sat", "on the mat"]
    hyps = ["the cat sat", "on a mat"]
    out = corpus_wer(refs, hyps, use_normalizer=False)
    assert out["errors"] == 1
    assert out["words"] == 6
    assert out["wer"] == pytest.approx(1 / 6)


def test_normalizer_canonicalizes():
    # Whisper normalizer: case, punctuation, number words.
    a = normalize("Hello, World!")
    b = normalize("hello world")
    assert a == b


def test_corpus_wer_with_normalizer_forgives_formatting():
    refs = ["IT WAS THE BEST OF TIMES"]
    hyps = ["It was the best of times."]
    out = corpus_wer(refs, hyps)
    assert out["wer"] == 0.0


def test_librispeech_iteration(tmp_path):
    from moonshine_tpu.audio.wav import save_wav
    from moonshine_tpu.eval.librispeech import iter_librispeech

    d = tmp_path / "19" / "198"
    d.mkdir(parents=True)
    rng = np.random.default_rng(0)
    with open(d / "19-198.trans.txt", "w") as f:
        for i in range(3):
            utt = f"19-198-{i:04d}"
            save_wav(str(d / f"{utt}.wav"), rng.standard_normal(8000).astype(np.float32) * 0.1, 16000)
            f.write(f"{utt} SOME WORDS HERE {i}\n")
    utts = list(iter_librispeech(tmp_path))
    assert len(utts) == 3
    assert utts[0].text.startswith("SOME WORDS")
    audio = utts[0].load_audio()
    assert audio.shape == (8000,)
    assert len(list(iter_librispeech(tmp_path, limit=2))) == 2


def test_evaluate_smoke(tmp_path, tokenizer_bin_path):
    import jax

    from moonshine_tpu.audio.wav import save_wav
    from moonshine_tpu.core.config import MoonshineArchConfig
    from moonshine_tpu.core.tokenizer import BinTokenizer
    from moonshine_tpu.eval.librispeech import evaluate
    from moonshine_tpu.models import moonshine as mm

    cfg = MoonshineArchConfig(
        name="evaltest",
        vocab_size=32768,
        hidden_size=64,
        intermediate_size=128,
        encoder_layers=1,
        decoder_layers=1,
        encoder_heads=4,
        decoder_heads=4,
        encoder_kv_heads=4,
        decoder_kv_heads=4,
    )
    params = mm.init_params(cfg, jax.random.PRNGKey(0))
    tok = BinTokenizer.from_file(tokenizer_bin_path)

    d = tmp_path / "1" / "2"
    d.mkdir(parents=True)
    rng = np.random.default_rng(1)
    with open(d / "1-2.trans.txt", "w") as f:
        for i in range(4):
            utt = f"1-2-{i:04d}"
            save_wav(str(d / f"{utt}.wav"), rng.standard_normal(16000).astype(np.float32) * 0.1, 16000)
            f.write(f"{utt} HELLO WORLD\n")

    out = evaluate(params, cfg, tok, str(tmp_path), batch_size=2)
    assert out["utterances"] == 4
    assert 0.0 <= out["wer"]
    assert out["audio_seconds"] == pytest.approx(4.0)
    assert out["audio_seconds_per_second"] > 0


def test_latency_bench(tmp_path):
    from moonshine_tpu.audio.wav import save_wav
    from moonshine_tpu.core.config import TranscriberOptions, VadOptions
    from moonshine_tpu.eval.latency import run_latency_bench
    from moonshine_tpu.pipeline.backends import FakeBackend
    from moonshine_tpu.pipeline.transcriber import Transcriber

    rng = np.random.default_rng(2)
    wav = tmp_path / "x.wav"
    save_wav(str(wav), rng.standard_normal(32000).astype(np.float32) * 0.1, 16000)

    t = Transcriber(
        FakeBackend(),
        TranscriberOptions(vad=VadOptions(threshold=0.0, max_segment_duration=1.0)),
    )
    out = run_latency_bench(t, str(wav), update_interval=0.25)
    assert out["completed_lines"] >= 1
    assert out["compute_seconds"] > 0
    assert out["audio_seconds"] == pytest.approx(2.0)


def test_fleurs_harness(tmp_path, tokenizer_bin_path):
    import jax

    from moonshine_tpu.audio.wav import save_wav
    from moonshine_tpu.core.config import MoonshineArchConfig
    from moonshine_tpu.core.tokenizer import BinTokenizer
    from moonshine_tpu.eval.fleurs import corpus_cer, evaluate_languages
    from moonshine_tpu.models import moonshine as mm

    assert corpus_cer(["abc"], ["abd"]) == pytest.approx(1 / 3)
    assert corpus_cer(["ab cd"], ["abcd"]) == 0.0  # spaces ignored

    cfg = MoonshineArchConfig(
        name="fleurstest", vocab_size=32768, hidden_size=64,
        intermediate_size=128, encoder_layers=1, decoder_layers=1,
        encoder_heads=4, decoder_heads=4, encoder_kv_heads=4, decoder_kv_heads=4,
    )
    params = mm.init_params(cfg, jax.random.PRNGKey(0))
    tok = BinTokenizer.from_file(tokenizer_bin_path)
    rng = np.random.default_rng(0)
    for lang in ("es", "zh"):
        d = tmp_path / lang / "1" / "2"
        d.mkdir(parents=True)
        with open(d / "1-2.trans.txt", "w") as f:
            for i in range(2):
                utt = f"1-2-{i:04d}"
                save_wav(str(d / f"{utt}.wav"), rng.standard_normal(8000).astype(np.float32) * 0.1, 16000)
                f.write(f"{utt} SOME WORDS\n")
    table = evaluate_languages(
        lambda lang: (params, cfg, tok), tmp_path, batch_size=2
    )
    assert set(table) == {"es", "zh"}
    assert table["es"]["metric"] == "wer"
    assert table["zh"]["metric"] == "cer"
    assert "cer" in table["zh"]
