"""Public API + catalog + CLI tests."""

import numpy as np
import pytest

import moonshine_tpu as mt
from moonshine_tpu import catalog


def test_package_exports():
    assert hasattr(mt, "Transcriber")
    assert hasattr(mt, "BinTokenizer")
    assert mt.__version__


def test_catalog_listing():
    models = catalog.list_models()
    assert "tiny-en" in models
    assert "medium_streaming-en" in models
    import json

    payload = json.loads(catalog.catalog_json())
    assert payload["tiny-en"]["files"][0]["name"] == "model.safetensors"


def test_catalog_unknown_model():
    with pytest.raises(KeyError):
        catalog.resolve("nonexistent")


def test_catalog_missing_files(tmp_path):
    with pytest.raises(FileNotFoundError) as e:
        catalog.resolve("tiny", "en", search_dirs=[tmp_path])
    assert "model.safetensors" in str(e.value)


def test_catalog_resolves_local_dir(tmp_path):
    d = tmp_path / "m"
    d.mkdir()
    (d / "model.safetensors").write_bytes(b"x")
    (d / "tokenizer.bin").write_bytes(b"\x01a")
    r = catalog.resolve("tiny", "en", search_dirs=[d])
    assert r.path("model.safetensors").exists()


@pytest.fixture(scope="module")
def loaded_tiny(tokenizer_bin_path):
    t = mt.Transcriber(
        model="tiny",
        tokenizer_path=tokenizer_bin_path,
        options=mt.TranscriberOptions(vad=mt.VadOptions(threshold=0.0, max_segment_duration=3.0)),
    ).load()
    return t


def test_transcriber_requires_load(tokenizer_bin_path):
    t = mt.Transcriber(model="tiny", tokenizer_path=tokenizer_bin_path)
    with pytest.raises(RuntimeError):
        t.transcribe(np.zeros(16000, np.float32))


def test_end_to_end_transcribe(loaded_tiny):
    rng = np.random.default_rng(0)
    audio = rng.standard_normal(16000 * 2).astype(np.float32) * 0.1
    transcript = loaded_tiny.transcribe(audio)
    assert len(transcript.lines) >= 1
    assert transcript.lines[0].is_complete
    assert transcript.lines[0].text is not None


def test_stream_api(loaded_tiny):
    events = []
    stream = loaded_tiny.create_stream(update_interval=0.5)
    stream.add_listener(lambda e: events.append(type(e).__name__))
    stream.start()
    rng = np.random.default_rng(1)
    for _ in range(4):
        stream.add_audio(rng.standard_normal(8000).astype(np.float32) * 0.1)
    transcript = stream.stop()
    loaded_tiny.free_stream(stream)
    assert "LineCompleted" in events
    assert transcript.lines


def test_cli_models(capsys):
    from moonshine_tpu.cli import main

    assert main(["models"]) == 0
    out = capsys.readouterr().out
    assert "tiny-en" in out


def test_cli_transcribe(tmp_path, tokenizer_bin_path, capsys):
    from moonshine_tpu.audio.wav import save_wav
    from moonshine_tpu.cli import main

    rng = np.random.default_rng(2)
    wav = tmp_path / "t.wav"
    save_wav(str(wav), rng.standard_normal(16000).astype(np.float32) * 0.1, 16000)
    rc = main(
        [
            "transcribe",
            str(wav),
            "--model",
            "tiny",
            "--tokenizer",
            tokenizer_bin_path,
            "--vad-threshold",
            "0",
        ]
    )
    assert rc == 0
    out = capsys.readouterr().out
    assert "[" in out


def test_cli_g2p(capsys):
    from moonshine_tpu.cli import main

    assert main(["g2p", "hello world", "--language", "en"]) == 0
    out = capsys.readouterr().out.strip()
    assert out  # IPA produced
    assert "h" in out


def test_cli_tts(tmp_path, capsys):
    from moonshine_tpu.cli import main

    out = tmp_path / "x.wav"
    assert main(["tts", "hi", "-o", str(out)]) == 0
    assert out.exists()
    from moonshine_tpu.audio.wav import load_wav

    audio, sr = load_wav(str(out))
    assert sr == 24000
    assert audio.size > 0


def test_cli_agent(capsys, monkeypatch):
    import io

    from moonshine_tpu.cli import main

    monkeypatch.setattr("sys.stdin", io.StringIO("hello agent\nanything\n"))
    assert main(["agent", "--trigger", "hello agent"]) == 0
    out = capsys.readouterr().out
    assert "Say something" in out
    assert "You said: anything" in out


def test_cli_download_requires_base_url(capsys, monkeypatch):
    from moonshine_tpu.cli import main

    monkeypatch.delenv("MOONSHINE_TPU_MODEL_URL", raising=False)
    assert main(["download", "tiny"]) == 1
    assert "download failed" in capsys.readouterr().err


def test_transcriber_implicit_stream(tokenizer_bin_path):
    """Single-input convenience: the Transcriber exposes the Stream
    surface directly (reference: README 'the transcriber class includes
    the same methods (start/stop/add_audio) as a stream')."""
    import moonshine_tpu as mt

    t = mt.Transcriber(
        model="tiny", tokenizer_path=tokenizer_bin_path,
        options=mt.TranscriberOptions(
            vad=mt.VadOptions(threshold=0.0, max_segment_duration=1.0)
        ),
    ).load()
    rng = np.random.default_rng(3)
    events = []
    t.start()
    t.add_listener(lambda e: events.append(type(e).__name__))
    for _ in range(4):
        t.add_audio(rng.standard_normal(8000).astype(np.float32) * 0.1)
        t.update_transcription()
    transcript = t.stop()
    assert all(line.is_complete for line in transcript.lines)
    assert len(transcript.lines) >= 1
    assert "LineCompleted" in events
    # After stop, the implicit stream resets: usable again.
    t.start()
    t.add_audio(rng.standard_normal(8000).astype(np.float32) * 0.1)
    t.stop()
