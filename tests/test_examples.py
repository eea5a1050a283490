"""Run the examples as real subprocesses (reference: scripts/test-examples.sh
drives the example apps in CI so they can't rot)."""

from __future__ import annotations

import os
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

REPO = Path(__file__).resolve().parents[1]


def _run(args, stdin: str | None = None, timeout: int = 420) -> str:
    env = dict(os.environ)
    env["MOONSHINE_TPU_PLATFORM"] = "cpu"  # sitecustomize ignores JAX_PLATFORMS
    out = subprocess.run(
        [sys.executable, *args], cwd=REPO, env=env, input=stdin,
        capture_output=True, text=True, timeout=timeout,
    )
    assert out.returncode == 0, out.stderr[-3000:]
    return out.stdout


@pytest.fixture(scope="module")
def wav_path(tmp_path_factory):
    from moonshine_tpu.audio.wav import save_wav

    d = tmp_path_factory.mktemp("examples")
    p = d / "in.wav"
    rng = np.random.default_rng(0)
    save_wav(str(p), rng.standard_normal(16000).astype(np.float32) * 0.1, 16000)
    return str(p)


def test_transcribe_file_example(wav_path, tokenizer_bin_path):
    out = _run([
        "examples/transcribe_file.py", wav_path,
        "--model", "tiny", "--tokenizer", tokenizer_bin_path,
        "--vad-threshold", "0",
    ])
    assert "[" in out  # timestamped lines printed


def test_streaming_events_example(wav_path, tokenizer_bin_path):
    out = _run([
        "examples/streaming_events.py", wav_path,
        "--model", "tiny", "--tokenizer", tokenizer_bin_path,
        "--vad-threshold", "0",
    ])
    assert "started" in out or "complete" in out.lower()


def test_agent_demo_example():
    out = _run(["examples/agent_demo.py"], stdin="set a timer\n5\nyes\n")
    assert "How many minutes" in out
    assert "Timer set" in out


def test_serve_pool_example(wav_path):
    out = _run([
        "examples/serve_pool.py", wav_path,
        "--streams", "4", "--cohorts", "2", "--seconds", "3",
        "--update-seconds", "0.5",
    ])
    assert "warmup:" in out
    assert "cohort 0" in out and "cohort 1" in out
    assert "finalized segments across 4 streams" in out


def test_micro_demo_example(tmp_path):
    """The rp2350-demo analog: VAD -> SpellingCNN -> Klatt TTS round trip
    (self-test mode speaks 'bee' through the formant voice first)."""
    if not Path("/root/reference/micro/models").exists():
        pytest.skip("reference micro models unavailable")
    out_wav = tmp_path / "reply.wav"
    out = _run(["examples/micro_demo.py", "--out", str(out_wav)])
    assert "VAD span" in out
    # a REAL round trip: the formant-spoken "eight" must classify as '8'
    assert "SpellingCNN: char='8'" in out
    assert out_wav.exists()
    from moonshine_tpu.audio.wav import load_wav

    reply, sr = load_wav(str(out_wav))
    assert sr == 22050 and len(reply) > 8000
