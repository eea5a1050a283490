"""Persistent XLA compilation cache wiring (VERDICT round-1 task 1a:
cache the streaming program set at load so restarts skip the compiles)."""

from __future__ import annotations

import os
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent

_PROBE = (
    "import moonshine_tpu, jax; "
    "print(jax.config.jax_compilation_cache_dir or '')"
)


def _run(env_extra: dict) -> str:
    env = dict(os.environ, PYTHONPATH=str(REPO), **env_extra)
    out = subprocess.run(
        [sys.executable, "-c", _PROBE], capture_output=True, text=True,
        timeout=300, env=env,
    )
    assert out.returncode == 0, out.stderr
    lines = out.stdout.strip().splitlines()
    return lines[-1] if lines else ""


def test_cache_enabled_by_default(tmp_path):
    d = _run({"MOONSHINE_TPU_PLATFORM": "cpu", "HOME": str(tmp_path)})
    assert d.endswith(os.path.join(".cache", "moonshine_tpu", "xla"))
    assert os.path.isdir(d)


def test_cache_dir_override(tmp_path):
    target = str(tmp_path / "xlacache")
    d = _run({
        "MOONSHINE_TPU_PLATFORM": "cpu",
        "MOONSHINE_TPU_COMPILE_CACHE": target,
    })
    assert d == target
    assert os.path.isdir(target)


def test_cache_disable(tmp_path):
    d = _run({
        "MOONSHINE_TPU_PLATFORM": "cpu",
        "MOONSHINE_TPU_COMPILE_CACHE": "off",
        "HOME": str(tmp_path),
    })
    assert d == ""
    assert not (tmp_path / ".cache" / "moonshine_tpu").exists()
