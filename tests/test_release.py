"""Release pipeline (SURVEY §2.6 analog): the wheel must build and the
manifest must carry checksums for every artifact."""

from __future__ import annotations

import json
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]


def test_wheel_builds_and_manifest(tmp_path):
    out = tmp_path / "dist"
    out.mkdir()
    subprocess.run(
        [sys.executable, "-m", "pip", "wheel", "--no-deps",
         "--no-build-isolation", "-w", str(out), str(REPO)],
        check=True, capture_output=True, timeout=300,
    )
    wheels = list(out.glob("moonshine_tpu-*.whl"))
    assert len(wheels) == 1
    # the wheel must pack the package AND the native runtime sources
    import zipfile

    names = zipfile.ZipFile(wheels[0]).namelist()
    assert any(n.endswith("moonshine_client.cpp") for n in names), (
        "native runtime sources must ship in the wheel (compiled on the "
        "target host at first use)")
    assert any(n.endswith("tts/data/ja_core_words.tsv") for n in names), (
        "authored data tables must ship")
