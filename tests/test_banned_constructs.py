"""Banned-construct gate (reference: scripts/check-banned-constructs.sh).

The library source must stay free of constructs that have bitten this
platform: non-fencing block_until_ready, unseeded module-level RNG,
wall-clock interval timing, silent f64 downcasts, pickle loads, shell
strings, eval/exec.  The gate script documents each ban's rationale.
"""

from __future__ import annotations

import subprocess
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def test_library_passes_banned_construct_gate():
    res = subprocess.run(
        ["bash", str(REPO / "scripts" / "check_banned_constructs.sh")],
        capture_output=True, text=True, timeout=120,
    )
    assert res.returncode == 0, f"banned constructs found:\n{res.stdout}{res.stderr}"


def test_gate_actually_detects(tmp_path):
    """The gate must FAIL when a banned construct is present (guards
    against the checker itself rotting into a no-op)."""
    import shutil

    work = tmp_path / "repo"
    (work / "scripts").mkdir(parents=True)
    shutil.copy(
        REPO / "scripts" / "check_banned_constructs.sh",
        work / "scripts" / "check_banned_constructs.sh",
    )
    lib = work / "moonshine_tpu"
    lib.mkdir()
    (lib / "bad.py").write_text(
        "import time\n"
        "def f(x):\n"
        "    t0 = time.time()\n"
        "    x.block_until_ready()\n"
        "    return time.time() - t0\n"
    )
    res = subprocess.run(
        ["bash", str(work / "scripts" / "check_banned_constructs.sh")],
        capture_output=True, text=True, timeout=120,
    )
    assert res.returncode != 0
    assert "block_until_ready" in res.stdout
