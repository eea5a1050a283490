"""Execute README code blocks marked ``<!-- doc-test: name -->``.

Reference parity: the reference runs its README's annotated code blocks as
tests (reference: scripts/test-docs.sh + language-bindings/python/tests/
test_docs.py, README.md doc-test annotations) so the documentation can
never drift from the API.  The runner materializes the assets the blocks
name (``tokenizer.bin``, ``speech.wav``) in the working directory.
"""

from __future__ import annotations

import re
import shutil
from pathlib import Path

import numpy as np
import pytest

README = Path(__file__).resolve().parents[1] / "README.md"

_BLOCK_RE = re.compile(
    r"<!--\s*doc-test:\s*(?P<name>[\w-]+)\s*-->\s*```python\n(?P<code>.*?)```",
    re.DOTALL,
)


def _blocks() -> list[tuple[str, str]]:
    text = README.read_text()
    found = [(m.group("name"), m.group("code")) for m in _BLOCK_RE.finditer(text)]
    assert found, "README has no doc-test blocks"
    return found


@pytest.fixture(scope="module")
def doc_cwd(tmp_path_factory, tokenizer_bin_path):
    d = tmp_path_factory.mktemp("doc_test")
    shutil.copy(tokenizer_bin_path, d / "tokenizer.bin")
    from moonshine_tpu.audio.wav import save_wav

    rng = np.random.default_rng(0)
    save_wav(str(d / "speech.wav"), rng.standard_normal(16000).astype(np.float32) * 0.1, 16000)
    return d


@pytest.mark.parametrize("name,code", _blocks(), ids=[n for n, _ in _blocks()])
def test_readme_block(name, code, doc_cwd, monkeypatch):
    monkeypatch.chdir(doc_cwd)
    exec(compile(code, f"README.md:{name}", "exec"), {"__name__": f"doc_{name}"})
