"""Test harness: force a virtual 8-device CPU mesh.

Multi-chip hardware is not available in CI; sharding correctness is
validated on ``xla_force_host_platform_device_count=8`` CPU devices, and
the driver separately dry-run-compiles the multi-chip path (see
``__graft_entry__.dryrun_multichip``).
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

# The image's sitecustomize pre-imports jax and pins JAX_PLATFORMS to the
# axon TPU plugin; config.update after import is the reliable way to force
# the CPU backend for tests.
import jax

jax.config.update("jax_platforms", "cpu")

import pathlib
import sys

import numpy as np
import pytest

REPO_ROOT = pathlib.Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO_ROOT))

def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "slow: training-heavy test (runs only with MOONSHINE_FULL_SUITE=1 "
        "or -m slow); the default suite stays under ~8 minutes")


def pytest_collection_modifyitems(config, items):
    """Fast/slow split (VERDICT r3 item 9): the training-in-tests
    pattern (overfit fixtures, tagger/reader/diarization training) grew
    the default suite past 20 minutes.  Those tests carry
    ``@pytest.mark.slow`` and are skipped by default; run the FULL
    suite with ``MOONSHINE_FULL_SUITE=1 python -m pytest tests/``
    (CI mode) or ``-m slow`` for only the slow set."""
    if os.environ.get("MOONSHINE_FULL_SUITE"):
        return
    if config.getoption("markexpr", default=""):
        return  # explicit marker selection overrides the default skip
    skip = pytest.mark.skip(
        reason="slow: set MOONSHINE_FULL_SUITE=1 for the full suite")
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip)


REFERENCE = pathlib.Path("/root/reference")
TEST_ASSETS = REFERENCE / "test-assets"
TOKENIZER_BIN = (
    REFERENCE
    / "language-bindings/python/src/moonshine_voice/assets/tiny-en/tokenizer.bin"
)


@pytest.fixture(scope="session")
def tokenizer_bin_path():
    if not TOKENIZER_BIN.exists():
        pytest.skip("reference tokenizer.bin not available")
    return str(TOKENIZER_BIN)


@pytest.fixture(scope="session")
def two_cities_path():
    p = TEST_ASSETS / "two_cities_16k.wav"
    if not p.exists():
        pytest.skip("two_cities_16k.wav not available")
    return str(p)


@pytest.fixture(scope="session")
def beckett_path():
    p = TEST_ASSETS / "beckett.wav"
    if not p.exists():
        pytest.skip("beckett.wav not available")
    return str(p)


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)
