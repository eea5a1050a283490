"""Unit tests for bench.py's subprocess-phase orchestration (VERDICT r3
item 1): the schema assembly and argv round trip must stay stable — the
driver's BENCH_r{N}.json is produced by this path.
"""

from __future__ import annotations

import importlib.util
import sys
from pathlib import Path

spec = importlib.util.spec_from_file_location(
    "bench", Path(__file__).resolve().parents[1] / "bench.py")
bench = importlib.util.module_from_spec(spec)
sys.modules.setdefault("bench", bench)
spec.loader.exec_module(bench)


class _Args:
    arch = "base"
    batch = 512
    duration = 9.26
    iters = 3
    dtype = "bfloat16"
    streaming_arch = "medium_streaming"
    streams = 64
    cohorts = 2
    updates = 40
    decode = "greedy"
    beam_size = 4
    beam_batch = 128
    spec = True
    spec_gamma = 8
    spec_draft = "nano"
    spec_steps = 900
    vad = False
    w8a8 = False
    kv_int8 = True
    trained = True


def _phase(agg=100.0, p50=180.0, **extra):
    d = {"agg": agg, "p50": p50, "p95": p50 * 1.2, "p50_final": p50,
         "n_final_updates": 40, "n_finals": 100}
    d.update(extra)
    return d


def test_assemble_streaming_full_key_set():
    phases = {
        "steady": _phase(),
        "churn": _phase(agg=20.0, p50=1000.0),
        "governed": _phase(agg=70.0, p50=120.0, backoff=5),
        "trained": _phase(
            agg=28.0, p50=900.0, acceptance=0.83, loss=0.5, steps=600,
            train_s=100.0, heldout_agg=70.0, heldout_p50=110.0,
            heldout_p95=130.0, heldout_p50_final=110.0,
            heldout_n_final_updates=10, heldout_n_finals=12,
            heldout_acceptance=0.76, heldout_backoff=5),
        "diar": _phase(agg=95.0, p50=190.0, diar_p50_added_ms=12.0,
                       diar_calls=40),
        "latency": _phase(agg=1.5, p50=40.0, p50_final=55.0,
                          acceptance=0.8, s8_p50_final=30.0, s8_p50=30.0,
                          s8_n_finals=120),
    }
    out = bench.assemble_streaming(_Args(), phases)
    # the keys the round-3 verdict demanded from the driver artifact
    for key in ("value", "vs_baseline", "p50_update_ms",
                "churn_floor_agg", "churn_governed_agg",
                "churn_governed_backoff", "trained_acceptance",
                "trained_heldout_acceptance", "trained_heldout_backoff",
                # round-4 verdict items 2 and 5: latency floor + diar
                "latency_floor_p50_ms", "latency_floor_vs_macbook",
                "latency_s8_p50_ms", "latency_s8_vs_macbook",
                "diar_alongside_agg", "diar_added_p50_ms",
                "diar_p50_delta_ms"):
        assert key in out, key
    assert out["value"] == 100.0
    assert out["vs_baseline"] == round(269.0 / 180.0, 4)
    assert out["latency_floor_p50_ms"] == 55.0
    assert out["latency_floor_vs_macbook"] == round(74.0 / 55.0, 2)
    assert out["diar_p50_delta_ms"] == 10.0
    assert "streaming_error" not in out


def test_assemble_streaming_partial_phases():
    out = bench.assemble_streaming(_Args(), {"steady": _phase()})
    assert out["value"] == 100.0
    assert "churn_floor_agg" not in out
    assert "trained_acceptance" not in out


def test_phase_argv_round_trip():
    argv = bench._phase_argv(_Args(), "steady")
    assert argv[2:4] == ["--phase", "steady"]
    s = " ".join(argv)
    assert "--streams 64" in s and "--cohorts 2" in s
    assert "--kv-int8" in s and "--no-w8a8" in s and "--no-vad" in s
    # every flag must be parseable by bench's own parser (flags drift is
    # how a phase silently runs with defaults)
    import subprocess

    # parse-only check via --help exit? simpler: ensure no unknown flag
    # by reusing the module parser
    import argparse

    # bench.main builds the parser inline; emulate by invoking the
    # subprocess with --phase but an impossible timeout would run it.
    # Instead: all forwarded names must appear in bench.py's source.
    src = (Path(__file__).resolve().parents[1] / "bench.py").read_text()
    for a in argv[2::2]:
        if a.startswith("--"):
            assert a.lstrip("-").replace("no-", "") in src.replace("_", "-"), a
