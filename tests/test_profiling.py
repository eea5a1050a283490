"""Device-run logging (log_ort_run analog) tests."""

from __future__ import annotations

import sys

import numpy as np

from moonshine_tpu import profiling


def test_log_run_aggregates_and_prints(capsys):
    profiling.stats.reset()
    with profiling.log_run("unit_op", enabled=True, shape=(2, 3)):
        pass
    err = capsys.readouterr().err
    assert "[model-run] unit_op" in err and "shape=(2, 3)" in err
    snap = profiling.stats.snapshot()
    assert snap["unit_op"]["count"] == 1
    assert snap["unit_op"]["min_ms"] <= snap["unit_op"]["max_ms"]


def test_global_flag(capsys):
    profiling.stats.reset()
    profiling.enable_device_run_log(False)
    with profiling.log_run("quiet_op"):
        pass
    assert "quiet_op" not in capsys.readouterr().err
    # Stats still aggregate when printing is off.
    assert profiling.stats.snapshot()["quiet_op"]["count"] == 1
    profiling.enable_device_run_log(True)
    try:
        with profiling.log_run("loud_op"):
            pass
        assert "loud_op" in capsys.readouterr().err
    finally:
        profiling.enable_device_run_log(False)


def test_timed_decorator():
    profiling.stats.reset()

    @profiling.timed("decorated")
    def f(x):
        return x + 1

    assert f(1) == 2 and f(2) == 3
    assert profiling.stats.snapshot()["decorated"]["count"] == 2


def test_log_api_call_formats_args(capsys):
    profiling.log_api_call(True, "transcribe", audio=np.zeros((3, 4)), sample_rate=16000)
    err = capsys.readouterr().err
    assert "[api-call] transcribe(audio=array(3, 4), sample_rate=16000)" in err
    profiling.log_api_call(False, "quiet")
    assert "quiet" not in capsys.readouterr().err


def test_transcriber_option_enables_logging(capsys):
    """TranscriberOptions.log_model_run turns on stderr run logs through the
    real pipeline (FakeBackend keeps it CPU-cheap)."""
    from moonshine_tpu.core.config import TranscriberOptions, VadOptions
    from moonshine_tpu.pipeline.backends import FakeBackend
    from moonshine_tpu.pipeline.transcriber import Transcriber

    profiling.enable_device_run_log(False)
    opts = TranscriberOptions(log_model_run=True, vad=VadOptions(threshold=0.0))
    tr = Transcriber(FakeBackend(script=["hello"]), options=opts)
    try:
        assert profiling.device_run_log_enabled()
    finally:
        profiling.enable_device_run_log(False)
