"""In-band device-run logging and JAX profiler capture.

The reference's observability is in-band: ``log_ort_run`` prints every ORT
session run with its duration (reference: core/transcriber.h:184,
README.md "log_ort_run"), ``log_api_calls`` traces the ABI surface, and
per-line latency travels inside the transcript itself.  TPU-native
equivalents:

- :func:`log_run` / :func:`timed` — host-wall timing of named device
  calls (jit dispatch + execution + the host transfer that fences it),
  printed to stderr when enabled and aggregated in :class:`RunStats`
  (the allocator-stats analog, moonshine-ort-allocator.h:11-17).
- :func:`profiler_trace` — one-call capture of a TensorBoard/XProf device
  trace via ``jax.profiler`` for the deep per-op view the reference
  cannot produce at all.

Enable globally with ``enable_device_run_log()`` or per-transcriber with
``TranscriberOptions.log_model_run`` (the reference's option name).
"""

from __future__ import annotations

import contextlib
import sys
import threading
import time
from dataclasses import dataclass, field

_enabled = False
_lock = threading.Lock()


def enable_device_run_log(on: bool = True) -> None:
    """Globally enable/disable stderr logging of named device runs."""
    global _enabled
    _enabled = on


def device_run_log_enabled() -> bool:
    return _enabled


@dataclass
class _Stat:
    count: int = 0
    total_ms: float = 0.0
    min_ms: float = float("inf")
    max_ms: float = 0.0


@dataclass
class RunStats:
    """Aggregated per-name run timings (process-wide singleton at
    ``stats``; ``snapshot()`` for a copy, ``reset()`` between phases)."""

    by_name: dict = field(default_factory=dict)

    def add(self, name: str, ms: float) -> None:
        with _lock:
            s = self.by_name.setdefault(name, _Stat())
            s.count += 1
            s.total_ms += ms
            s.min_ms = min(s.min_ms, ms)
            s.max_ms = max(s.max_ms, ms)

    def snapshot(self) -> dict:
        with _lock:
            return {
                k: {
                    "count": v.count,
                    "total_ms": round(v.total_ms, 2),
                    "mean_ms": round(v.total_ms / max(v.count, 1), 2),
                    "min_ms": round(v.min_ms, 2),
                    "max_ms": round(v.max_ms, 2),
                }
                for k, v in self.by_name.items()
            }

    def reset(self) -> None:
        with _lock:
            self.by_name.clear()


stats = RunStats()


@contextlib.contextmanager
def log_run(name: str, enabled: bool | None = None, **meta):
    """Time a named device call.

    ``enabled=None`` defers to the global flag; stats aggregate either
    way (they are nearly free).  Wrap the call INCLUDING its fencing host
    transfer — through a relay, ``block_until_ready`` does not actually
    synchronize, so the transfer is the reliable fence (see bench.py).
    """
    t0 = time.perf_counter()
    try:
        yield
    finally:
        ms = (time.perf_counter() - t0) * 1000.0
        stats.add(name, ms)
        if _enabled if enabled is None else enabled:
            extra = "".join(f" {k}={v}" for k, v in meta.items())
            print(f"[model-run] {name} {ms:.1f} ms{extra}", file=sys.stderr)


def timed(name: str):
    """Decorator form of :func:`log_run`."""

    def wrap(fn):
        def inner(*a, **kw):
            with log_run(name):
                return fn(*a, **kw)

        inner.__name__ = getattr(fn, "__name__", name)
        return inner

    return wrap


def log_api_call(enabled: bool, name: str, **args) -> None:
    """stderr trace of a public-API entry with its arguments — the
    ``log_api_calls`` analog (reference: moonshine-c-api.cpp:99-128)."""
    if enabled:
        rendered = ", ".join(f"{k}={_short(v)}" for k, v in args.items())
        print(f"[api-call] {name}({rendered})", file=sys.stderr)


def _short(v) -> str:
    shape = getattr(v, "shape", None)
    if shape is not None and getattr(v, "ndim", 0) > 0:
        return f"array{tuple(shape)}"
    s = repr(v)
    return s if len(s) <= 60 else s[:57] + "..."


@contextlib.contextmanager
def profiler_trace(logdir: str, host_tracer_level: int = 2):
    """Capture a device trace viewable in TensorBoard/XProf.

    Usage::

        with profiling.profiler_trace("/tmp/trace"):
            svc.update()
    """
    import jax

    jax.profiler.start_trace(logdir, create_perfetto_link=False)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
