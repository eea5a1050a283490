"""ctypes binding for the native transcription client (libmoonshine_client).

The native-caller side of the serving boundary: a dependency-free C/C++
WebSocket client (runtime/native/moonshine_client.{h,cpp}) that streams PCM
to the TranscriptionServer and polls transcript events.  This module builds
and loads it the same way native_host.py does, and wraps the C ABI in a
small Pythonic ``NativeClientStream`` so the loopback tests exercise the
exact library a C/C++ application would link (reference analog: the ctypes
pattern of language-bindings/python/src/moonshine_voice/moonshine_api.py,
here pointed at the native CLIENT instead of an in-process core).
"""

from __future__ import annotations

import ctypes
import subprocess
import sys
from dataclasses import dataclass
from pathlib import Path
from typing import Optional

import numpy as np

_NATIVE_DIR = Path(__file__).parent / "native"
_BUILD_DIR = _NATIVE_DIR / "build"
_LIB = "libmoonshine_client.so"

MT_EVENT_PARTIAL = 0
MT_EVENT_FINAL = 1
MT_EVENT_STOPPED = 2
MT_EVENT_ERROR = 3

_lib: Optional[ctypes.CDLL] = None


class _Event(ctypes.Structure):
    _fields_ = [
        ("type", ctypes.c_int32),
        ("segment", ctypes.c_int32),
        ("start_s", ctypes.c_double),
        ("end_s", ctypes.c_double),
        ("latency_ms", ctypes.c_double),
        ("text", ctypes.c_char * 4096),
    ]


def build_native(force: bool = False) -> Path | None:
    out = _BUILD_DIR / _LIB
    src = _NATIVE_DIR / "moonshine_client.cpp"
    hdr = _NATIVE_DIR / "moonshine_client.h"
    newest = max(src.stat().st_mtime, hdr.stat().st_mtime)
    if out.exists() and not force and out.stat().st_mtime >= newest:
        return out
    _BUILD_DIR.mkdir(exist_ok=True)
    cmd = [
        "g++", "-O2", "-std=c++17", "-fPIC", "-shared", "-pthread",
        "-fvisibility=hidden", str(src), "-o", str(out),
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, text=True)
    except (subprocess.CalledProcessError, FileNotFoundError) as e:
        print(f"native client build failed: {e}", file=sys.stderr)
        return None
    return out


def load(auto_build: bool = True) -> Optional[ctypes.CDLL]:
    global _lib
    if _lib is not None:
        return _lib
    if auto_build:
        build_native()
    p = _BUILD_DIR / _LIB
    if not p.exists():
        return None
    lib = ctypes.CDLL(str(p))
    lib.mt_client_version.restype = ctypes.c_char_p
    lib.mt_client_connect.restype = ctypes.c_int32
    lib.mt_client_connect.argtypes = [ctypes.c_char_p, ctypes.c_int32]
    lib.mt_client_start.restype = ctypes.c_int32
    lib.mt_client_start.argtypes = [ctypes.c_int32, ctypes.c_int32]
    lib.mt_client_add_audio.restype = ctypes.c_int32
    lib.mt_client_add_audio.argtypes = [
        ctypes.c_int32, ctypes.POINTER(ctypes.c_float), ctypes.c_int32,
    ]
    lib.mt_client_stop.restype = ctypes.c_int32
    lib.mt_client_stop.argtypes = [ctypes.c_int32]
    lib.mt_client_poll_event.restype = ctypes.c_int32
    lib.mt_client_poll_event.argtypes = [
        ctypes.c_int32, ctypes.POINTER(_Event), ctypes.c_int32,
    ]
    lib.mt_client_free.restype = ctypes.c_int32
    lib.mt_client_free.argtypes = [ctypes.c_int32]
    _lib = lib
    return _lib


@dataclass
class ClientEvent:
    type: int
    text: str
    segment: int
    start_s: float
    end_s: float
    latency_ms: float

    @property
    def is_final(self) -> bool:
        return self.type == MT_EVENT_FINAL


class NativeClientStream:
    """One live stream to a TranscriptionServer, through the C library."""

    def __init__(self, host: str, port: int, sample_rate: int = 16000):
        lib = load()
        if lib is None:
            raise RuntimeError("native client library unavailable")
        self._lib = lib
        self._h = lib.mt_client_connect(host.encode(), port)
        if self._h < 0:
            raise ConnectionError(f"mt_client_connect -> {self._h}")
        rc = lib.mt_client_start(self._h, sample_rate)
        if rc < 0:
            raise ConnectionError(f"mt_client_start -> {rc}")

    def add_audio(self, pcm: np.ndarray) -> None:
        pcm = np.ascontiguousarray(pcm, np.float32)
        rc = self._lib.mt_client_add_audio(
            self._h, pcm.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            pcm.size,
        )
        if rc < 0:
            raise ConnectionError(f"mt_client_add_audio -> {rc}")

    def stop(self) -> None:
        rc = self._lib.mt_client_stop(self._h)
        if rc < 0:
            raise ConnectionError(f"mt_client_stop -> {rc}")

    def poll(self, timeout_ms: int) -> ClientEvent | None:
        ev = _Event()
        rc = self._lib.mt_client_poll_event(self._h, ctypes.byref(ev), timeout_ms)
        if rc == 0:
            return None
        if rc < 0:
            raise ConnectionError(f"mt_client_poll_event -> {rc}")
        return ClientEvent(
            type=ev.type, text=ev.text.decode("utf-8", "replace"),
            segment=ev.segment, start_s=ev.start_s, end_s=ev.end_s,
            latency_ms=ev.latency_ms,
        )

    def close(self) -> None:
        if self._h >= 0:
            self._lib.mt_client_free(self._h)
            self._h = -1

    def __enter__(self) -> "NativeClientStream":
        return self

    def __exit__(self, *exc) -> None:
        self.close()
