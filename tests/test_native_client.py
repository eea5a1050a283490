"""Native C/C++ transcription client tests.

Three layers, mirroring how the reference validates its binding stack
(reference: core/moonshine-c-api-test.cpp ABI tests + the Python ctypes
binding tests):
  1. the pure-component selftest binary (SHA-1/base64/JSON/frame codec);
  2. the C ABI driven via ctypes against a REAL TranscriptionServer —
     the same loopback the websockets-based test uses, but through the
     native library's own socket + RFC 6455 + JSON code;
  3. the header-only C++ wrapper (moonshine_client.hpp), compiled and run
     as an external program against the same server.
"""

from __future__ import annotations

import asyncio
import subprocess
import threading
import time
from pathlib import Path

import numpy as np
import pytest

import jax

from moonshine_tpu.core.config import StreamingConfig
from moonshine_tpu.models import streaming as ms
from moonshine_tpu.runtime import native_client
from moonshine_tpu.serving import StreamingService

NATIVE_DIR = Path(native_client._NATIVE_DIR)

lib = native_client.load()
pytestmark = pytest.mark.skipif(lib is None, reason="native client unavailable")

CFG = StreamingConfig(
    encoder_dim=64, decoder_dim=64, depth=2, nheads=4, head_dim=16,
    vocab_size=96, d_model_frontend=32, c1=48, c2=64, max_seq_len=64,
    encoder_depth=2,
)


def test_version():
    assert lib.mt_client_version().decode() == "0.2.0"


def test_selftest_binary(tmp_path):
    exe = tmp_path / "client_selftest"
    subprocess.run(
        ["g++", "-O1", "-std=c++17", "-pthread",
         str(NATIVE_DIR / "client_selftest.cpp"), "-o", str(exe)],
        check=True, capture_output=True, text=True,
    )
    out = subprocess.run([str(exe), "500"], check=True, capture_output=True,
                         text=True)
    assert "client_selftest OK" in out.stdout


def test_bad_handle_errors():
    ev = native_client._Event()
    import ctypes

    assert lib.mt_client_start(99999, 16000) == -2
    assert lib.mt_client_poll_event(99999, ctypes.byref(ev), 0) == -2
    assert lib.mt_client_free(99999) == -2


def test_connect_refused():
    # A port nothing listens on: connect must fail cleanly, not hang.
    assert lib.mt_client_connect(b"127.0.0.1", 1) == -1


class _ServerHarness:
    """Runs TranscriptionServer in a thread with its own event loop."""

    def __init__(self, n_streams: int = 4):
        pytest.importorskip("websockets")
        from moonshine_tpu.server import TranscriptionServer

        params = ms.init_params(CFG, jax.random.PRNGKey(1))
        svc = StreamingService(
            params, CFG, tokenizer=None, n_streams=n_streams,
            update_frames=64, mem_bucket=512, draft_cap=32,
            max_segment_seconds=1.0,
        )
        self.server = TranscriptionServer(svc, tick_seconds=0.05, port=0)
        self._ready = threading.Event()
        self._loop: asyncio.AbstractEventLoop | None = None
        self._task = None
        self._thread = threading.Thread(target=self._run, daemon=True)

    def _run(self):
        self._loop = asyncio.new_event_loop()
        asyncio.set_event_loop(self._loop)
        ready = asyncio.Event()

        async def main():
            self._task = asyncio.current_task()
            await self.server.serve(ready=ready)

        async def wait_ready():
            await ready.wait()
            self._ready.set()

        self._loop.create_task(wait_ready())
        try:
            self._loop.run_until_complete(main())
        finally:
            self._loop.close()

    def __enter__(self):
        self._thread.start()
        assert self._ready.wait(timeout=120.0), "server failed to start"
        return self

    def __exit__(self, *exc):
        if self._loop is not None and self._task is not None:
            self._loop.call_soon_threadsafe(self._task.cancel)
        self._thread.join(timeout=30.0)


def _stream_audio(port: int, seed: int, seconds: float = 2.4) -> list:
    rng = np.random.RandomState(seed)
    events = []
    with native_client.NativeClientStream("127.0.0.1", port) as stream:
        n_chunks = int(seconds / 0.4)
        for _ in range(n_chunks):
            stream.add_audio((rng.randn(6400) * 0.1).astype(np.float32))
            time.sleep(0.08)
        stream.stop()
        deadline = time.monotonic() + 90.0
        while time.monotonic() < deadline:
            ev = stream.poll(timeout_ms=1000)
            if ev is None:
                continue
            events.append(ev)
            if ev.type == native_client.MT_EVENT_STOPPED:
                break
    return events


def test_native_loopback_single_stream():
    with _ServerHarness() as h:
        events = _stream_audio(h.server.port, seed=0)
    types = [e.type for e in events]
    assert types[-1] == native_client.MT_EVENT_STOPPED
    finals = [e for e in events if e.type == native_client.MT_EVENT_FINAL]
    # 2.4 s at a 1 s segment cap -> at least 2 final segments.
    assert len(finals) >= 2
    segs = [e.segment for e in finals]
    assert segs == sorted(segs)
    for e in finals:
        assert e.end_s > e.start_s >= 0.0
        assert e.latency_ms >= 0.0
        # Random weights still produce token text through the fallback
        # tokenizer; the wire must carry it intact.
        assert isinstance(e.text, str)


def test_native_loopback_concurrent_streams():
    with _ServerHarness(n_streams=4) as h:
        results = [None, None]

        def run(i):
            results[i] = _stream_audio(h.server.port, seed=10 + i, seconds=1.6)

        threads = [threading.Thread(target=run, args=(i,)) for i in range(2)]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=120.0)
    for evs in results:
        assert evs is not None
        assert evs[-1].type == native_client.MT_EVENT_STOPPED
        assert any(e.type == native_client.MT_EVENT_FINAL for e in evs)


def test_server_full_reports_error():
    with _ServerHarness(n_streams=1) as h:
        with native_client.NativeClientStream("127.0.0.1", h.server.port) as s1:
            s2 = native_client.NativeClientStream("127.0.0.1", h.server.port)
            try:
                ev = s2.poll(timeout_ms=10000)
                assert ev is not None and ev.type == native_client.MT_EVENT_ERROR
                assert "full" in ev.text
            finally:
                s2.close()
            s1.stop()


CPP_DEMO = r"""
#include "moonshine_client.hpp"
#include <cstdio>
#include <random>
#include <thread>
int main(int argc, char** argv) {
  int port = atoi(argv[1]);
  moonshine::Stream stream("127.0.0.1", port);
  std::mt19937 rng(7);
  std::normal_distribution<float> dist(0.f, 0.1f);
  std::vector<float> pcm(16000 * 2);
  for (auto& x : pcm) x = dist(rng);
  int n_final = 0;
  auto finals = stream.transcribe(pcm, 6400, 120000,
      [&](const moonshine::Event& ev) {
        if (ev.type == moonshine::Event::Type::Final) ++n_final;
      });
  if (finals.size() != size_t(n_final) || n_final < 1) return 1;
  printf("cpp_demo OK finals=%d\n", n_final);
  return 0;
}
"""


def test_cpp_wrapper_end_to_end(tmp_path):
    src = tmp_path / "demo.cpp"
    src.write_text(CPP_DEMO)
    exe = tmp_path / "demo"
    libpath = native_client.build_native()
    assert libpath is not None
    subprocess.run(
        ["g++", "-O1", "-std=c++17", "-pthread", f"-I{NATIVE_DIR}",
         str(src), str(libpath), f"-Wl,-rpath,{libpath.parent}",
         "-o", str(exe)],
        check=True, capture_output=True, text=True,
    )
    with _ServerHarness() as h:
        out = subprocess.run(
            [str(exe), str(h.server.port)], check=True, capture_output=True,
            text=True, timeout=180,
        )
    assert "cpp_demo OK" in out.stdout
