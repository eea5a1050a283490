"""MicTranscriber + WebSocket serving layer tests.

Mirrors the reference's mic/live surfaces (reference: language-bindings/
python/src/moonshine_voice/mic_transcriber.py) and exercises the serving
layer end-to-end with a loopback WebSocket client.
"""

from __future__ import annotations

import asyncio
import json

import numpy as np
import pytest

import jax

from moonshine_tpu.core.config import StreamingConfig
from moonshine_tpu.models import streaming as ms
from moonshine_tpu.serving import StreamingService

CFG = StreamingConfig(
    encoder_dim=64, decoder_dim=64, depth=2, nheads=4, head_dim=16,
    vocab_size=96, d_model_frontend=32, c1=48, c2=64, max_seq_len=64,
    encoder_depth=2,
)


def test_mic_transcriber_with_wav_source(tokenizer_bin_path, tmp_path):
    import moonshine_tpu as mt
    from moonshine_tpu.audio.wav import save_wav
    from moonshine_tpu.mic import MicTranscriber, WavSource

    rng = np.random.RandomState(0)
    path = str(tmp_path / "in.wav")
    save_wav(path, rng.randn(16000 * 2).astype(np.float32) * 0.1, 16000)

    t = mt.Transcriber(
        model="tiny", tokenizer_path=tokenizer_bin_path,
        options=mt.TranscriberOptions(
            vad=mt.VadOptions(threshold=0.0, max_segment_duration=1.0)
        ),
    )
    texts: list[str] = []
    mic = (
        MicTranscriber()
        .use_transcriber(t)
        .update_interval(0.25)
        .audio_source(WavSource(path, pace=False))
        .on_text(texts.append)
    )
    mic.load()
    mic.start()
    # Source is finite: wait for the pump thread to drain it.
    mic._thread.join(timeout=120.0)
    transcript = mic.stop()
    assert transcript is not None
    assert all(line.is_complete for line in transcript.lines)
    # Random weights produce text; the event plumbing must have fired.
    assert len(transcript.lines) >= 1


def test_mic_mute_produces_silence(tokenizer_bin_path, tmp_path):
    from moonshine_tpu.mic import MicTranscriber

    mic = MicTranscriber()
    mic.mute()
    assert mic._muted
    mic.unmute()
    assert not mic._muted


@pytest.mark.parametrize("n_clients,cohorts", [(1, 1), (3, 1), (3, 2)])
def test_websocket_loopback(n_clients, cohorts):
    websockets = pytest.importorskip("websockets")
    from moonshine_tpu.server import TranscriptionServer

    params = ms.init_params(CFG, jax.random.PRNGKey(1))
    kw = dict(update_frames=64, mem_bucket=512, draft_cap=32,
              max_segment_seconds=1.0)
    if cohorts > 1:
        # Staggered-cohort service behind the same server: update() ticks
        # one cohort per server tick (round-robin), slots stay global.
        from moonshine_tpu.serving import ShardedStreamingService

        svc = ShardedStreamingService(params, CFG, tokenizer=None,
                                      n_streams=4, n_cohorts=cohorts, **kw)
    else:
        svc = StreamingService(params, CFG, tokenizer=None, n_streams=4, **kw)
    server = TranscriptionServer(svc, tick_seconds=0.05, port=0)

    async def client(uri: str, seed: int) -> list[dict]:
        rng = np.random.RandomState(seed)
        events = []
        async with websockets.connect(uri) as ws:
            await ws.send(json.dumps({"type": "start", "sample_rate": 16000}))
            for _ in range(6):  # 6 x 0.4 s = 2.4 s -> >= 2 segments at 1 s cap
                chunk = (rng.randn(6400) * 0.1).astype(np.float32)
                await ws.send(chunk.tobytes())
                await asyncio.sleep(0.08)
            await ws.send(json.dumps({"type": "stop"}))
            while True:
                msg = json.loads(await asyncio.wait_for(ws.recv(), timeout=60.0))
                events.append(msg)
                if msg["type"] == "stopped":
                    break
        return events

    async def run():
        ready = asyncio.Event()
        serve_task = asyncio.create_task(server.serve(ready))
        await asyncio.wait_for(ready.wait(), timeout=10.0)
        uri = f"ws://{server.host}:{server.port}"
        try:
            return await asyncio.gather(*(client(uri, 10 + i) for i in range(n_clients)))
        finally:
            serve_task.cancel()
            try:
                await serve_task
            except asyncio.CancelledError:
                pass

    all_events = asyncio.run(run())
    for events in all_events:
        kinds = [e["type"] for e in events]
        assert kinds[-1] == "stopped"
        finals = [e for e in events if e["type"] == "final"]
        # 2.4 s at a 1 s force-split -> at least 2 finalized segments.
        assert len(finals) >= 2
        segs = [e["segment"] for e in finals]
        assert segs == sorted(segs)
        assert all("latency_ms" in e for e in finals)


@pytest.mark.slow
def test_server_full_rejects():
    websockets = pytest.importorskip("websockets")
    from moonshine_tpu.server import TranscriptionServer

    params = ms.init_params(CFG, jax.random.PRNGKey(1))
    svc = StreamingService(params, CFG, tokenizer=None, n_streams=1,
                           update_frames=64, mem_bucket=512, draft_cap=32)
    server = TranscriptionServer(svc, tick_seconds=0.05, port=0)

    async def run():
        ready = asyncio.Event()
        serve_task = asyncio.create_task(server.serve(ready))
        await asyncio.wait_for(ready.wait(), timeout=10.0)
        uri = f"ws://{server.host}:{server.port}"
        try:
            async with websockets.connect(uri) as ws1:
                await ws1.send(json.dumps({"type": "start"}))
                async with websockets.connect(uri) as ws2:
                    # Mode select happens on the first message (RPC calls
                    # don't consume stream slots), so the full rejection
                    # arrives after the client declares streaming intent.
                    await ws2.send(json.dumps({"type": "start"}))
                    msg = json.loads(await asyncio.wait_for(ws2.recv(), timeout=10.0))
                    assert msg["type"] == "error"
        finally:
            serve_task.cancel()
            try:
                await serve_task
            except asyncio.CancelledError:
                pass

    asyncio.run(run())
