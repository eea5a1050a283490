"""Streaming service benchmark: N live streams on one chip.

Mirror of the reference ``benchmark`` tool's metrics (reference:
core/benchmark.cpp:94-105 — compute as % of audio duration + average
post-phrase latency over two_cities.wav) generalized to the multi-stream
service: every slot plays two_cities in update-interval chunks (staggered
starts), and we report

  - aggregate realtime multiple  (streams x audio-time / wall-time)
  - per-update wall latency p50/p95 (the service's dispatch cadence)
  - post-phrase latency p50 (wall time of the update that finalized a
    segment — the reference's "time from end of phrase to final text")

Weights are random (zero egress); decode compute is weight-independent —
random weights produce max-budget token loops, making these numbers a
WORST-CASE bound for real checkpoints whose EOS stops decoding earlier.
"""

from __future__ import annotations

import json
import time

import numpy as np

TWO_CITIES = "/root/reference/test-assets/two_cities_16k.wav"


def run_bench(
    model: str = "tiny_streaming",
    n_streams: int = 16,
    n_cohorts: int = 1,
    update_seconds: float = 0.5,
    n_updates: int = 40,
    use_vad: bool = False,
    mem_bucket: int = 2048,
    draft_cap: int = 256,
    seed: int = 0,
    audio_path: str = TWO_CITIES,
    warm: bool = True,
    bf16: bool = True,
) -> dict:
    import jax
    import jax.numpy as jnp

    from ..audio.wav import load_wav
    from ..core.config import STREAMING_ARCHS
    from ..models import streaming as ms
    from ..serving import StreamingService

    cfg = STREAMING_ARCHS[model]
    params = ms.init_params(cfg, jax.random.PRNGKey(seed))
    vad = None
    if use_vad:
        from ..models.vad import TinyVad

        vad = TinyVad.from_onnx(
            "/root/reference/micro/models/tinyvad_cnn_speech_mel.onnx"
        )

    update_frames = int(update_seconds * 16000) // 80
    kw = dict(
        update_frames=update_frames, mem_bucket=mem_bucket, draft_cap=draft_cap,
        vad=vad, compute_dtype=jnp.bfloat16 if bf16 else None,
    )
    if n_cohorts > 1:
        # Staggered cohorts: each update() ticks one S/K-stream program
        # (serving.ShardedStreamingService; bench.py --cohorts analog).
        from ..serving import ShardedStreamingService

        svc = ShardedStreamingService(
            params, cfg, tokenizer=None, n_streams=n_streams,
            n_cohorts=n_cohorts, **kw,
        )
    else:
        svc = StreamingService(params, cfg, tokenizer=None, n_streams=n_streams, **kw)
    compile_s = svc.warmup() if warm else 0.0

    audio, sr = load_wav(audio_path)
    assert sr == 16000
    doubled = np.concatenate([audio, audio])  # wraparound reads, built once
    step = int(update_seconds * 16000)
    offsets = [int(i * len(audio) / n_streams) for i in range(n_streams)]

    update_ms: list[float] = []
    final_ms: list[float] = []
    n_finals = 0
    t_bench0 = time.monotonic()
    per = n_streams // n_cohorts
    for u in range(n_updates):
        for c in range(n_cohorts):
            for i in range(c * per, (c + 1) * per):
                lo = (offsets[i] + u * step) % len(audio)
                svc.add_audio(i, doubled[lo : lo + step])
            t0 = time.monotonic()
            events = svc.update(cohort=c) if n_cohorts > 1 else svc.update()
            dt = (time.monotonic() - t0) * 1000.0
            update_ms.append(dt)
            for ev in events:
                if ev.is_final:
                    final_ms.append(ev.latency_ms)
                    n_finals += 1
    wall = time.monotonic() - t_bench0

    audio_seconds = n_streams * n_updates * update_seconds
    return {
        "model": model,
        "bf16": bf16,
        "n_streams": n_streams,
        "n_cohorts": n_cohorts,
        "update_seconds": update_seconds,
        "n_updates": n_updates,
        "use_vad": use_vad,
        "compile_s": round(compile_s, 1),
        "update_ms_p50": round(float(np.percentile(update_ms, 50)), 2),
        "update_ms_p95": round(float(np.percentile(update_ms, 95)), 2),
        "update_ms_mean": round(float(np.mean(update_ms)), 2),
        "post_phrase_ms_p50": (
            round(float(np.percentile(final_ms, 50)), 2) if final_ms else None
        ),
        "n_finals": n_finals,
        "aggregate_realtime_x": round(audio_seconds / wall, 1),
        "compute_pct_of_audio": round(100.0 * wall / audio_seconds, 2),
    }


def main() -> None:  # pragma: no cover - CLI
    import argparse

    p = argparse.ArgumentParser()
    p.add_argument("--model", default="tiny_streaming")
    p.add_argument("--streams", type=int, default=16)
    p.add_argument("--cohorts", type=int, default=1)
    p.add_argument("--updates", type=int, default=40)
    p.add_argument("--update-seconds", type=float, default=0.5)
    p.add_argument("--vad", action="store_true")
    p.add_argument("--mem-bucket", type=int, default=2048)
    p.add_argument("--draft-cap", type=int, default=256)
    p.add_argument("--f32", action="store_true")
    args = p.parse_args()
    out = run_bench(
        model=args.model, n_streams=args.streams, n_cohorts=args.cohorts,
        n_updates=args.updates,
        update_seconds=args.update_seconds, use_vad=args.vad,
        mem_bucket=args.mem_bucket, draft_cap=args.draft_cap, bf16=not args.f32,
    )
    print(json.dumps(out))


if __name__ == "__main__":  # pragma: no cover
    main()
