"""Serve a pool of live streams on one chip with staggered cohorts.

Demonstrates the production serving shape: N stream slots split into K
cohorts (serving.ShardedStreamingService), each update() ticking one
S/K-stream device program so every stream keeps the low per-update
latency of the smaller program while the chip serves all N
(docs/PERF.md cohort ladder).  Feeds every slot a WAV as if live and
prints per-cohort tick latency plus the finals.

    python examples/serve_pool.py speech.wav --streams 8 --cohorts 2
"""

import argparse
import sys
import time

sys.path.insert(0, ".")

import numpy as np

import jax
import jax.numpy as jnp

from moonshine_tpu.audio.wav import load_wav
from moonshine_tpu.core.config import STREAMING_ARCHS
from moonshine_tpu.models import streaming as ms
from moonshine_tpu.serving import ShardedStreamingService


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("wav")
    p.add_argument("--model", default="tiny_streaming")
    p.add_argument("--streams", type=int, default=8)
    p.add_argument("--cohorts", type=int, default=2)
    p.add_argument("--seconds", type=float, default=4.0)
    p.add_argument("--update-seconds", type=float, default=0.64)
    args = p.parse_args()

    cfg = STREAMING_ARCHS[args.model]
    params = ms.init_params(cfg, jax.random.PRNGKey(0))  # random: demo plumbing
    svc = ShardedStreamingService(
        params, cfg, tokenizer=None,
        n_streams=args.streams, n_cohorts=args.cohorts,
        update_frames=int(args.update_seconds * 16000) // 80,
        mem_bucket=512, draft_cap=64, max_segment_seconds=2.0,
        compute_dtype=jnp.bfloat16,
    )
    print(f"warmup: {svc.warmup():.1f}s "
          f"({args.streams} slots, {args.cohorts} cohorts)")

    audio, sr = load_wav(args.wav)
    assert sr == 16000
    doubled = np.concatenate([audio, audio])  # wraparound reads, built once
    step = int(args.update_seconds * 16000)
    cursors = [int(i * len(audio) / args.streams) for i in range(args.streams)]
    for i in range(args.streams):
        svc.open_slot(i)

    per = args.streams // args.cohorts
    n_ticks = int(args.seconds / args.update_seconds) * args.cohorts
    finals = 0
    for t in range(n_ticks):
        c = t % args.cohorts
        for i in range(c * per, (c + 1) * per):
            lo = cursors[i] % len(audio)
            svc.add_audio(i, doubled[lo : lo + step])
            cursors[i] += step
        t0 = time.monotonic()
        events = svc.update(cohort=c)
        dt = (time.monotonic() - t0) * 1000
        for e in events:
            if e.is_final:
                finals += 1
                print(f"  [slot {e.slot} seg {e.segment_id}] final "
                      f"({e.latency_ms:.0f} ms): {e.text[:40]!r}")
        print(f"tick {t} cohort {c}: {dt:.0f} ms, {len(events)} events")
    print(f"done: {finals} finalized segments across {args.streams} streams")


if __name__ == "__main__":
    main()
