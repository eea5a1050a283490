"""Throughput benchmark: Moonshine Base batched offline decode on TPU.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "audio-seconds/s", "vs_baseline": N}

Metric: audio-seconds transcribed per wall-clock second for the Base model
(encode + KV-cached greedy decode at the reference's 6.5 tokens/s budget,
reference: core/moonshine-model.cpp:349).  ``vs_baseline`` is the multiple
of real-time (1.0 = the reference on-device stack's design point of keeping
up with a single live stream; the reference ``benchmark`` binary reports
compute as % of audio duration, i.e. its inverse — reference:
core/benchmark.cpp:94-105).

Weights are randomly initialized — decode compute is weight-independent, so
throughput numbers are identical to real-checkpoint runs.
"""

from __future__ import annotations

import argparse
import json
import time

import jax
import jax.numpy as jnp


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--arch", default="base")
    p.add_argument("--batch", type=int, default=128)
    p.add_argument("--duration", type=float, default=10.0, help="seconds per utterance")
    p.add_argument("--iters", type=int, default=3)
    p.add_argument("--dtype", default="bfloat16")
    args = p.parse_args()

    from moonshine_tpu.core.config import ARCHS
    from moonshine_tpu.decoding.greedy import greedy_decode
    from moonshine_tpu.models import moonshine as mm

    cfg = ARCHS[args.arch]
    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    params = mm.init_params(cfg, jax.random.PRNGKey(0))
    params = jax.tree.map(lambda x: x.astype(dtype), params)

    n_samples = int(16000 * args.duration)
    max_tokens = max(int(args.duration * cfg.max_tokens_per_second), 8)
    rng = jax.random.PRNGKey(1)
    audio = jax.random.normal(rng, (args.batch, n_samples), jnp.float32) * 0.1
    # Force full-length decode so timing is worst-case (no early EOS).
    caps = jnp.full((args.batch,), max_tokens, jnp.int32)

    encode = jax.jit(lambda p, a: mm.encode(p, cfg, a))

    def pipeline(params, audio):
        memory, mask = encode(params, audio)
        return greedy_decode(params, cfg, memory, mask, max_tokens=max_tokens, token_caps=caps)

    # Warmup / compile.  NOTE: through the axon relay block_until_ready does
    # not actually synchronize; a host transfer is the reliable fence.
    import numpy as np

    res = pipeline(params, audio)
    np.asarray(res.tokens)

    times = []
    for _ in range(args.iters):
        t0 = time.perf_counter()
        res = pipeline(params, audio)
        np.asarray(res.tokens)
        times.append(time.perf_counter() - t0)

    best = min(times)
    audio_seconds = args.batch * args.duration
    throughput = audio_seconds / best
    print(
        json.dumps(
            {
                "metric": f"audio-seconds/s, Moonshine {args.arch} batched greedy decode "
                f"(batch={args.batch}, {args.duration:.0f}s utterances, "
                f"{max_tokens} tokens, {args.dtype}, 1 chip)",
                "value": round(throughput, 2),
                "unit": "audio-seconds/s",
                "vs_baseline": round(throughput / 1.0, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
