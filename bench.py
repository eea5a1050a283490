"""Benchmark: live streaming service + batched offline decode on TPU.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "audio-seconds/s", "vs_baseline": N}

HEADLINE (default --mode both): the multi-stream STREAMING service —
N concurrent live streams on one chip through serving.StreamingService
(masked frontend ingest + windowed encode + speculative verify + greedy
continue, ONE fused device program per update).  value = aggregate
audio-seconds ingested+transcribed per wall second (= streams x realtime).
``vs_baseline`` = reference post-phrase latency on Linux x86 for the same
arch DIVIDED by our p50 final-update latency (>1 = each stream's finals
land faster than the reference's single stream on a Linux x86 CPU —
BASELINE.md:25-27, reference README.md:194-199); the chip serves
``n_streams`` of them at once.  Extra keys carry p50/p95 update wall,
final-update latency, and the OFFLINE batched-decode numbers of round 1
(offline_*, with offline_vs_sol the fraction of the chip's analytic
speed-of-light for that workload).

Weights are randomly initialized — compute is weight-independent, so
throughput is representative; speculative ACCEPTANCE is pessimistic with
random weights (hypotheses churn as streaming context grows), so the
streaming numbers are a worst-case floor, not a best case.

Reference methodology mirrored: core/benchmark.cpp:94-105 (0.5 s update
interval, compute %% of audio, post-phrase latency on two_cities.wav).
"""

from __future__ import annotations

import argparse
import json
import time

import jax
import jax.numpy as jnp


# v5e (TPU v5 lite) single-chip peaks.
PEAK_FLOPS_BF16 = 197e12
PEAK_HBM_BPS = 819e9


def speed_of_light_seconds(cfg, batch: int, n_samples: int, max_tokens: int, bytes_per_el: int) -> float:
    """Analytic lower bound on pipeline wall time for this workload.

    Sums per-phase max(compute, memory) times:
      encode  — one pass over T_enc frames (FLOPs dominate at batch>=32);
      decode  — max_tokens sequential steps; each reads all decoder weights
                once (batch-amortized) plus the per-stream KV cache.
    Attention score FLOPs and small ops are included coarsely; the bound is
    deliberately optimistic (true speed of light, not an achievable target).
    """
    d = cfg.hidden_size
    ffn = cfg.intermediate_size
    t_enc = n_samples
    for k, s in zip(cfg.conv_kernels, cfg.conv_strides):
        t_enc = (t_enc - k) // s + 1

    # Encoder FLOPs per frame: qkvo (4d^2) + mlp (2*d*ffn), x2 for MAC.
    enc_flops_frame = 2 * (4 * d * d + 2 * d * ffn) * cfg.encoder_layers
    # Attention scores: 2 * T^2 * d per layer (both bmms), per batch elem.
    enc_attn_flops = 2 * 2 * t_enc * t_enc * d * cfg.encoder_layers
    # Frontend conv FLOPs (stage channels ~d): dominated by stage 1.
    conv_flops = 2 * n_samples * cfg.conv_kernels[0] * d // cfg.conv_strides[0]
    enc_flops = batch * (t_enc * enc_flops_frame + enc_attn_flops + conv_flops)
    enc_bytes = (4 * d * d + 2 * d * ffn) * cfg.encoder_layers * bytes_per_el
    t_encode = max(enc_flops / PEAK_FLOPS_BF16, enc_bytes / PEAK_HBM_BPS)

    # Decoder: per step, per batch elem: self qkvo 4d^2 + cross q,o 2d^2 +
    # swiglu 3*d*ffn; weights read once per step; KV read per elem.
    dec_params = (
        4 * d * d + 4 * d * d + 3 * d * ffn
    ) * cfg.decoder_layers + cfg.vocab_size * d
    step_flops = batch * 2 * dec_params
    kv_bytes_per_elem = (
        cfg.decoder_layers * (max_tokens + t_enc) * 2 * d * bytes_per_el
    )
    step_bytes = dec_params * bytes_per_el + batch * kv_bytes_per_elem
    t_decode = max_tokens * max(
        step_flops / PEAK_FLOPS_BF16, step_bytes / PEAK_HBM_BPS
    )
    return t_encode + t_decode


def offline_bench(args) -> dict:
    """Batched offline greedy decode (the round-1 headline workload)."""
    import numpy as np

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
    bytes_per_el = 2 if args.dtype == "bfloat16" else 4
    t_sol = speed_of_light_seconds(cfg, args.batch, n_samples, max_tokens, bytes_per_el)
    return {
        "metric": f"audio-seconds/s, Moonshine {args.arch} batched greedy decode "
        f"(batch={args.batch}, {args.duration:.0f}s utterances, "
        f"{max_tokens} tokens, {args.dtype}, 1 chip)",
        "value": round(throughput, 2),
        "unit": "audio-seconds/s",
        "vs_sol": round(best and t_sol / best, 4),
        "realtime_x": round(throughput, 1),
        "sol_seconds": round(t_sol, 4),
        "wall_seconds": round(best, 4),
    }


# Reference post-phrase latency on Linux x86 CPU for each streaming arch
# (BASELINE.md:25-27 / reference README.md:194-199, two_cities.wav); the
# MacBook Pro M-series column is carried for the stretch comparison.
REF_FINAL_LATENCY_MS = {
    "tiny_streaming": {"linux_x86": 69.0, "macbook": 32.0},
    "small_streaming": {"linux_x86": 165.0, "macbook": 49.0},
    "medium_streaming": {"linux_x86": 269.0, "macbook": 74.0},
}


def streaming_bench(args) -> dict:
    """N concurrent live streams through serving.StreamingService.

    Each slot is fed 0.64 s of real speech (two_cities, tiled, per-slot
    offset) per update; segments force-split at 15 s (reference VAD
    contract).  Slots are pre-staggered so finals spread across updates
    instead of landing in lockstep.  Reported latency = wall time of the
    device update that carries a final — the post-phrase latency analog
    (the reference measures end-of-phrase -> final transcript,
    core/benchmark.cpp:94-105).
    """
    import numpy as np

    from moonshine_tpu.audio.wav import load_wav
    from moonshine_tpu.core.config import STREAMING_ARCHS
    from moonshine_tpu.models import streaming as ms
    from moonshine_tpu.serving import StreamingService

    cfg = STREAMING_ARCHS[args.streaming_arch]
    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    params = ms.init_params(cfg, jax.random.PRNGKey(0))

    S = args.streams
    seg_seconds = 15.0
    update_frames = 128  # 0.64 s — one ENC_STEP per pass
    step = update_frames * cfg.frame_len
    # Segment cap 15 s = 3000 memory frames; bucket with ENC_STEP slack.
    mem_bucket = 3072 + 128
    draft_cap = 128  # >= 6.5 tok/s * 15 s

    svc = StreamingService(
        params, cfg, tokenizer=None, n_streams=S,
        update_frames=update_frames, mem_bucket=mem_bucket,
        draft_cap=draft_cap, max_segment_seconds=seg_seconds,
        compute_dtype=dtype,
    )
    svc.warmup()

    try:
        audio, _sr = load_wav("/root/reference/test-assets/two_cities_16k.wav")
    except Exception:
        audio = (np.random.RandomState(0).randn(16000 * 44) * 0.1).astype(np.float32)
    tiled = np.concatenate([audio] * 4)

    offsets = [int(i * len(audio) / S) for i in range(S)]
    cursors = list(offsets)

    def feed(slot: int, n: int) -> None:
        c = cursors[slot]
        chunk = tiled[c : c + n]
        cursors[slot] = c + n
        svc.add_audio(slot, chunk)

    # Stagger: pre-fill slot i with i/S of a segment period so force-splits
    # spread over the following updates instead of landing in lockstep.
    period = int(seg_seconds * 16000)
    for i in range(S):
        feed(i, (i * period // S) // step * step)
    # Drain the pre-fill backlog (pending caps at one segment; raw_buffer
    # holds the rest) without timing it.
    for _ in range(int(seg_seconds / 0.64) + 4):
        svc.update()

    update_ms: list[float] = []
    final_ms: list[float] = []
    n_finals = 0
    t_bench0 = time.perf_counter()
    for u in range(args.updates):
        for i in range(S):
            feed(i, step)
        t0 = time.perf_counter()
        events = svc.update()
        dt = (time.perf_counter() - t0) * 1000.0
        update_ms.append(dt)
        finals = [e for e in events if e.is_final]
        if finals:
            final_ms.append(dt)
            n_finals += len(finals)
    total_wall = time.perf_counter() - t_bench0

    audio_seconds = S * args.updates * step / 16000.0
    agg = audio_seconds / total_wall
    p50 = float(np.percentile(update_ms, 50))
    p95 = float(np.percentile(update_ms, 95))
    p50_final = float(np.percentile(final_ms, 50)) if final_ms else p50
    ref = REF_FINAL_LATENCY_MS[args.streaming_arch]
    update_budget_ms = step / 16000.0 * 1000.0
    return {
        "metric": f"audio-seconds/s, {args.streaming_arch} live service "
        f"({S} concurrent streams, 0.64 s updates, 15 s segments, "
        f"{args.dtype}, 1 chip)",
        "value": round(agg, 2),
        "unit": "audio-seconds/s",
        "vs_baseline": round(ref["linux_x86"] / p50_final, 4),
        "streams": S,
        "p50_update_ms": round(p50, 1),
        "p95_update_ms": round(p95, 1),
        "p50_final_latency_ms": round(p50_final, 1),
        "n_final_updates": len(final_ms),
        "n_finals": n_finals,
        "realtime_headroom_x": round(update_budget_ms / p50, 2),
        "vs_linux_x86_latency": round(ref["linux_x86"] / p50_final, 2),
        "vs_macbook_latency": round(ref["macbook"] / p50_final, 2),
    }


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--mode", default="both", choices=["both", "offline", "streaming"])
    p.add_argument("--arch", default="base")
    p.add_argument("--batch", type=int, default=128)
    p.add_argument("--duration", type=float, default=10.0, help="seconds per utterance")
    p.add_argument("--iters", type=int, default=3)
    p.add_argument("--dtype", default="bfloat16")
    p.add_argument("--streaming-arch", default="medium_streaming")
    p.add_argument("--streams", type=int, default=64)
    p.add_argument("--updates", type=int, default=40)
    args = p.parse_args()

    if args.mode == "offline":
        out = offline_bench(args)
        out["vs_baseline"] = out.pop("vs_sol")
        print(json.dumps(out))
        return
    if args.mode == "streaming":
        print(json.dumps(streaming_bench(args)))
        return

    # both: streaming is the headline; offline rides along as offline_*.
    off = offline_bench(args)
    try:
        out = streaming_bench(args)
    except Exception as e:  # never lose the round's bench to a streaming bug
        out = dict(off)
        out["vs_baseline"] = out.pop("vs_sol")
        out["streaming_error"] = repr(e)
        print(json.dumps(out))
        return
    out["offline_metric"] = off["metric"]
    out["offline_value"] = off["value"]
    out["offline_vs_sol"] = off["vs_sol"]
    out["offline_wall_seconds"] = off["wall_seconds"]
    print(json.dumps(out))


if __name__ == "__main__":
    main()
