"""Throughput benchmark: Moonshine Base batched offline decode on TPU.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "audio-seconds/s", "vs_baseline": N}

Metric: audio-seconds transcribed per wall-clock second for the Base model
(encode + KV-cached greedy decode at the reference's 6.5 tokens/s budget,
reference: core/moonshine-model.cpp:349).

``vs_baseline`` is the measured throughput as a FRACTION OF THE CHIP'S
SPEED OF LIGHT for this exact workload (1.0 = the analytic roofline:
max(FLOP/peak-FLOPs, bytes/peak-HBM-bandwidth) summed over the encode pass
and every decode step, v5e peaks 197 TFLOP/s bf16 / 819 GB/s).  The raw
realtime multiple vs the reference's 1x on-device design point is also
reported as ``realtime_x`` (reference benchmark reports its inverse,
compute as %% of audio duration — core/benchmark.cpp:94-105).

Weights are randomly initialized — decode compute is weight-independent, so
throughput numbers are identical to real-checkpoint runs.
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
    bytes_per_el = 2 if args.dtype == "bfloat16" else 4
    t_sol = speed_of_light_seconds(cfg, args.batch, n_samples, max_tokens, bytes_per_el)
    print(
        json.dumps(
            {
                "metric": f"audio-seconds/s, Moonshine {args.arch} batched greedy decode "
                f"(batch={args.batch}, {args.duration:.0f}s utterances, "
                f"{max_tokens} tokens, {args.dtype}, 1 chip)",
                "value": round(throughput, 2),
                "unit": "audio-seconds/s",
                "vs_baseline": round(best and t_sol / best, 4),
                "realtime_x": round(throughput, 1),
                "sol_seconds": round(t_sol, 4),
                "wall_seconds": round(best, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
