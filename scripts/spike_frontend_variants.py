"""Spike: frontend stage-1 and conv3 cost decomposition at B=512.

stage1 measures 9.1 ms where the GEMM's flops bound is ~1.4 ms — is it
the fp32 [B,T1,416] materialization feeding tanh, the pairs concat, or
the GEMM itself?  conv3(+gelu) measures ~9.2 ms for ~0.22 TFLOP — does
the stage-1 pair-GEMM trick (k=3 <= 2*s=4) beat lax.conv here?

Run on the chip: python scripts/spike_frontend_variants.py
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp

from moonshine_tpu.core.config import BASE
from moonshine_tpu.models.layers import conv1d, gelu

B = 512
N = 16000 * 9 + 4160
K1, S1 = 127, 64
D = 416


def bench(fn, args, iters=8):
    out = fn(*args)
    np.asarray(out[(0,) * out.ndim])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    np.asarray(out[(0,) * out.ndim])
    return (time.perf_counter() - t0) / iters


def stage1(mode):
    @jax.jit
    def run(audio, w1_full):
        n_frames1 = (audio.shape[-1] - K1) // S1 + 1
        pad = (-audio.shape[-1]) % S1 + S1
        a = jnp.pad(audio.astype(w1_full.dtype), ((0, 0), (0, pad)))
        blocks = a.reshape(a.shape[0], -1, S1)
        if mode == "split_gemm":
            top = jnp.dot(blocks[:, :n_frames1], w1_full[:S1],
                          preferred_element_type=jnp.float32)
            bot = jnp.dot(blocks[:, 1:n_frames1 + 1], w1_full[S1:],
                          preferred_element_type=jnp.float32)
            return jnp.tanh(top + bot).astype(w1_full.dtype)
        pairs = jnp.concatenate([blocks[:, :-1], blocks[:, 1:]], axis=-1)
        windows = pairs[:, :n_frames1]
        acc = jnp.dot(windows, w1_full, preferred_element_type=jnp.float32)
        if mode == "full":
            return jnp.tanh(acc).astype(w1_full.dtype)
        if mode == "notanh":
            return acc.astype(w1_full.dtype)
        if mode == "rawf32":
            return acc
    return run


def main():
    rng = np.random.RandomState(0)
    audio = jax.device_put(jnp.asarray(rng.randn(B, N), jnp.float32) * 0.1)
    w1_full = jax.device_put(jnp.asarray(rng.randn(2 * S1, D), jnp.bfloat16))

    for mode in ["full", "notanh", "rawf32", "split_gemm"]:
        t = bench(stage1(mode), (audio, w1_full))
        print(f"stage1 {mode:10s} {t*1000:7.2f} ms", flush=True)
    a = stage1("full")(audio, w1_full)
    b = stage1("split_gemm")(audio, w1_full)
    print("split maxdiff", float(jnp.max(jnp.abs(a.astype(jnp.float32) - b.astype(jnp.float32)))), flush=True)

    # conv3 variants: input [B, 831, 416] k=3 s=2 -> [B, 415, 416]
    T2 = 831
    x = jax.device_put(jnp.asarray(rng.randn(B, T2, D), jnp.bfloat16))
    w3 = jax.device_put(jnp.asarray(rng.randn(3, D, D), jnp.bfloat16))
    b3 = jax.device_put(jnp.asarray(rng.randn(D), jnp.bfloat16))

    @jax.jit
    def conv3_lax(x, w3, b3):
        return gelu(conv1d({"w": w3, "b": b3}, x, 2))

    @jax.jit
    def conv3_gemm(x, w3, b3):
        # k=3 <= 2*s=4: stride-2 blocks, adjacent pairs -> 4-step windows,
        # one zero weight row (same trick as stage 1)
        t3 = (T2 - 3) // 2 + 1
        pad = (-T2) % 2 + 2
        a = jnp.pad(x, ((0, 0), (0, pad), (0, 0)))
        blocks = a.reshape(a.shape[0], -1, 2 * D)
        pairs = jnp.concatenate([blocks[:, :-1], blocks[:, 1:]], axis=-1)
        windows = pairs[:, :t3]  # [B, T3, 4*D]
        wfull = jnp.concatenate([w3.reshape(3 * D, D),
                                 jnp.zeros((D, D), w3.dtype)], axis=0)
        y = jnp.dot(windows, wfull, preferred_element_type=jnp.float32)
        return gelu((y + b3.astype(jnp.float32)).astype(x.dtype))

    t = bench(conv3_lax, (x, w3, b3))
    print(f"conv3+gelu lax   {t*1000:7.2f} ms", flush=True)
    t = bench(conv3_gemm, (x, w3, b3))
    print(f"conv3+gelu gemm  {t*1000:7.2f} ms", flush=True)
    a = conv3_lax(x, w3, b3)
    b = conv3_gemm(x, w3, b3)
    print("conv3 maxdiff", float(jnp.max(jnp.abs(a.astype(jnp.float32) - b.astype(jnp.float32)))), flush=True)


if __name__ == "__main__":
    main()
