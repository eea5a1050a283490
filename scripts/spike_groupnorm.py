"""Spike: frontend group-norm pass structure.

The offline frontend's GroupNorm (single group over [T, C] per sample,
masked) is the dominant frontend cost after the stage-1 GEMM rewrite
(docs/PERF.md: 9 ms of a 9-ms-vs-2-ms-SOL frontend at B=128).  The
current implementation makes three fp32 passes over a [B, T1, D] tensor
(~2 GB at B=512): mean, centered var, normalize.

Variants measured here:
  A. current two-pass statistics (mean, then E[(x-mean)^2])
  B. one-pass statistics (sum and sum-of-squares in one fused reduction;
     var = E[x^2] - mean^2) + normalize pass
  C. B with the normalize emitted in bf16 arithmetic (stats still fp32)

Pipelines calls to amortize the ~20 ms axon dispatch floor.  Run on the
real chip: python scripts/spike_groupnorm.py
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np


def bench(fn, args, iters=20):
    out = fn(*args)
    np.asarray(out[(0,) * out.ndim])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    np.asarray(out[(0,) * out.ndim])
    return (time.perf_counter() - t0) / iters


def main():
    B, T, D = 512, 2498, 416  # B=512 x 10 s frontend stage-1 output
    rng = np.random.RandomState(0)
    x = jnp.asarray(np.tanh(rng.randn(B, T, D)).astype(np.float32), jnp.bfloat16)
    lengths = jnp.asarray(rng.randint(T // 2, T + 1, (B,)), jnp.int32)
    mask = jnp.arange(T)[None, :] < lengths[:, None]
    scale = jnp.asarray(rng.rand(D).astype(np.float32) + 0.5)
    bias = jnp.asarray(rng.randn(D).astype(np.float32) * 0.1)
    eps = 1e-5

    @jax.jit
    def gn_current(x, mask, scale, bias):
        xf = x.astype(jnp.float32)
        m = mask.astype(jnp.float32)[:, :, None]
        denom = jnp.maximum(jnp.sum(m, axis=(1, 2), keepdims=True) * x.shape[-1], 1.0)
        mean = jnp.sum(xf * m, axis=(1, 2), keepdims=True) / denom
        var = jnp.sum(jnp.square(xf - mean) * m, axis=(1, 2), keepdims=True) / denom
        y = (xf - mean) * jax.lax.rsqrt(var + eps)
        y = y * scale + bias
        return y.astype(x.dtype)

    @jax.jit
    def gn_onepass(x, mask, scale, bias):
        xf = x.astype(jnp.float32)
        m = mask.astype(jnp.float32)[:, :, None]
        denom = jnp.maximum(jnp.sum(m, axis=(1, 2), keepdims=True) * x.shape[-1], 1.0)
        xm = xf * m
        s1 = jnp.sum(xm, axis=(1, 2), keepdims=True)
        s2 = jnp.sum(xm * xf, axis=(1, 2), keepdims=True)
        mean = s1 / denom
        var = jnp.maximum(s2 / denom - jnp.square(mean), 0.0)
        y = (xf - mean) * jax.lax.rsqrt(var + eps)
        y = y * scale + bias
        return y.astype(x.dtype)

    @jax.jit
    def gn_onepass_bf16norm(x, mask, scale, bias):
        xf = x.astype(jnp.float32)
        m = mask.astype(jnp.float32)[:, :, None]
        denom = jnp.maximum(jnp.sum(m, axis=(1, 2), keepdims=True) * x.shape[-1], 1.0)
        xm = xf * m
        s1 = jnp.sum(xm, axis=(1, 2), keepdims=True)
        s2 = jnp.sum(xm * xf, axis=(1, 2), keepdims=True)
        mean = (s1 / denom).astype(jnp.bfloat16)
        var = jnp.maximum(s2 / denom - jnp.square(s1 / denom), 0.0)
        inv = jax.lax.rsqrt(var + eps).astype(jnp.bfloat16)
        y = (x - mean) * inv
        y = y * scale.astype(jnp.bfloat16) + bias.astype(jnp.bfloat16)
        return y

    args = (x, mask, scale, bias)
    ref = np.asarray(gn_current(*args), np.float32)
    for name, fn in [("current", gn_current), ("onepass", gn_onepass), ("onepass_bf16norm", gn_onepass_bf16norm)]:
        dt = bench(fn, args)
        out = np.asarray(fn(*args), np.float32)
        err = np.max(np.abs(out - ref))
        gb = x.size * 4 / 1e9  # one fp32-equivalent pass over the tensor
        print(f"{name:18s} {dt*1e3:7.2f} ms   max|Δ| vs current {err:.3e}   ({gb:.2f} GB/pass)")


if __name__ == "__main__":
    main()
