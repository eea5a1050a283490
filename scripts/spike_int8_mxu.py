"""Spike: does int8 dot_general beat bf16 on this chip/toolchain?

Measures sustained GEMM rates at encoder shapes (M = B*T rows) for:
  bf16 x bf16 -> f32,
  int8 x int8 -> int32  (raw MXU int8 path),
  w8a8         (dynamic per-row activation quant + int8 dot + rescale —
                the full arithmetic dense_w8a8 would run).

Pipelines a chain of calls so the ~20 ms axon dispatch floor amortizes
(docs/PERF.md probe discipline).  Run on the real chip:
    python scripts/spike_int8_mxu.py
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np


def bench(fn, args, iters=20, label=""):
    out = fn(*args)
    np.asarray(jax.tree.leaves(out)[0][(0,) * jax.tree.leaves(out)[0].ndim])
    t0 = time.perf_counter()
    out = None
    for _ in range(iters):  # keep only the last output alive (int32 results
        out = fn(*args)     # at these shapes are ~0.7 GB; holding all OOMs)
    np.asarray(jax.tree.leaves(out)[0][(0,) * jax.tree.leaves(out)[0].ndim])
    dt = (time.perf_counter() - t0) / iters
    return dt


def main():
    M, K, N = 512 * 192, 416, 1664  # B=512 encoder MLP fc1 shape (half T, fits HBM)
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(M, K).astype(np.float32) * 0.5, jnp.bfloat16)
    w = jnp.asarray(rng.randn(K, N).astype(np.float32) * 0.05, jnp.bfloat16)
    xq = jnp.asarray(rng.randint(-127, 128, (M, K)), jnp.int8)
    wq = jnp.asarray(rng.randint(-127, 128, (K, N)), jnp.int8)
    w_scale = jnp.asarray(rng.rand(N).astype(np.float32) + 0.5)

    flops = 2.0 * M * K * N

    @jax.jit
    def f_bf16(x, w):
        return jnp.dot(x, w, preferred_element_type=jnp.bfloat16)

    @jax.jit
    def f_int8(xq, wq):
        return jax.lax.dot_general(
            xq, wq, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
        )

    @jax.jit
    def f_w8a8(x, wq, w_scale):
        amax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1, keepdims=True)
        s = jnp.maximum(amax, 1e-6) / 127.0
        q = jnp.clip(jnp.round(x.astype(jnp.float32) / s), -127, 127).astype(jnp.int8)
        acc = jax.lax.dot_general(
            q, wq, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
        )
        return (acc.astype(jnp.float32) * s * w_scale).astype(jnp.bfloat16)

    for label, fn, args in [
        ("bf16", f_bf16, (x, w)),
        ("int8 raw", f_int8, (xq, wq)),
        ("w8a8 full", f_w8a8, (x, wq, w_scale)),
    ]:
        dt = bench(fn, args)
        print(f"{label:10s}: {dt*1e3:8.2f} ms  {flops/dt/1e12:7.1f} TOP/s")


if __name__ == "__main__":
    main()
