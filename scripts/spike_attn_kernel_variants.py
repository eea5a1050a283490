"""Spike: why is the VMEM attention kernel 13 ms at B=512 (bound ~3.5)?

Variants on the per-(b,h) kernel, all at B=512, H=8, T=415, hd=52:

  base     — shipped kernel ([T,hd] q/k/v, lane-lane contraction for QK^T)
  kt       — K arrives dim-major [hd, T]: QK^T is a standard M-K-N GEMM
             (no in-VMEM transpose of K), and the [hd,T] block pads 1.5x
             instead of 2.46x
  nosmax   — base with softmax replaced by a scale (isolates VPU cost)
  nologit  — Q@K only, copy to out (isolates first GEMM + DMA)
  heads    — kt with all 8 heads per grid instance (grid (B,), static
             python loop; 8x work per instance amortizes setup)

Run on the chip: python scripts/spike_attn_kernel_variants.py
"""

from __future__ import annotations

import sys
import time
from functools import partial

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

B, T, H, HD = 512, 415, 8, 52
SCALE = float(HD) ** -0.5
NEG_INF = -1e9


def bench(fn, args, iters=10):
    out = fn(*args)
    np.asarray(out[(0,) * out.ndim])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    np.asarray(out[(0,) * out.ndim])
    return (time.perf_counter() - t0) / iters


def k_base(q_ref, k_ref, v_ref, o_ref, mode: str):
    q = q_ref[0, 0].astype(jnp.float32)
    k = k_ref[0, 0].astype(jnp.float32)
    logits = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32) * SCALE
    if mode == "nologit":
        o_ref[0, 0] = logits[:, :HD].astype(o_ref.dtype)
        return
    if mode == "nosmax":
        w = logits * 1e-3
    else:
        m = jnp.max(logits, axis=-1, keepdims=True)
        p = jnp.exp(logits - m)
        w = p / jnp.sum(p, axis=-1, keepdims=True)
    v = v_ref[0, 0].astype(jnp.float32)
    o_ref[0, 0] = jnp.dot(w, v, preferred_element_type=jnp.float32).astype(o_ref.dtype)


def k_kt(q_ref, kt_ref, v_ref, o_ref):
    q = q_ref[0, 0].astype(jnp.float32)
    kt = kt_ref[0, 0].astype(jnp.float32)  # [hd, T]
    logits = jax.lax.dot_general(q, kt, (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32) * SCALE
    m = jnp.max(logits, axis=-1, keepdims=True)
    p = jnp.exp(logits - m)
    w = p / jnp.sum(p, axis=-1, keepdims=True)
    v = v_ref[0, 0].astype(jnp.float32)
    o_ref[0, 0] = jnp.dot(w, v, preferred_element_type=jnp.float32).astype(o_ref.dtype)


def k_heads(q_ref, kt_ref, v_ref, o_ref):
    for h in range(H):
        q = q_ref[0, h].astype(jnp.float32)
        kt = kt_ref[0, h].astype(jnp.float32)
        logits = jax.lax.dot_general(q, kt, (((1,), (0,)), ((), ())),
                                     preferred_element_type=jnp.float32) * SCALE
        m = jnp.max(logits, axis=-1, keepdims=True)
        p = jnp.exp(logits - m)
        w = p / jnp.sum(p, axis=-1, keepdims=True)
        v = v_ref[0, h].astype(jnp.float32)
        o_ref[0, h] = jnp.dot(w, v, preferred_element_type=jnp.float32).astype(o_ref.dtype)


def run_base(mode):
    @jax.jit
    def f(qh, kh, vh):
        blk = pl.BlockSpec((1, 1, T, HD), lambda i, j: (i, j, 0, 0), memory_space=pltpu.VMEM)
        oblk = blk
        return pl.pallas_call(
            partial(k_base, mode=mode),
            out_shape=jax.ShapeDtypeStruct((B, H, T, HD), qh.dtype),
            grid=(B, H), in_specs=[blk, blk, blk], out_specs=oblk,
            cost_estimate=pl.CostEstimate(flops=2*2*B*H*T*T*HD,
                bytes_accessed=4*B*H*T*HD*2, transcendentals=B*H*T*T),
        )(qh, kh, vh)
    return f


@jax.jit
def run_kt(qh, kt, vh):
    blk = pl.BlockSpec((1, 1, T, HD), lambda i, j: (i, j, 0, 0), memory_space=pltpu.VMEM)
    ktblk = pl.BlockSpec((1, 1, HD, T), lambda i, j: (i, j, 0, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        k_kt,
        out_shape=jax.ShapeDtypeStruct((B, H, T, HD), qh.dtype),
        grid=(B, H), in_specs=[blk, ktblk, blk], out_specs=blk,
        cost_estimate=pl.CostEstimate(flops=2*2*B*H*T*T*HD,
            bytes_accessed=4*B*H*T*HD*2, transcendentals=B*H*T*T),
    )(qh, kt, vh)


@jax.jit
def run_heads(qh, kt, vh):
    blk = pl.BlockSpec((1, H, T, HD), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM)
    ktblk = pl.BlockSpec((1, H, HD, T), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        k_heads,
        out_shape=jax.ShapeDtypeStruct((B, H, T, HD), qh.dtype),
        grid=(B,), in_specs=[blk, ktblk, blk], out_specs=blk,
        cost_estimate=pl.CostEstimate(flops=2*2*B*H*T*T*HD,
            bytes_accessed=4*B*H*T*HD*2, transcendentals=B*H*T*T),
    )(qh, kt, vh)


def main():
    rng = np.random.RandomState(0)
    qh = jax.device_put(jnp.asarray(rng.randn(B, H, T, HD), jnp.bfloat16))
    kh = jax.device_put(jnp.asarray(rng.randn(B, H, T, HD), jnp.bfloat16))
    vh = jax.device_put(jnp.asarray(rng.randn(B, H, T, HD), jnp.bfloat16))
    kt = jax.device_put(jnp.transpose(kh, (0, 1, 3, 2)))

    for name, fn, args in [
        ("base", run_base("full"), (qh, kh, vh)),
        ("nosmax", run_base("nosmax"), (qh, kh, vh)),
        ("nologit", run_base("nologit"), (qh, kh, vh)),
        ("kt", run_kt, (qh, kt, vh)),
        ("heads", run_heads, (qh, kt, vh)),
    ]:
        t = bench(fn, args)
        print(f"{name:8s} {t*1000:7.2f} ms/layer", flush=True)
    # correctness: kt vs base
    a = run_base("full")(qh, kh, vh)
    b = run_kt(qh, kt, vh)
    c = run_heads(qh, kt, vh)
    print("kt maxdiff", float(jnp.max(jnp.abs(a.astype(jnp.float32) - b.astype(jnp.float32)))))
    print("heads maxdiff", float(jnp.max(jnp.abs(a.astype(jnp.float32) - c.astype(jnp.float32)))))


if __name__ == "__main__":
    main()
