"""Spike: is the VMEM attention kernel floor partial-lane DMA?

Every variant of spike_attn_kernel_variants.py measured ~12 ms at
B=512 — invariant to removing softmax, the second GEMM, or batching
heads — i.e. the kernel is bound by its block I/O at ~150 GB/s
effective, far under the ~660 GB/s the decode loop streams.  Hypothesis:
[.., T, hd=52] blocks occupy 52 of 128 lanes, so both the HBM->VMEM
loads and (worse) the VMEM->HBM output writes move partial tiles.

Variants:
  pad128  — operands/output padded to hd=128 (full-lane tiles; 2.46x
            logical volume but zero partial-tile traffic)
  packed  — q/k/v/out as [B, T, 416] lane-exact packed arrays, grid (B,),
            per-head static lane slices inside the kernel
  packedT — packed inputs, but K kept [B, 416, T] dim-major

Run on the chip: python scripts/spike_attn_packed_io.py
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
D = H * HD
SCALE = float(HD) ** -0.5


def bench(fn, args, iters=10):
    out = fn(*args)
    np.asarray(out[(0,) * out.ndim])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    np.asarray(out[(0,) * out.ndim])
    return (time.perf_counter() - t0) / iters


def k_pad128(q_ref, k_ref, v_ref, o_ref):
    q = q_ref[0, 0].astype(jnp.float32)  # [T, 128] (cols >= HD are zero)
    k = k_ref[0, 0].astype(jnp.float32)
    logits = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32) * SCALE
    m = jnp.max(logits, axis=-1, keepdims=True)
    p = jnp.exp(logits - m)
    w = p / jnp.sum(p, axis=-1, keepdims=True)
    v = v_ref[0, 0].astype(jnp.float32)
    o_ref[0, 0] = jnp.dot(w, v, preferred_element_type=jnp.float32).astype(o_ref.dtype)


@jax.jit
def run_pad128(qh, kh, vh):
    blk = pl.BlockSpec((1, 1, T, 128), lambda i, j: (i, j, 0, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        k_pad128,
        out_shape=jax.ShapeDtypeStruct((B, H, T, 128), qh.dtype),
        grid=(B, H), in_specs=[blk, blk, blk], out_specs=blk,
        cost_estimate=pl.CostEstimate(flops=2*2*B*H*T*T*128,
            bytes_accessed=4*B*H*T*128*2, transcendentals=B*H*T*T),
    )(qh, kh, vh)


def k_packed(q_ref, k_ref, v_ref, o_ref):
    for h in range(H):
        sl = slice(h * HD, (h + 1) * HD)
        q = q_ref[0][:, sl].astype(jnp.float32)  # [T, HD]
        k = k_ref[0][:, sl].astype(jnp.float32)
        logits = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                     preferred_element_type=jnp.float32) * SCALE
        m = jnp.max(logits, axis=-1, keepdims=True)
        p = jnp.exp(logits - m)
        w = p / jnp.sum(p, axis=-1, keepdims=True)
        v = v_ref[0][:, sl].astype(jnp.float32)
        o_ref[0, :, sl] = jnp.dot(w, v, preferred_element_type=jnp.float32).astype(o_ref.dtype)


@jax.jit
def run_packed(qp, kp, vp):
    blk = pl.BlockSpec((1, T, D), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        k_packed,
        out_shape=jax.ShapeDtypeStruct((B, T, D), qp.dtype),
        grid=(B,), in_specs=[blk, blk, blk], out_specs=blk,
        cost_estimate=pl.CostEstimate(flops=2*2*B*H*T*T*HD,
            bytes_accessed=4*B*T*D*2, transcendentals=B*H*T*T),
    )(qp, kp, vp)


def k_packedT(q_ref, kt_ref, v_ref, o_ref):
    for h in range(H):
        sl = slice(h * HD, (h + 1) * HD)
        q = q_ref[0][:, sl].astype(jnp.float32)   # [T, HD]
        kt = kt_ref[0][sl, :].astype(jnp.float32)  # [HD, T]
        logits = jax.lax.dot_general(q, kt, (((1,), (0,)), ((), ())),
                                     preferred_element_type=jnp.float32) * SCALE
        m = jnp.max(logits, axis=-1, keepdims=True)
        p = jnp.exp(logits - m)
        w = p / jnp.sum(p, axis=-1, keepdims=True)
        v = v_ref[0][:, sl].astype(jnp.float32)
        o_ref[0, :, sl] = jnp.dot(w, v, preferred_element_type=jnp.float32).astype(o_ref.dtype)


@jax.jit
def run_packedT(qp, kt, vp):
    blk = pl.BlockSpec((1, T, D), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    ktblk = pl.BlockSpec((1, D, T), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        k_packedT,
        out_shape=jax.ShapeDtypeStruct((B, T, D), qp.dtype),
        grid=(B,), in_specs=[blk, ktblk, blk], out_specs=blk,
        cost_estimate=pl.CostEstimate(flops=2*2*B*H*T*T*HD,
            bytes_accessed=4*B*T*D*2, transcendentals=B*H*T*T),
    )(qp, kt, vp)


def main():
    rng = np.random.RandomState(0)
    qp = jax.device_put(jnp.asarray(rng.randn(B, T, D), jnp.bfloat16))
    kp = jax.device_put(jnp.asarray(rng.randn(B, T, D), jnp.bfloat16))
    vp = jax.device_put(jnp.asarray(rng.randn(B, T, D), jnp.bfloat16))
    kt = jax.device_put(jnp.transpose(kp, (0, 2, 1)))
    qh = jax.device_put(jnp.pad(qp.reshape(B, T, H, HD).transpose(0, 2, 1, 3),
                                ((0, 0), (0, 0), (0, 0), (0, 128 - HD))))
    kh = jax.device_put(jnp.pad(kp.reshape(B, T, H, HD).transpose(0, 2, 1, 3),
                                ((0, 0), (0, 0), (0, 0), (0, 128 - HD))))
    vh = jax.device_put(jnp.pad(vp.reshape(B, T, H, HD).transpose(0, 2, 1, 3),
                                ((0, 0), (0, 0), (0, 0), (0, 128 - HD))))

    t = bench(run_pad128, (qh, kh, vh))
    print(f"pad128  {t*1000:7.2f} ms/layer", flush=True)
    t = bench(run_packed, (qp, kp, vp))
    print(f"packed  {t*1000:7.2f} ms/layer", flush=True)
    t = bench(run_packedT, (qp, kt, vp))
    print(f"packedT {t*1000:7.2f} ms/layer", flush=True)

    a = np.asarray(run_pad128(qh, kh, vh))[:, :, :, :HD].transpose(0, 2, 1, 3).reshape(B, T, D)
    b = np.asarray(run_packed(qp, kp, vp))
    c = np.asarray(run_packedT(qp, kt, vp))
    print("packed maxdiff", np.abs(a.astype(np.float32) - b.astype(np.float32)).max())
    print("packedT maxdiff", np.abs(a.astype(np.float32) - c.astype(np.float32)).max())


if __name__ == "__main__":
    main()
