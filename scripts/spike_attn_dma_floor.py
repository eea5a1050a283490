"""Spike: DMA floor probe for the encoder-attention blocks.

Copy-only kernels over the exact BlockSpecs the attention kernel uses —
no compute at all.  If the copy costs ~what the full kernel costs, the
kernel is at its DMA floor and only a different end-to-end HBM layout
can help; if the copy is fast, the cost is in-kernel (slicing/compute).

Run on the chip: python scripts/spike_attn_dma_floor.py
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


def bench(fn, args, iters=10):
    out = fn(*args)
    np.asarray(out[(0,) * out.ndim])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    np.asarray(out[(0,) * out.ndim])
    return (time.perf_counter() - t0) / iters


def k_copy3(q_ref, k_ref, v_ref, o_ref):
    o_ref[0, 0] = q_ref[0, 0] + k_ref[0, 0] + v_ref[0, 0]


@jax.jit
def run_copy_bh(qh, kh, vh):
    blk = pl.BlockSpec((1, 1, T, HD), lambda i, j: (i, j, 0, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        k_copy3,
        out_shape=jax.ShapeDtypeStruct((B, H, T, HD), qh.dtype),
        grid=(B, H), in_specs=[blk, blk, blk], out_specs=blk,
    )(qh, kh, vh)


def k_copy3p(q_ref, k_ref, v_ref, o_ref):
    o_ref[0] = q_ref[0] + k_ref[0] + v_ref[0]


@jax.jit
def run_copy_packed(qp, kp, vp):
    blk = pl.BlockSpec((1, T, D), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        k_copy3p,
        out_shape=jax.ShapeDtypeStruct((B, T, D), qp.dtype),
        grid=(B,), in_specs=[blk, blk, blk], out_specs=blk,
    )(qp, kp, vp)


def k_slice_only(q_ref, o_ref):
    # packed block, per-head lane slices, write back — no matmul/softmax
    for h in range(H):
        sl = slice(h * HD, (h + 1) * HD)
        o_ref[0, :, sl] = q_ref[0][:, sl] * jnp.bfloat16(1.0001)


@jax.jit
def run_slice_only(qp):
    blk = pl.BlockSpec((1, T, D), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        k_slice_only,
        out_shape=jax.ShapeDtypeStruct((B, T, D), qp.dtype),
        grid=(B,), in_specs=[blk], out_specs=blk,
    )(qp)


def k_gemm_only(q_ref, kt_ref, o_ref):
    # per-head GEMMs from packed blocks, accumulate into packed out
    for h in range(H):
        sl = slice(h * HD, (h + 1) * HD)
        q = q_ref[0][:, sl].astype(jnp.float32)
        kt = kt_ref[0][sl, :].astype(jnp.float32)
        logits = jax.lax.dot_general(q, kt, (((1,), (0,)), ((), ())),
                                     preferred_element_type=jnp.float32)
        o_ref[0, :, sl] = logits[:, :HD].astype(o_ref.dtype)


@jax.jit
def run_gemm_only(qp, kt):
    blk = pl.BlockSpec((1, T, D), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    ktblk = pl.BlockSpec((1, D, T), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        k_gemm_only,
        out_shape=jax.ShapeDtypeStruct((B, T, D), qp.dtype),
        grid=(B,), in_specs=[blk, ktblk], out_specs=blk,
    )(qp, kt)


def main():
    rng = np.random.RandomState(0)
    qp = jax.device_put(jnp.asarray(rng.randn(B, T, D), jnp.bfloat16))
    kp = jax.device_put(jnp.asarray(rng.randn(B, T, D), jnp.bfloat16))
    vp = jax.device_put(jnp.asarray(rng.randn(B, T, D), jnp.bfloat16))
    kt = jax.device_put(jnp.transpose(kp, (0, 2, 1)))
    qh = jax.device_put(qp.reshape(B, T, H, HD).transpose(0, 2, 1, 3))
    kh = jax.device_put(kp.reshape(B, T, H, HD).transpose(0, 2, 1, 3))
    vh = jax.device_put(vp.reshape(B, T, H, HD).transpose(0, 2, 1, 3))

    t = bench(run_copy_bh, (qh, kh, vh))
    print(f"copy (B,H) blocks [T,52]:   {t*1000:7.2f} ms", flush=True)
    t = bench(run_copy_packed, (qp, kp, vp))
    print(f"copy (B,) packed [T,416]:   {t*1000:7.2f} ms", flush=True)
    t = bench(run_slice_only, (qp,))
    print(f"slice-only packed:          {t*1000:7.2f} ms", flush=True)
    t = bench(run_gemm_only, (qp, kt))
    print(f"gemm-only packed:           {t*1000:7.2f} ms", flush=True)


if __name__ == "__main__":
    main()
