"""Spike: packed-attention GEMM input precision on the MXU.

The round-3 packed kernel upcasts q/kt/v to fp32 BEFORE the dots; the
MXU's native rate is bf16-in/fp32-accumulate, and fp32-in matmuls run
at a fraction of it.  Variants (per-head math identical):

  fp32_in   — round-3 kernel (astype(f32) then dot, f32 accum)
  bf16_qk   — q/kt stay bf16, dot accumulates fp32 (logits still fp32;
              the inputs WERE bf16 upstream, so no information is lost)
  bf16_av   — additionally the softmax weights cast bf16 for the AV dot
              (fp32 accum) — matches the XLA path's bf16 operand dtypes

Run on the chip: python scripts/spike_attn_bf16_mxu.py
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

B, T, H, HD = 512, 384, 8, 52
D = H * HD
NEG_INF = -1e30


def make_kernel(mode: str):
    def kernel(q_ref, kt_ref, v_ref, mask_ref, o_ref):
        mask = mask_ref[0]
        scale = float(HD) ** -0.5
        for h in range(H):
            sl = slice(h * HD, (h + 1) * HD)
            if mode == "fp32_in":
                q = q_ref[0][:, sl].astype(jnp.float32)
                kt = kt_ref[0][sl, :].astype(jnp.float32)
            else:
                q = q_ref[0][:, sl]
                kt = kt_ref[0][sl, :]
            logits = jax.lax.dot_general(
                q, kt, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32) * scale
            logits = jnp.where(mask != 0, logits, NEG_INF)
            m = jnp.max(logits, axis=-1, keepdims=True)
            p = jnp.exp(logits - m)
            w = p / jnp.sum(p, axis=-1, keepdims=True)
            if mode == "bf16_av":
                w = w.astype(jnp.bfloat16)
                v = v_ref[0][:, sl]
            else:
                v = v_ref[0][:, sl].astype(jnp.float32)
            o_ref[0, :, sl] = jnp.dot(
                w, v, preferred_element_type=jnp.float32
            ).astype(o_ref.dtype)
    return kernel


def run(mode, q, kt, v, mask):
    blk = pl.BlockSpec((1, T, D), lambda i: (i, 0, 0),
                       memory_space=pltpu.VMEM)
    ktblk = pl.BlockSpec((1, D, T), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM)
    mask_blk = pl.BlockSpec((1, 1, T), lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM)
    return pl.pallas_call(
        make_kernel(mode),
        out_shape=jax.ShapeDtypeStruct((B, T, D), q.dtype),
        grid=(B,),
        in_specs=[blk, ktblk, blk, mask_blk],
        out_specs=blk,
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * B * H * T * T * HD,
            bytes_accessed=4 * B * T * D * q.dtype.itemsize,
            transcendentals=B * H * T * T,
        ),
    )(q, kt, v, mask)


def main():
    rng = jax.random.PRNGKey(0)
    q = jax.random.normal(rng, (B, T, D), jnp.bfloat16)
    kt = jax.random.normal(jax.random.PRNGKey(1), (B, D, T), jnp.bfloat16)
    v = jax.random.normal(jax.random.PRNGKey(2), (B, T, D), jnp.bfloat16)
    mask = jnp.ones((B, 1, T), jnp.int32)

    ref = None
    for mode in ("fp32_in", "bf16_qk", "bf16_av"):
        fn = jax.jit(partial(run, mode))
        out = fn(q, kt, v, mask)
        np.asarray(out[0, 0, 0])
        t0 = time.perf_counter()
        iters = 8
        for _ in range(iters):
            out = fn(q, kt, v, mask)
        np.asarray(out[0, 0, 0])
        dt = (time.perf_counter() - t0) / iters * 1000
        o = np.asarray(out, np.float32)
        if ref is None:
            ref = o
            diff = 0.0
        else:
            diff = float(np.abs(o - ref).max())
        print(f"{mode:8} {dt:7.2f} ms   maxdiff_vs_fp32 {diff:.4f}")


if __name__ == "__main__":
    main()
