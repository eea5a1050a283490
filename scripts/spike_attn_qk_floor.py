"""Spike: is the packed kernel's QK phase at a structural floor?

Measures, at the bench block shape (B=512 grid, T=384, 8 heads, hd=52):

  qk_only    — 8 per-head padded [T,128]x[128,T] dots per block, logits
               reduced to a [T,1] checksum (no softmax/AV): the QK floor
  qk_big     — ONE [T,416]x[416,T] dot per block (WRONG math — all heads
               summed — but 1/8 the dot count at 1/8 the useful flops):
               if this runs in ~1 dot's time, per-dot overhead dominates
  qk_only_nopad — the 8 dots WITHOUT the K->128 zero-pad (K=52)
  full       — the production kernel (dots + softmax + AV) for reference

Run on the chip: python scripts/spike_attn_qk_floor.py
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
KPAD = 128 - HD
SCALE = float(HD) ** -0.5
NEG_INF = -1e9


def k_qk_only(q_ref, kt_ref, v_ref, mask_ref, o_ref, *, pad: bool):
    acc = jnp.zeros((T, 1), jnp.float32)
    for h in range(H):
        sl = slice(h * HD, (h + 1) * HD)
        q, kt = q_ref[0][:, sl], kt_ref[0][sl, :]
        if pad:
            q = jnp.pad(q, ((0, 0), (0, KPAD)))
            kt = jnp.pad(kt, ((0, KPAD), (0, 0)))
        logits = jax.lax.dot_general(
            q, kt, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        acc = acc + jnp.sum(logits, axis=-1, keepdims=True)
    o_ref[0, :, :] = jnp.broadcast_to(acc.astype(o_ref.dtype), (T, D))


def k_qk_big(q_ref, kt_ref, v_ref, mask_ref, o_ref):
    logits = jax.lax.dot_general(
        q_ref[0], kt_ref[0], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)  # [T, T] — all heads summed
    o_ref[0, :, :] = jnp.broadcast_to(
        jnp.sum(logits, axis=-1, keepdims=True).astype(o_ref.dtype), (T, D))


def k_full(q_ref, kt_ref, v_ref, mask_ref, o_ref):
    mask = mask_ref[0]
    for h in range(H):
        sl = slice(h * HD, (h + 1) * HD)
        q = jnp.pad(q_ref[0][:, sl], ((0, 0), (0, KPAD)))
        kt = jnp.pad(kt_ref[0][sl, :], ((0, KPAD), (0, 0)))
        logits = jax.lax.dot_general(
            q, kt, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32) * SCALE
        logits = jnp.where(mask != 0, logits, NEG_INF)
        m = jnp.max(logits, axis=-1, keepdims=True)
        p = jnp.exp(logits - m)
        w = (p / jnp.sum(p, axis=-1, keepdims=True)).astype(jnp.bfloat16)
        o_ref[0, :, sl] = jnp.dot(
            w, v_ref[0][:, sl], preferred_element_type=jnp.float32
        ).astype(o_ref.dtype)


def run(kernel, q, kt, v, mask):
    blk = pl.BlockSpec((1, T, D), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    ktblk = pl.BlockSpec((1, D, T), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    mask_blk = pl.BlockSpec((1, 1, T), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
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
    q = jax.random.normal(jax.random.PRNGKey(0), (B, T, D), jnp.bfloat16)
    kt = jax.random.normal(jax.random.PRNGKey(1), (B, D, T), jnp.bfloat16)
    v = jax.random.normal(jax.random.PRNGKey(2), (B, T, D), jnp.bfloat16)
    mask = jnp.ones((B, 1, T), jnp.int32)
    for name, kern in (
        ("qk_only", partial(k_qk_only, pad=True)),
        ("qk_only_nopad", partial(k_qk_only, pad=False)),
        ("qk_big", k_qk_big),
        ("full", k_full),
    ):
        fn = jax.jit(partial(run, kern))
        try:
            out = fn(q, kt, v, mask)
            np.asarray(out[0, 0, 0])
        except Exception as e:
            print(f"{name:14} FAILED: {type(e).__name__}: {str(e)[:100]}")
            continue
        t0 = time.perf_counter()
        for _ in range(8):
            out = fn(q, kt, v, mask)
        np.asarray(out[0, 0, 0])
        print(f"{name:14} {(time.perf_counter() - t0) / 8 * 1000:7.2f} ms")


if __name__ == "__main__":
    main()
