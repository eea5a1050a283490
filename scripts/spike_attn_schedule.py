"""Spike: intra-block scheduling of the packed VMEM attention kernel.

The round-4 packed kernel interleaves per head: QK dot (MXU), softmax
(VPU), AV dot (MXU).  Each head's softmax sits between two MXU ops it
depends on, so unless Mosaic reorders aggressively the MXU idles during
every softmax and the VPU idles during every dot.  Variants (math
identical, output maxdiff printed):

  prod     — the shipped kernel ordering (ops/encoder_attention.py)
  staged   — ALL QK dots into an f32 VMEM scratch, then all softmaxes,
             then all AV dots: groups MXU work back-to-back
  pipe     — software pipelining: issue head h+1's QK dot between head
             h's softmax and AV dot, giving the scheduler an
             independent MXU op to overlap with each softmax

Run on the chip: python scripts/spike_attn_schedule.py
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
NEG_INF = -1e9
SCALE = float(HD) ** -0.5


def _qk(q_ref, kt_ref, h):
    sl = slice(h * HD, (h + 1) * HD)
    q = jnp.pad(q_ref[0][:, sl], ((0, 0), (0, KPAD)))
    kt = jnp.pad(kt_ref[0][sl, :], ((0, KPAD), (0, 0)))
    return jax.lax.dot_general(
        q, kt, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) * SCALE


def _softmax(logits, mask):
    logits = jnp.where(mask != 0, logits, NEG_INF)
    m = jnp.max(logits, axis=-1, keepdims=True)
    p = jnp.exp(logits - m)
    return (p / jnp.sum(p, axis=-1, keepdims=True)).astype(jnp.bfloat16)


def k_prod(q_ref, kt_ref, v_ref, mask_ref, o_ref):
    mask = mask_ref[0]
    for h in range(H):
        sl = slice(h * HD, (h + 1) * HD)
        w = _softmax(_qk(q_ref, kt_ref, h), mask)
        o_ref[0, :, sl] = jnp.dot(
            w, v_ref[0][:, sl], preferred_element_type=jnp.float32
        ).astype(o_ref.dtype)


def k_staged(q_ref, kt_ref, v_ref, mask_ref, o_ref, scratch):
    mask = mask_ref[0]
    for h in range(H):
        scratch[h] = _qk(q_ref, kt_ref, h)
    for h in range(H):
        sl = slice(h * HD, (h + 1) * HD)
        w = _softmax(scratch[h], mask)
        o_ref[0, :, sl] = jnp.dot(
            w, v_ref[0][:, sl], preferred_element_type=jnp.float32
        ).astype(o_ref.dtype)


def k_pipe(q_ref, kt_ref, v_ref, mask_ref, o_ref):
    mask = mask_ref[0]
    logits = _qk(q_ref, kt_ref, 0)
    for h in range(H):
        w = _softmax(logits, mask)
        if h + 1 < H:
            logits = _qk(q_ref, kt_ref, h + 1)  # overlaps h's AV + softmax
        sl = slice(h * HD, (h + 1) * HD)
        o_ref[0, :, sl] = jnp.dot(
            w, v_ref[0][:, sl], preferred_element_type=jnp.float32
        ).astype(o_ref.dtype)


def run(kernel, scratch, q, kt, v, mask):
    blk = pl.BlockSpec((1, T, D), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    ktblk = pl.BlockSpec((1, D, T), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    mask_blk = pl.BlockSpec((1, 1, T), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((B, T, D), q.dtype),
        grid=(B,),
        in_specs=[blk, ktblk, blk, mask_blk],
        out_specs=blk,
        scratch_shapes=[pltpu.VMEM((H, T, T), jnp.float32)] if scratch else [],
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

    ref = None
    for name, kern, scratch in (
        ("prod", k_prod, False),
        ("staged", k_staged, True),
        ("pipe", k_pipe, False),
    ):
        fn = jax.jit(partial(run, kern, scratch))
        try:
            out = fn(q, kt, v, mask)
            np.asarray(out[0, 0, 0])
        except Exception as e:
            print(f"{name:8} FAILED: {type(e).__name__}: {str(e)[:120]}")
            continue
        t0 = time.perf_counter()
        iters = 8
        for _ in range(iters):
            out = fn(q, kt, v, mask)
        np.asarray(out[0, 0, 0])
        dt = (time.perf_counter() - t0) / iters * 1000
        o = np.asarray(out, np.float32)
        if ref is None:
            ref, diff = o, 0.0
        else:
            diff = float(np.abs(o - ref).max())
        print(f"{name:8} {dt:7.2f} ms   maxdiff_vs_prod {diff:.4f}")


if __name__ == "__main__":
    main()
