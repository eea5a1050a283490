"""Spike: packed [H*hd, T] decode attention kernel vs XLA dim-major path.

The decode-step KV reads pay sublane padding hd 52->64 (1.23x) in the
[B, H, hd, T] layout.  Packing heads onto one axis ([B, 416, T] — 416 is
tile-exact for bf16 (16,128) AND int8 (32,128)) removes it; per-head
score/value structure is recovered INSIDE the kernel with a static
head-assignment matmul (scores = Hmat @ (q*K), w_full = Hmat.T @ w) so no
unaligned relayout ever materializes.

Measures one decode step's attention (self+cross fused per layer is the
real shape; here cross only, T=512, the dominant read) for:
  - XLA einsum on padded [B, H, hd, T] bf16      (today's path)
  - Pallas packed kernel on [B, 416, T] bf16
Run on the chip: python scripts/spike_packed_decode_attn.py
"""

from __future__ import annotations

import time
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

B, H, HD, T, L = 512, 8, 52, 512, 8
D = H * HD
NEG_INF = -1e9


def fence(x):
    np.asarray(jax.tree.leaves(x)[0][(0,) * jax.tree.leaves(x)[0].ndim])


def bench(fn, args, iters=20):
    out = fn(*args)
    fence(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    fence(out)
    return (time.perf_counter() - t0) / iters


# ---- XLA dim-major reference (the current path, one layer) ----
@jax.jit
def xla_attn(q, k, v, cur_len):  # q [B,1,H,hd], k/v [B,H,hd,T]
    scale = HD ** -0.5
    logits = jnp.einsum("bshd,bhdt->bhst", q, k, preferred_element_type=jnp.float32) * scale
    mask = (jnp.arange(T)[None, None, None, :] < cur_len)
    logits = jnp.where(mask, logits, NEG_INF)
    w = jax.nn.softmax(logits, axis=-1).astype(q.dtype)
    return jnp.einsum("bhst,bhdt->bshd", w, v, preferred_element_type=q.dtype)


# ---- Pallas packed kernel ----
def _kernel(cur_ref, q_ref, k_ref, v_ref, hmat_ref, o_ref):
    q = q_ref[0].astype(jnp.float32)  # [1, D] -> broadcast over rows
    k = k_ref[0].astype(jnp.float32)  # [D, T]
    prod = q.reshape(D, 1) * k  # [D, T]
    hmat = hmat_ref[...]  # [8 pad to tile, D] static head one-hot
    scores = jax.lax.dot_general(
        hmat, prod, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    ) * (HD ** -0.5)  # [Hp, T]
    mask = jax.lax.broadcasted_iota(jnp.int32, scores.shape, 1) < cur_ref[0]
    scores = jnp.where(mask, scores, NEG_INF)
    m = jnp.max(scores, axis=-1, keepdims=True)
    p = jnp.exp(scores - m)
    w = p / jnp.sum(p, axis=-1, keepdims=True)  # [Hp, T]
    w_full = jax.lax.dot_general(
        hmat, w, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )  # [D, T]
    v = v_ref[0].astype(jnp.float32)
    o_ref[0] = jnp.sum(w_full * v, axis=-1, keepdims=False).reshape(1, D).astype(o_ref.dtype)


@jax.jit
def packed_attn(q, k, v, hmat, cur_len):  # q [B, 1, D], k/v [B, D, T]
    grid = (B,)
    return pl.pallas_call(
        partial(_kernel),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1), lambda b: (0, 0)),  # cur_len [1,1] SMEM-ish
            pl.BlockSpec((1, 1, D), lambda b: (b, 0, 0)),
            pl.BlockSpec((1, D, T), lambda b: (b, 0, 0)),
            pl.BlockSpec((1, D, T), lambda b: (b, 0, 0)),
            pl.BlockSpec((16, D), lambda b: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, 1, D), lambda b: (b, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, 1, D), q.dtype),
    )(cur_len, q, k, v, hmat)


def main():
    rng = np.random.RandomState(0)
    q4 = jnp.asarray(rng.randn(B, 1, H, HD), jnp.bfloat16)
    k4 = jnp.asarray(rng.randn(B, H, HD, T), jnp.bfloat16)
    v4 = jnp.asarray(rng.randn(B, H, HD, T), jnp.bfloat16)
    cur = jnp.asarray(400, jnp.int32)

    qp = q4.reshape(B, 1, D)
    kp = k4.reshape(B, D, T)
    vp = v4.reshape(B, D, T)
    hmat = np.zeros((16, D), np.float32)  # 16 rows for sublane tile
    for h in range(H):
        hmat[h, h * HD : (h + 1) * HD] = 1.0
    hmat = jnp.asarray(hmat)
    cur2 = jnp.full((1, 1), 400, jnp.int32)

    # Correctness first (small tolerance: f32 accumulation both sides).
    ref = xla_attn(q4, k4, v4, cur)
    got = packed_attn(qp, kp, vp, hmat, cur2).reshape(B, 1, H, HD)
    err = float(jnp.max(jnp.abs(ref.astype(jnp.float32) - got.astype(jnp.float32))))
    print("max abs err:", err)

    t_x = bench(xla_attn, (q4, k4, v4, cur))
    t_p = bench(packed_attn, (qp, kp, vp, hmat, cur2))
    bytes_padded = B * 2 * H * 64 * T * 2
    bytes_packed = B * 2 * D * T * 2
    print(f"XLA dim-major : {t_x*1e3:7.3f} ms  ({bytes_padded/t_x/1e9:6.0f} GB/s physical)")
    print(f"Pallas packed : {t_p*1e3:7.3f} ms  ({bytes_packed/t_p/1e9:6.0f} GB/s)")
    print(f"speedup: {t_x/t_p:.2f}x")


if __name__ == "__main__":
    main()
