"""Spike: packed [B, H*hd, T] int8 cross-attention in PURE XLA.

The decode step's dominant read is the int8 cross cache [B, H, hd=52, T]
whose int8 tiles pad hd 52->64 (1.23x physical).  Packed [B, 416, T] is
tile-exact (416 = 13*32 sublanes).  Head structure in pure XLA (no
relayout of the cache, no pallas):

  qh[b,h,:]   = q_packed[b,:] * Hsel[h,:]          (tiny)
  logits      = einsum('bhD,bDt->bht', qh, K)       (K streamed once,
                                                     [8,416]@[416,T] per b)
  w           = softmax(logits * k_s * scale)
  full[b,h,D] = einsum('bht,bDt->bhD', w*v_s, V)    (V streamed once)
  out[b,D]    = sum_h full[b,h,D] * Hsel[h,D]       (diagonal blocks)

Identical math to the per-head form (same multiplies; the extra
cross-head products are multiplied by zero).  Measures a 64-step scan
(data-dependent chaining) of one layer's cross attention, current vs
packed, B=512, T=512, int8.

Run on the chip: python scripts/spike_packed_cross_xla.py
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp

from moonshine_tpu.ops.int8_kv import attention_dm_q8, quantize_kv

B, H, HD, T = 512, 8, 52, 512
D = H * HD
STEPS = 64


def bench(fn, args, iters=5):
    out = fn(*args)
    np.asarray(jax.tree.leaves(out)[0][(0,) * jax.tree.leaves(out)[0].ndim])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    np.asarray(jax.tree.leaves(out)[0][(0,) * jax.tree.leaves(out)[0].ndim])
    return (time.perf_counter() - t0) / iters / STEPS


@jax.jit
def run_current(q0, k_q, k_s, v_q, v_s):
    def step(q, _):
        o = attention_dm_q8(q[:, None], k_q, k_s, v_q, v_s, None)  # [B,1,H,hd]
        return o[:, 0], None

    out, _ = jax.lax.scan(step, q0, None, length=STEPS)
    return out


@jax.jit
def run_packed(q0p, kp_q, k_s, vp_q, v_s, hsel):
    scale = HD ** -0.5

    def step(qp, _):
        qh = qp[:, None, :] * hsel[None, :, :]  # [B,H,D]
        logits = jnp.einsum("bhD,bDt->bht", qh, kp_q.astype(qp.dtype),
                            preferred_element_type=jnp.float32)
        logits = logits * (k_s * scale)
        m = jnp.max(logits, axis=-1, keepdims=True)
        p = jnp.exp(logits - m)
        w = p / jnp.sum(p, axis=-1, keepdims=True)
        wv = (w * v_s).astype(qp.dtype)
        full = jnp.einsum("bht,bDt->bhD", wv, vp_q.astype(qp.dtype),
                          preferred_element_type=jnp.float32)
        out = jnp.einsum("bhD,hD->bD", full, hsel.astype(jnp.float32))
        return out.astype(qp.dtype), None

    out, _ = jax.lax.scan(step, q0p, None, length=STEPS)
    return out


def main():
    rng = np.random.RandomState(0)
    k = jnp.asarray(rng.randn(B, H, HD, T), jnp.float32)
    v = jnp.asarray(rng.randn(B, H, HD, T), jnp.float32)
    k_q, k_s = quantize_kv(k)
    v_q, v_s = quantize_kv(v)
    q0 = jax.device_put(jnp.asarray(rng.randn(B, H, HD), jnp.bfloat16))

    # packed cache: [B, D, T] int8 (rows h*hd+d), same scales [B,H,T]
    kp_q = jax.device_put(k_q.reshape(B, D, T))
    vp_q = jax.device_put(v_q.reshape(B, D, T))
    # broadcast scales to [B,1,T]-per-head handled inside; keep [B,H,T]
    q0p = jax.device_put(q0.reshape(B, D))
    hsel = np.zeros((H, D), np.float32)
    for h in range(H):
        hsel[h, h * HD:(h + 1) * HD] = 1.0
    hsel = jax.device_put(jnp.asarray(hsel, jnp.bfloat16))
    k_q, k_s, v_q, v_s = map(jax.device_put, (k_q, k_s, v_q, v_s))

    t = bench(run_current, (q0, k_q, k_s, v_q, v_s))
    print(f"current per-head dm int8: {t*1000:7.3f} ms/step", flush=True)
    t = bench(run_packed, (q0p, kp_q, k_s, vp_q, v_s, hsel))
    print(f"packed XLA int8:          {t*1000:7.3f} ms/step", flush=True)

    a = np.asarray(run_current(q0, k_q, k_s, v_q, v_s)).reshape(B, D)
    b = np.asarray(run_packed(q0p, kp_q, k_s, vp_q, v_s, hsel))
    print("maxdiff", np.abs(a.astype(np.float32) - b.astype(np.float32)).max(), flush=True)


if __name__ == "__main__":
    main()
