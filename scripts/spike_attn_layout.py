"""Spike: how much of the encoder-attention cost is layout, not math?

The ablation (spike_encoder_ablation.py) charges ~9.5 ms/layer to the
attention phase at B=512.  The VMEM kernel's wrapper transposes q/k/v
from [B, T, H, hd] (the (H, hd)=(8,52) trailing dims tile-pad 4.9x) to
head-major [B, H, T, hd] and the output back — four relayouts of ~0.9 GB
physical each.  This spike times:

  A. wrapper as shipped (transposes + kernel + transpose back)
  B. kernel alone on pre-transposed [B, H, T, hd] operands
  C. B but operands zero-padded to hd=64 ([B, H, T, 64], lane-64 blocks)
  D. XLA einsum attention on [B, T, H, hd] (no explicit transposes)

Run on the chip: python scripts/spike_attn_layout.py
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

from moonshine_tpu.ops.encoder_attention import _attn_kernel, encoder_attention

B, T, H, HD = 512, 415, 8, 52


def bench(fn, args, iters=10):
    out = fn(*args)
    np.asarray(out[(0,) * out.ndim])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    np.asarray(out[(0,) * out.ndim])
    return (time.perf_counter() - t0) / iters


def kernel_only(hd):
    scale = float(HD) ** -0.5  # scale by the real hd even when padded

    @jax.jit
    def run(qh, kh, vh, mask):
        grid = (B, H)
        blk = pl.BlockSpec((1, 1, T, hd), lambda i, j: (i, j, 0, 0), memory_space=pltpu.VMEM)
        mask_blk = pl.BlockSpec((1, 1, T), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM)
        return pl.pallas_call(
            partial(_attn_kernel, scale=scale),
            out_shape=jax.ShapeDtypeStruct((B, H, T, hd), qh.dtype),
            grid=grid,
            in_specs=[blk, blk, blk, mask_blk],
            out_specs=blk,
            cost_estimate=pl.CostEstimate(
                flops=2 * 2 * B * H * T * T * hd,
                bytes_accessed=4 * B * H * T * hd * qh.dtype.itemsize + B * T * 4,
                transcendentals=B * H * T * T,
            ),
        )(qh, kh, vh, mask)

    return run


@jax.jit
def xla_attn(q, k, v):
    scale = HD ** -0.5
    logits = jnp.einsum("bshd,bthd->bhst", q, k, preferred_element_type=jnp.float32) * scale
    w = jax.nn.softmax(logits, axis=-1).astype(q.dtype)
    return jnp.einsum("bhst,bthd->bshd", w, v, preferred_element_type=q.dtype)


def main():
    rng = np.random.RandomState(0)
    q = jax.device_put(jnp.asarray(rng.randn(B, T, H, HD), jnp.bfloat16))
    k = jax.device_put(jnp.asarray(rng.randn(B, T, H, HD), jnp.bfloat16))
    v = jax.device_put(jnp.asarray(rng.randn(B, T, H, HD), jnp.bfloat16))
    qh = jax.device_put(jnp.transpose(q, (0, 2, 1, 3)))
    kh = jax.device_put(jnp.transpose(k, (0, 2, 1, 3)))
    vh = jax.device_put(jnp.transpose(v, (0, 2, 1, 3)))
    mask = jax.device_put(jnp.ones((B, 1, T), jnp.int32))

    t = bench(lambda a, b_, c: encoder_attention(a, b_, c, None), (q, k, v))
    print(f"A wrapper (transposes+kernel): {t*1000:7.2f} ms/layer", flush=True)
    t = bench(kernel_only(HD), (qh, kh, vh, mask))
    print(f"B kernel only hd=52:           {t*1000:7.2f} ms/layer", flush=True)
    pad = ((0, 0), (0, 0), (0, 0), (0, 64 - HD))
    qh64 = jax.device_put(jnp.pad(qh, pad))
    kh64 = jax.device_put(jnp.pad(kh, pad))
    vh64 = jax.device_put(jnp.pad(vh, pad))
    t = bench(kernel_only(64), (qh64, kh64, vh64, mask))
    print(f"C kernel only hd=64 padded:    {t*1000:7.2f} ms/layer", flush=True)
    t = bench(xla_attn, (q, k, v))
    print(f"D XLA einsum on [B,T,H,hd]:    {t*1000:7.2f} ms/layer", flush=True)


if __name__ == "__main__":
    main()
