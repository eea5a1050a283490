"""Pallas flash-decode attention for single-token cross-attention.

The decode hot loop's dominant cost is streaming the cross-KV cache every
step; XLA's batched s=1 attention einsum reaches only ~25% of HBM
bandwidth on v5e (measured ~183 GB/s at head_dim 52).  This kernel
computes one token's attention over [T] cached keys/values with the
standard flash running-softmax, tiled over T with the output block
revisited across the T grid axis so partials accumulate in VMEM scratch —
each K/V byte is read exactly once.

Lane-width trick: per-head matvecs would run at 1/128 lane utilization,
so the query is expanded OUTSIDE the kernel into a block-diagonal matrix
``qbd[b, h*hd+d, h] = q[b, h, d]``; inside the kernel K/V blocks reshape
to [T_BLK, H*hd] and

    logits = K2d @ qbd         (one [T_BLK, H*hd] x [H*hd, H] MXU matmul)
    out   += sum_t repeat(p, hd) * V2d   (full-width VPU multiply-reduce)

which keeps all 128 lanes busy for both phases.

Used for the decoder's cross-attention when q_len == 1 on TPU; the jnp
einsum path remains the fallback (CPU tests, multi-token verify passes).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

T_BLK = 512

_NEG_INF = -1e30


def _kernel(len_ref, qbd_ref, expand_ref, k_ref, v_ref, o_ref, m_ref, l_ref, acc_ref):
    """Grid (B, nT). Blocks: qbd [1,H*hd,H], expand [H,H*hd] head->column
    one-hot map, k/v [1,T_BLK,H*hd], o [1,1,H*hd].

    Scratch: m/l [1,H] running max/denominator, acc [1,H*hd] fp32.
    len_ref: scalar-prefetch [B] valid key counts.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b = pl.program_id(0)
    t = pl.program_id(1)
    n_t = pl.num_programs(1)

    @pl.when(t == 0)
    def _init():
        m_ref[...] = jnp.full_like(m_ref, _NEG_INF)
        l_ref[...] = jnp.zeros_like(l_ref)
        acc_ref[...] = jnp.zeros_like(acc_ref)

    hhd = qbd_ref.shape[1]
    n_heads = qbd_ref.shape[2]
    hd = hhd // n_heads
    t_blk = k_ref.shape[1]
    scale = hd ** -0.5

    k2d = k_ref[0].astype(jnp.float32)  # [T_BLK, H*hd]
    v2d = v_ref[0].astype(jnp.float32)
    qbd = qbd_ref[0].astype(jnp.float32)  # [H*hd, H]

    logits = (
        jnp.dot(k2d, qbd, preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST)
        * scale
    )  # [T_BLK, H]

    valid_len = len_ref[b]
    row = jax.lax.broadcasted_iota(jnp.int32, (t_blk, n_heads), 0) + t * t_blk
    logits = jnp.where(row < valid_len, logits, _NEG_INF)

    m_prev = m_ref[...]  # [1, H]
    l_prev = l_ref[...]
    m_cur = jnp.maximum(m_prev, jnp.max(logits, axis=0, keepdims=True))
    alpha = jnp.exp(m_prev - m_cur)  # [1, H]
    p = jnp.exp(logits - m_cur)  # [T_BLK, H]
    l_ref[...] = l_prev * alpha + jnp.sum(p, axis=0, keepdims=True)
    m_ref[...] = m_cur

    # Expand head weights to head*hd columns with a one-hot matmul
    # (pltpu.repeat tiles rather than element-repeats) and reduce over time
    # at full lane width.
    E = expand_ref[...].astype(jnp.float32)  # [H, H*hd]
    p_exp = jnp.dot(p, E, preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST)  # [T_BLK, H*hd]
    alpha_exp = jnp.dot(alpha, E, preferred_element_type=jnp.float32,
                        precision=jax.lax.Precision.HIGHEST)
    acc_ref[...] = acc_ref[...] * alpha_exp + jnp.sum(
        p_exp * v2d, axis=0, keepdims=True
    )

    @pl.when(t == n_t - 1)
    def _finish():
        l_exp = jnp.dot(
            jnp.maximum(l_ref[...], 1e-30), E, preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        o_ref[0] = (acc_ref[...] / jnp.maximum(l_exp, 1e-30)).astype(o_ref.dtype)


@partial(jax.jit, static_argnames=("interpret",))
def flash_decode_attention(
    q: jnp.ndarray,  # [B, H, hd] single query token per row
    k: jnp.ndarray,  # [B, T, H, hd]
    v: jnp.ndarray,  # [B, T, H, hd]
    lengths: jnp.ndarray,  # [B] int32 valid key counts
    interpret: bool = False,  # run under the Pallas interpreter (CPU tests)
) -> jnp.ndarray:
    """Returns [B, H, hd]; equals masked softmax(qk)v over valid keys."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, t, h, hd = k.shape
    t_pad = ((t + T_BLK - 1) // T_BLK) * T_BLK
    if t_pad != t:
        pad = [(0, 0), (0, t_pad - t), (0, 0), (0, 0)]
        k = jnp.pad(k, pad)
        v = jnp.pad(v, pad)
    n_t = t_pad // T_BLK

    # Block-diagonal query: qbd[b, h*hd + d, h] = q[b, h, d].
    eye = jnp.eye(h, dtype=q.dtype)  # [H, H]
    qbd = jnp.einsum(
        "bhd,hg->bhdg", q, eye, precision=jax.lax.Precision.HIGHEST
    ).reshape(b, h * hd, h)
    # Head -> column-group one-hot expansion map E[h, h*hd + d] = 1.
    expand = jnp.repeat(jnp.eye(h, dtype=jnp.float32), hd, axis=1).reshape(h, h * hd)

    k2 = k.reshape(b, t_pad, h * hd)
    v2 = v.reshape(b, t_pad, h * hd)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b, n_t),
        in_specs=[
            pl.BlockSpec((1, h * hd, h), lambda i, j, *_: (i, 0, 0)),
            pl.BlockSpec((h, h * hd), lambda i, j, *_: (0, 0)),
            pl.BlockSpec((1, T_BLK, h * hd), lambda i, j, *_: (i, j, 0)),
            pl.BlockSpec((1, T_BLK, h * hd), lambda i, j, *_: (i, j, 0)),
        ],
        out_specs=pl.BlockSpec((1, 1, h * hd), lambda i, j, *_: (i, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((1, h), jnp.float32),
            pltpu.VMEM((1, h), jnp.float32),
            pltpu.VMEM((1, h * hd), jnp.float32),
        ],
    )
    out = pl.pallas_call(
        _kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, 1, h * hd), q.dtype),
        interpret=interpret,
    )(lengths.astype(jnp.int32), qbd, expand, k2, v2)
    return out.reshape(b, h, hd)


def reference_decode_attention(q, k, v, lengths):
    """jnp oracle with identical semantics (also the non-TPU fallback)."""
    scale = q.shape[-1] ** -0.5
    logits = jnp.einsum("bhd,bthd->bht", q.astype(jnp.float32), k.astype(jnp.float32)) * scale
    mask = jnp.arange(k.shape[1])[None, None, :] < lengths[:, None, None]
    logits = jnp.where(mask, logits, -1e30)
    w = jax.nn.softmax(logits, axis=-1)
    return jnp.einsum("bht,bthd->bhd", w, v.astype(jnp.float32)).astype(q.dtype)
