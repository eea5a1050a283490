"""SPIKE (not shipped): Pallas flash-decode attention for s=1 cross-attention.

Demoted from ``moonshine_tpu/ops/`` in round 3: numerically exact but
slower than the XLA einsum it would replace on this toolchain (details
below), so it is kept here as a writeup + runnable experiment rather
than as unwired product code.  Run ``python decode_attention_spike.py``
for an interpreter-mode self-check against the oracle.

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

Status: numerically exact vs the oracle (1e-7 fp32, compiled on TPU) and
covered by interpreter-mode tests, but NOT yet wired into the decode path:
on the current v5e remote-compile toolchain Mosaic schedules this kernel
at ~50-90 GB/s — below XLA's ~183 GB/s einsum — with a ~2 ms/call floor
that is flat in batch size, i.e. pipeline-overhead-bound rather than
bandwidth-bound.  The jnp einsum path (reference_decode_attention) is the
production route until the scheduler gap is profiled out.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

T_BLK = 128

_NEG_INF = -1e30


def _kernel(len_ref, qbd_ref, expand_ref, k_ref, v_ref, o_ref, m_ref, l_ref, acc_ref):
    """Grid (B/B_BLK, nT). Blocks: qbd [B_BLK,H*hd,H], expand [H,H*hd]
    head->column one-hot map, k/v [B_BLK,T_BLK,H*hd], o [B_BLK,1,H*hd].

    Output block: [B_BLK, H*hd] (2D — 3D stores trip Mosaic shape casts).
    Scratch: m/l [B_BLK,H] running max/denominator, acc [B_BLK,H*hd] fp32.
    len_ref: scalar-prefetch [B] valid key counts.  The row loop is
    unrolled so every op stays a 2D matmul/reduce; multiple rows per
    program amortize the per-program pipeline overhead that made a
    one-row-per-program version latency-bound.
    """
    from jax.experimental import pallas as pl

    bb = pl.program_id(0)
    t = pl.program_id(1)
    n_t = pl.num_programs(1)

    @pl.when(t == 0)
    def _init():
        m_ref[...] = jnp.full_like(m_ref, _NEG_INF)
        l_ref[...] = jnp.zeros_like(l_ref)
        acc_ref[...] = jnp.zeros_like(acc_ref)

    b_blk = k_ref.shape[0]
    hhd = qbd_ref.shape[1]
    n_heads = qbd_ref.shape[2]
    hd = hhd // n_heads
    t_blk = k_ref.shape[1]
    scale = hd ** -0.5
    E = expand_ref[...].astype(jnp.float32)  # [H, H*hd]
    hi = jax.lax.Precision.HIGHEST
    row_base = jax.lax.broadcasted_iota(jnp.int32, (t_blk, n_heads), 0) + t * t_blk

    for i in range(b_blk):
        k2d = k_ref[i].astype(jnp.float32)  # [T_BLK, H*hd]
        v2d = v_ref[i].astype(jnp.float32)
        qbd = qbd_ref[i].astype(jnp.float32)  # [H*hd, H]
        logits = jnp.dot(k2d, qbd, preferred_element_type=jnp.float32,
                         precision=hi) * scale  # [T_BLK, H]
        valid_len = len_ref[bb * b_blk + i]
        logits = jnp.where(row_base < valid_len, logits, _NEG_INF)

        m_prev = m_ref[i : i + 1, :]  # [1, H]
        l_prev = l_ref[i : i + 1, :]
        m_cur = jnp.maximum(m_prev, jnp.max(logits, axis=0, keepdims=True))
        alpha = jnp.exp(m_prev - m_cur)
        p = jnp.exp(logits - m_cur)  # [T_BLK, H]
        l_ref[i : i + 1, :] = l_prev * alpha + jnp.sum(p, axis=0, keepdims=True)
        m_ref[i : i + 1, :] = m_cur

        p_exp = jnp.dot(p, E, preferred_element_type=jnp.float32, precision=hi)
        alpha_exp = jnp.dot(alpha, E, preferred_element_type=jnp.float32, precision=hi)
        acc_ref[i : i + 1, :] = acc_ref[i : i + 1, :] * alpha_exp + jnp.sum(
            p_exp * v2d, axis=0, keepdims=True
        )

    @pl.when(t == n_t - 1)
    def _finish():
        l_exp = jnp.dot(
            jnp.maximum(l_ref[...], 1e-30), E, preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )  # [B_BLK, H*hd]
        o_ref[...] = (acc_ref[...] / jnp.maximum(l_exp, 1e-30)).astype(o_ref.dtype)


@partial(jax.jit, static_argnames=("interpret", "b_blk"))
def flash_decode_attention(
    q: jnp.ndarray,  # [B, H, hd] single query token per row
    k: jnp.ndarray,  # [B, T, H, hd]
    v: jnp.ndarray,  # [B, T, H, hd]
    lengths: jnp.ndarray,  # [B] int32 valid key counts
    interpret: bool = False,  # run under the Pallas interpreter (CPU tests)
    b_blk: int = 8,  # batch rows per program (8 = sublane tile; VMEM-bounded)
) -> jnp.ndarray:
    """Returns [B, H, hd]; equals masked softmax(qk)v over valid keys."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, t, h, hd = k.shape
    t_pad = ((t + T_BLK - 1) // T_BLK) * T_BLK
    b_blk = min(b_blk, b)
    b_pad = ((b + b_blk - 1) // b_blk) * b_blk
    if t_pad != t or b_pad != b:
        pad = [(0, b_pad - b), (0, t_pad - t), (0, 0), (0, 0)]
        k = jnp.pad(k, pad)
        v = jnp.pad(v, pad)
        q = jnp.pad(q, [(0, b_pad - b), (0, 0), (0, 0)])
        lengths = jnp.pad(lengths, (0, b_pad - b), constant_values=1)
    n_t = t_pad // T_BLK
    n_b = b_pad // b_blk

    # Block-diagonal query: qbd[b, h*hd + d, h] = q[b, h, d].
    eye = jnp.eye(h, dtype=q.dtype)  # [H, H]
    qbd = jnp.einsum(
        "bhd,hg->bhdg", q, eye, precision=jax.lax.Precision.HIGHEST
    ).reshape(b_pad, h * hd, h)
    # Head -> column-group one-hot expansion map E[h, h*hd + d] = 1.
    expand = jnp.repeat(jnp.eye(h, dtype=jnp.float32), hd, axis=1).reshape(h, h * hd)

    k2 = k.reshape(b_pad, t_pad, h * hd)
    v2 = v.reshape(b_pad, t_pad, h * hd)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_b, n_t),
        in_specs=[
            pl.BlockSpec((b_blk, h * hd, h), lambda i, j, *_: (i, 0, 0)),
            pl.BlockSpec((h, h * hd), lambda i, j, *_: (0, 0)),
            pl.BlockSpec((b_blk, T_BLK, h * hd), lambda i, j, *_: (i, j, 0)),
            pl.BlockSpec((b_blk, T_BLK, h * hd), lambda i, j, *_: (i, j, 0)),
        ],
        out_specs=pl.BlockSpec((b_blk, h * hd), lambda i, j, *_: (i, 0)),
        scratch_shapes=[
            pltpu.VMEM((b_blk, h), jnp.float32),
            pltpu.VMEM((b_blk, h), jnp.float32),
            pltpu.VMEM((b_blk, h * hd), jnp.float32),
        ],
    )
    out = pl.pallas_call(
        _kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b_pad, h * hd), q.dtype),
        interpret=interpret,
    )(lengths.astype(jnp.int32), qbd, expand, k2, v2)
    return out[:b].reshape(b, h, hd)


def reference_decode_attention(q, k, v, lengths):
    """jnp oracle with identical semantics (also the non-TPU fallback)."""
    scale = q.shape[-1] ** -0.5
    logits = jnp.einsum("bhd,bthd->bht", q.astype(jnp.float32), k.astype(jnp.float32)) * scale
    mask = jnp.arange(k.shape[1])[None, None, :] < lengths[:, None, None]
    logits = jnp.where(mask, logits, -1e30)
    w = jax.nn.softmax(logits, axis=-1)
    return jnp.einsum("bht,bthd->bhd", w, v.astype(jnp.float32)).astype(q.dtype)


if __name__ == "__main__":
    # Interpreter-mode self-check vs the oracle (was tests/test_decode_attention.py).
    key = jax.random.PRNGKey(0)
    for t in (7, 256, 417, 600):
        b, h, hd = 3, 8, 52
        q = jax.random.normal(key, (b, h, hd), jnp.float32)
        k = jax.random.normal(jax.random.PRNGKey(1), (b, t, h, hd), jnp.float32)
        v = jax.random.normal(jax.random.PRNGKey(2), (b, t, h, hd), jnp.float32)
        lengths = jnp.asarray([t, max(t // 2, 1), 1], jnp.int32)
        ref = np.asarray(reference_decode_attention(q, k, v, lengths))
        out = np.asarray(flash_decode_attention(q, k, v, lengths, interpret=True))
        np.testing.assert_allclose(out, ref, atol=2e-5, rtol=1e-4)
        print(f"T={t}: max|Δ|={np.abs(out - ref).max():.2e} OK")
    print("spike self-check passed")
