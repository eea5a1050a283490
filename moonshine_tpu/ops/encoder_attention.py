"""Pallas encoder self-attention with logits kept in VMEM.

The offline encoder's XLA attention materializes fp32 logits
``[B, H, T, T]`` to HBM and re-reads them through softmax and the AV
product — at the bench shape (B=128, H=8, T=415) that is ~705 MB written
+ re-read per layer, ~2.5 GB of HBM traffic for ~37 GFLOP of matmul:
bandwidth-bound at ~5.8 ms/layer where compute alone is ~0.5 ms
(docs/PERF.md).  The stock ``jax.experimental.pallas.ops.tpu.flash_attention``
loses at these shapes too (hd=52 → its hd-minor blocking pads lanes
52→128 and its multi-block running softmax is overhead at T=415).

This kernel exploits the workload's actual scale: one (batch, head)'s
whole problem — Q/K/V [415, 52] and fp32 logits [415, 415] — fits in
VMEM at once (~1.2 MB padded), so no flash-style streaming softmax is
needed at all.  Grid over (B, H); per program:

    logits = Q K^T * scale   (f32 accumulate on the MXU)
    softmax with key-validity mask, entirely in VMEM
    out = P V                (f32 accumulate, cast back to the I/O dtype)

Numerics match the XLA path's "fp32 logits" policy exactly: bf16 inputs,
f32 scores/softmax/AV accumulation — the configuration the accuracy
analysis requires (bf16 logits were measured to cost accuracy and save
only 16%, docs/PERF.md).

Layout note: operands arrive head-major [B, H, T, hd]; the producing
layer transposes from [B, T, H, hd] (three ~44 MB moves — noise next to
the 2.5 GB this kernel removes).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e9


def _attn_kernel(q_ref, k_ref, v_ref, mask_ref, o_ref, *, scale: float):
    q = q_ref[0, 0].astype(jnp.float32)  # [T, hd]
    k = k_ref[0, 0].astype(jnp.float32)
    logits = (
        jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        * scale
    )  # [T, T]
    mask = mask_ref[0]  # [1, T] int32 key validity; broadcasts over query rows
    logits = jnp.where(mask != 0, logits, NEG_INF)
    m = jnp.max(logits, axis=-1, keepdims=True)
    p = jnp.exp(logits - m)
    w = p / jnp.sum(p, axis=-1, keepdims=True)
    v = v_ref[0, 0].astype(jnp.float32)
    o = jnp.dot(w, v, preferred_element_type=jnp.float32)  # [T, hd]
    o_ref[0, 0] = o.astype(o_ref.dtype)


@partial(jax.jit, static_argnames=("interpret",))
def encoder_attention(
    q: jnp.ndarray,  # [B, T, H, hd]
    k: jnp.ndarray,  # [B, T, H, hd]
    v: jnp.ndarray,  # [B, T, H, hd]
    frame_mask: jnp.ndarray | None,  # [B, T] bool key validity (None = all valid)
    interpret: bool = False,
) -> jnp.ndarray:
    """Full (non-causal) self-attention; returns [B, T, H, hd].

    Drop-in for the encoder's ``_attention(q, k, v, mask)`` with the
    key-validity mask semantics of ``encoder_apply`` (mask[b, t] False
    ⇒ key t of batch b attends to nothing / is attended by nothing that
    matters — padded rows produce garbage that downstream masking drops,
    exactly like the XLA path).
    """
    b, t, h, hd = q.shape
    # [B, 1, T] — the unit middle dim keeps the block's trailing two dims
    # equal to the array dims (Mosaic's block-shape divisibility rule).
    if frame_mask is None:
        mask_i32 = jnp.ones((b, 1, t), jnp.int32)
    else:
        mask_i32 = frame_mask.astype(jnp.int32)[:, None, :]

    qh = q.transpose(0, 2, 1, 3)  # [B, H, T, hd]
    kh = k.transpose(0, 2, 1, 3)
    vh = v.transpose(0, 2, 1, 3)

    scale = float(hd) ** -0.5
    grid = (b, h)
    blk = pl.BlockSpec((1, 1, t, hd), lambda i, j: (i, j, 0, 0), memory_space=pltpu.VMEM)
    mask_blk = pl.BlockSpec((1, 1, t), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM)

    out = pl.pallas_call(
        partial(_attn_kernel, scale=scale),
        out_shape=jax.ShapeDtypeStruct((b, h, t, hd), q.dtype),
        grid=grid,
        in_specs=[blk, blk, blk, mask_blk],
        out_specs=blk,
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * b * h * t * t * hd,
            bytes_accessed=4 * b * h * t * hd * q.dtype.itemsize + b * t * 4,
            transcendentals=b * h * t * t,
        ),
        interpret=interpret,
    )(qh, kh, vh, mask_i32)
    return out.transpose(0, 2, 1, 3)  # [B, T, H, hd]


def _packed_kernel(q_ref, kt_ref, v_ref, mask_ref, o_ref, *,
                   heads: int, head_dim: int, scale: float):
    # Three MXU-rate fixes (round 4; scripts/spike_attn_bf16_mxu.py +
    # docs/PERF.md):  q/kt stay bf16 into the dot (fp32 ACCUMULATION
    # unchanged — the explicit astype(f32) made Mosaic materialize fp32
    # VMEM copies of values holding only bf16 information; maxdiff 0.0);
    # the K=hd contraction zero-pads to 128 lanes IN VMEM ([T,52]x[52,T]
    # runs the MXU at ~10%, the zero-padded [T,128]x[128,T] is
    # bit-identical and markedly faster); softmax weights cast bf16 for
    # the AV dot (fp32 accumulation) — the same operand dtypes the XLA
    # path feeds its attention einsum.
    mask = mask_ref[0]  # [1, T] int32 key validity; broadcasts over rows
    kpad = 128 - head_dim if head_dim < 128 else 0
    for h in range(heads):
        sl = slice(h * head_dim, (h + 1) * head_dim)
        q = q_ref[0][:, sl]   # [T, hd]
        kt = kt_ref[0][sl, :]  # [hd, T]
        if kpad:
            q = jnp.pad(q, ((0, 0), (0, kpad)))
            kt = jnp.pad(kt, ((0, kpad), (0, 0)))
        logits = (
            jax.lax.dot_general(
                q, kt, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            * scale
        )
        logits = jnp.where(mask != 0, logits, NEG_INF)
        m = jnp.max(logits, axis=-1, keepdims=True)
        p = jnp.exp(logits - m)
        w = (p / jnp.sum(p, axis=-1, keepdims=True)).astype(q_ref.dtype)
        v = v_ref[0][:, sl]
        o_ref[0, :, sl] = jnp.dot(
            w, v, preferred_element_type=jnp.float32
        ).astype(o_ref.dtype)


@partial(jax.jit, static_argnames=("heads", "interpret"))
def encoder_attention_packed(
    q: jnp.ndarray,   # [B, T, H*hd] — heads packed on lanes (NOT split)
    kt: jnp.ndarray,  # [B, H*hd, T] — keys dim-major
    v: jnp.ndarray,   # [B, T, H*hd]
    frame_mask: jnp.ndarray | None,  # [B, T] bool key validity
    heads: int,
    interpret: bool = False,
) -> jnp.ndarray:
    """Packed-layout VMEM attention; returns [B, T, H*hd].

    Second-generation layout of ``encoder_attention``: the per-(b, h)
    [T, 52] blocks of the original grid are DMA-latency bound — a
    copy-only kernel over them costs 13.4 ms at B=512 where the full
    packed kernel costs 9.3 (scripts/spike_attn_dma_floor.py,
    spike_attn_multirow.py).  Blocks here are the lane-exact packed
    [T, H*hd=416] projections the encoder layer already produces (no
    head-split relayout in or out; K pre-transposed dim-major so QK^T is
    a standard M-K-N GEMM); per-head structure is recovered with static
    in-VMEM lane slices.  Math per head is identical to the original
    kernel (fp32 logits/softmax/AV) — maxdiff 0.0 measured.
    """
    b, t, d = q.shape
    hd = d // heads
    if frame_mask is None:
        mask_i32 = jnp.ones((b, 1, t), jnp.int32)
    else:
        mask_i32 = frame_mask.astype(jnp.int32)[:, None, :]
    scale = float(hd) ** -0.5
    blk = pl.BlockSpec((1, t, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    ktblk = pl.BlockSpec((1, d, t), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    mask_blk = pl.BlockSpec((1, 1, t), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        partial(_packed_kernel, heads=heads, head_dim=hd, scale=scale),
        out_shape=jax.ShapeDtypeStruct((b, t, d), q.dtype),
        grid=(b,),
        in_specs=[blk, ktblk, blk, mask_blk],
        out_specs=blk,
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * b * heads * t * t * hd,
            bytes_accessed=4 * b * t * d * q.dtype.itemsize + b * t * 4,
            transcendentals=b * heads * t * t,
        ),
        interpret=interpret,
    )(q, kt, v, mask_i32)


def encoder_attention_packed_sharded(
    q: jnp.ndarray,   # [B, T, H*hd]
    kt: jnp.ndarray,  # [B, H*hd, T]
    v: jnp.ndarray,   # [B, T, H*hd]
    frame_mask: jnp.ndarray | None,  # [B, T]
    heads: int,
    mesh,
    interpret: bool = False,
) -> jnp.ndarray:
    """Packed kernel under GSPMD via shard_map (see
    ``encoder_attention_sharded``): batch shards over ``data``; the
    packed head axis shards over ``model`` in contiguous whole-head
    blocks (H % model == 0 ⇒ each shard's lane slice is a whole number
    of heads, so the per-shard kernel just runs with heads/model)."""
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    b, t, d = q.shape
    data, model = mesh.axis_names
    n_model = mesh.shape[model]
    if heads % n_model:
        raise ValueError(f"heads {heads} not divisible by model axis {n_model}")
    if frame_mask is None:
        frame_mask = jnp.ones((b, t), bool)
    fn = shard_map(
        lambda qq, kk, vv, mm: encoder_attention_packed(
            qq, kk, vv, mm, heads=heads // n_model, interpret=interpret),
        mesh=mesh,
        in_specs=(P(data, None, model), P(data, model, None),
                  P(data, None, model), P(data, None)),
        out_specs=P(data, None, model),
        check_vma=False,
    )
    return fn(q, kt, v, frame_mask)


def encoder_attention_sharded(
    q: jnp.ndarray,  # [B, T, H, hd]
    k: jnp.ndarray,
    v: jnp.ndarray,
    frame_mask: jnp.ndarray | None,  # [B, T]
    mesh,
    interpret: bool = False,
) -> jnp.ndarray:
    """The VMEM-attention kernel under GSPMD, via shard_map.

    A pallas_call is an opaque custom call GSPMD cannot repartition, so
    sharded callers previously fell back to XLA and gave the kernel's
    1.33x back (round-2 SCALING.md caveat).  shard_map makes the
    partitioning explicit instead: batch shards over the ``data`` axis
    and heads over the ``model`` axis (the Megatron head split of
    parallel/sharding.py), and each shard runs the unmodified kernel on
    its local [B/d, T, H/m, hd] block — attention is embarrassingly
    parallel over (batch, head), so no collectives are introduced.

    Requires B % mesh.data == 0 and H % mesh.model == 0 (the same
    divisibility the sharding rules already demand).
    """
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    b, t, h, hd = q.shape
    data, model = mesh.axis_names
    qkv_spec = P(data, None, model, None)
    if frame_mask is None:
        frame_mask = jnp.ones((b, t), bool)
    fn = shard_map(
        lambda qq, kk, vv, mm: encoder_attention(qq, kk, vv, mm, interpret=interpret),
        mesh=mesh,
        in_specs=(qkv_spec, qkv_spec, qkv_spec, P(data, None)),
        out_specs=qkv_spec,
        # pallas_call output carries no varying-mesh-axes annotation; the
        # partitioning is fully described by the specs above.
        check_vma=False,
    )
    return fn(q, k, v, frame_mask)
