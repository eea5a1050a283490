"""Pallas beam-reorder gather: permute KV-cache rows at DMA speed.

Beam search reorders the self-KV caches by parent index every step.
XLA lowers ``jnp.take(cache, parent, axis=1)`` on ``[L, B*K, H, hd, S]``
to a scalar-ish gather that measures ~28 GB/s effective on this
toolchain — 12.5 ms/step of pure bookkeeping at the bench shapes, ~2.3x
the attention itself (docs/PERF.md beam section; even an identity
permutation pays it, measured via beam_size=1 isolation).

The access pattern is actually trivial: each destination row wants ONE
whole source row — a block copy whose source index comes from a small
int32 vector.  That is exactly what scalar-prefetched block specs are
for: grid ``(L, B)``, block ``[1, 1, H, hd, S]``, input index map
``(l, idx[b], ...)`` — Mosaic double-buffers the HBM->HBM row copies and
the gather runs at DMA bandwidth instead of the gather path.

K and V ride one kernel (same index vector, one grid pass).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _gather_kernel(idx_ref, k_ref, v_ref, ko_ref, vo_ref):
    # Blocks arrive pre-sliced by the index maps; the body is a pure copy.
    ko_ref[...] = k_ref[...]
    vo_ref[...] = v_ref[...]


@partial(jax.jit, static_argnames=("interpret",))
def gather_kv_rows(
    k_self: jnp.ndarray,  # [L, B, H, hd, S]
    v_self: jnp.ndarray,  # [L, B, H, hd, S]
    idx: jnp.ndarray,  # [B] int32 source row per destination row
    interpret: bool = False,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Returns (k_self[:, idx], v_self[:, idx]) as fresh arrays."""
    l, b, h, hd, s = k_self.shape

    def in_map(li, bi, idx_ref):
        return (li, idx_ref[bi], 0, 0, 0)

    def out_map(li, bi, idx_ref):
        return (li, bi, 0, 0, 0)

    blk_in = pl.BlockSpec((1, 1, h, hd, s), in_map)
    blk_out = pl.BlockSpec((1, 1, h, hd, s), out_map)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(l, b),
        in_specs=[blk_in, blk_in],
        out_specs=[blk_out, blk_out],
    )
    return pl.pallas_call(
        _gather_kernel,
        out_shape=[
            jax.ShapeDtypeStruct(k_self.shape, k_self.dtype),
            jax.ShapeDtypeStruct(v_self.shape, v_self.dtype),
        ],
        grid_spec=grid_spec,
        cost_estimate=pl.CostEstimate(
            flops=0,
            bytes_accessed=4 * l * b * h * hd * s * k_self.dtype.itemsize,
            transcendentals=0,
        ),
        interpret=interpret,
    )(idx.astype(jnp.int32), k_self, v_self)


def _gather_scale_kernel(idx_ref, ks_ref, vs_ref, kso_ref, vso_ref):
    kso_ref[...] = ks_ref[...]
    vso_ref[...] = vs_ref[...]


@partial(jax.jit, static_argnames=("interpret",))
def gather_scale_rows(
    k_scale: jnp.ndarray,  # [L, B, H, S] per-column int8 KV scales
    v_scale: jnp.ndarray,  # [L, B, H, S]
    idx: jnp.ndarray,  # [B] int32
    interpret: bool = False,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Row gather for the int8-KV scale arrays (same pattern as
    :func:`gather_kv_rows`, 4-D blocks)."""
    l, b, h, s = k_scale.shape

    def in_map(li, bi, idx_ref):
        return (li, idx_ref[bi], 0, 0)

    def out_map(li, bi, idx_ref):
        return (li, bi, 0, 0)

    blk_in = pl.BlockSpec((1, 1, h, s), in_map)
    blk_out = pl.BlockSpec((1, 1, h, s), out_map)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(l, b),
        in_specs=[blk_in, blk_in],
        out_specs=[blk_out, blk_out],
    )
    return pl.pallas_call(
        _gather_scale_kernel,
        out_shape=[
            jax.ShapeDtypeStruct(k_scale.shape, k_scale.dtype),
            jax.ShapeDtypeStruct(v_scale.shape, v_scale.dtype),
        ],
        grid_spec=grid_spec,
        interpret=interpret,
    )(idx.astype(jnp.int32), k_scale, v_scale)
