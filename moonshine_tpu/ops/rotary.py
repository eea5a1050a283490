"""Interleaved partial rotary position embeddings.

Matches the published Moonshine rotary convention: GPT-NeoX-style
*interleaved* pairs over the first ``rotary_dim`` channels of each head,
pass-through for the remainder (partial_rotary_factor 0.9), computed in
float32 regardless of activation dtype.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def rotary_tables(positions: jnp.ndarray, rotary_dim: int, theta: float) -> tuple[jnp.ndarray, jnp.ndarray]:
    """cos/sin tables for integer positions.

    positions: [...], any int shape. Returns cos, sin of shape
    [..., rotary_dim // 2] in float32.
    """
    half = rotary_dim // 2
    inv_freq = 1.0 / (theta ** (jnp.arange(0, half, dtype=jnp.float32) * 2.0 / rotary_dim))
    angles = positions.astype(jnp.float32)[..., None] * inv_freq  # [..., half]
    return jnp.cos(angles), jnp.sin(angles)


def fullwidth_tables(cos: jnp.ndarray, sin: jnp.ndarray, head_dim: int) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Per-channel C/S tables of width ``head_dim`` (fp32).

    C[2i] = C[2i+1] = cos_i;  S[2i] = -sin_i, S[2i+1] = +sin_i;
    pass-through channels (>= 2*half) get C=1, S=0, so
    ``rot(x) = x * C + pair_swap(x) * S`` across the whole head width.
    """
    half = cos.shape[-1]
    rot = 2 * half
    c2 = jnp.repeat(cos, 2, axis=-1)
    sign = jnp.tile(jnp.asarray([-1.0, 1.0], cos.dtype), half)
    s2 = jnp.repeat(sin, 2, axis=-1) * sign
    if rot < head_dim:
        pad = [(0, 0)] * (c2.ndim - 1) + [(0, head_dim - rot)]
        c2 = jnp.pad(c2, pad, constant_values=1.0)
        s2 = jnp.pad(s2, pad, constant_values=0.0)
    return c2, s2


def pair_swap_perm(head_dim: int, half: int, heads: int = 1) -> np.ndarray:
    """Output-channel permutation realizing pair_swap on ``heads`` blocks.

    For each head block: channel 2i <-> 2i+1 for i < half; channels
    >= 2*half map to themselves (their S table entry is 0 anyway).
    """
    perm = np.arange(head_dim)
    idx = np.arange(half)
    perm[2 * idx] = 2 * idx + 1
    perm[2 * idx + 1] = 2 * idx
    return (perm[None, :] + head_dim * np.arange(heads)[:, None]).reshape(-1)


def swap_dense_params(p: dict, perm: np.ndarray) -> dict:
    """Permute a dense layer's OUTPUT channels: y' = y[..., perm].

    Exact (a gather of weight columns, no arithmetic), so
    ``dense(swap_dense_params(p, perm), x)`` is bit-identical to
    ``dense(p, x)[..., perm]`` — the same multiplies accumulate in the
    same order per output element.  Handles fp32/bf16 ("w") and w8a8
    ("w_q"/"w_scale") layouts.
    """
    out = dict(p)
    if "w" in out:
        out["w"] = out["w"][:, perm]
    if "w_q" in out:
        out["w_q"] = out["w_q"][:, perm]
    if "w_scale" in out:
        out["w_scale"] = out["w_scale"][..., perm]
    if "b" in out:
        out["b"] = out["b"][perm]
    return out


def apply_rotary_fullwidth(
    x: jnp.ndarray,       # [..., S, H*head_dim] — heads NOT split
    x_swap: jnp.ndarray,  # pair-swapped projection of the same input
    cos: jnp.ndarray,     # [S, half] (or broadcastable)
    sin: jnp.ndarray,
    head_dim: int,
    heads: int,
) -> jnp.ndarray:
    """Rotary on the pre-head-split [..., S, D] projection.

    The hot-path formulation: the [B, S, H, hd] layout tiles (H, hd) on
    (sublanes, lanes) and pads 8->16 x 52->128 = 4.9x, so every
    elementwise op on the split tensor reads ~5 physical bytes per
    logical byte.  Applying the rotation at full width [B, S, D] (D=416
    lane-exact) with the swap folded into the projection weights
    (swap_dense_params) costs one extra QK-sized GEMM each for q/k and
    ZERO shuffles/relayouts: measured 10.3 -> ~1.5 ms/layer on the Base
    encoder at B=512 (scripts/spike_encoder_ablation.py).
    """
    c2, s2 = fullwidth_tables(cos, sin, head_dim)
    reps = (1,) * (c2.ndim - 1) + (heads,)
    cb = jnp.tile(c2, reps).astype(x.dtype)
    sb = jnp.tile(s2, reps).astype(x.dtype)
    return x * cb + x_swap * sb


def apply_rotary(x: jnp.ndarray, cos: jnp.ndarray, sin: jnp.ndarray) -> jnp.ndarray:
    """Apply interleaved rotation to the leading rotary channels of x.

    x: [..., S, H, head_dim] (head axis after sequence), cos/sin: [S, half]
    or broadcastable [..., S, half].  Rotates channel pairs (2i, 2i+1) of the
    first 2*half channels; channels beyond pass through unchanged.

    Formulated lane-friendly for TPU: the channel dim rides the 128-wide
    lanes, so the textbook even/odd strided slices + stack + concat become
    cross-lane shuffles XLA lowers very badly (measured 10.3 ms/layer of a
    30.6 ms Base encoder layer at B=512 — a third of the layer,
    scripts/spike_encoder_ablation.py).  The identical math as elementwise
    ops on full-width tables plus ONE constant pair-swap permutation matmul
    (tiny [hd, hd] GEMM the MXU fuses with the surrounding graph):

        out = x * C + (x @ P) * S,   C[2i]=C[2i+1]=cos_i,
        S[2i]=-sin_i, S[2i+1]=+sin_i,  P the (2i <-> 2i+1) swap;
        pass-through channels get C=1, S=0.

    Bit-identical to the sliced form (same multiplies/adds in the same
    dtype; P is exact 0/1).
    """
    half = cos.shape[-1]
    rot = 2 * half
    hd = x.shape[-1]
    # Full-width per-channel tables (built from the [.., half] tables in
    # fp32, then cast once like the sliced form did).
    c2 = jnp.repeat(cos, 2, axis=-1)
    sign = jnp.tile(jnp.asarray([-1.0, 1.0], cos.dtype), half)
    s2 = jnp.repeat(sin, 2, axis=-1) * sign
    if rot < hd:
        pad = [(0, 0)] * (c2.ndim - 1) + [(0, hd - rot)]
        c2 = jnp.pad(c2, pad, constant_values=1.0)
        s2 = jnp.pad(s2, pad, constant_values=0.0)
    # Broadcast over the head axis: [..., S, half*2|hd] -> [..., S, 1, hd].
    c2 = jnp.expand_dims(c2, -2).astype(x.dtype)
    s2 = jnp.expand_dims(s2, -2).astype(x.dtype)
    perm = np.zeros((hd, hd), np.float32)
    idx = np.arange(half)
    perm[2 * idx + 1, 2 * idx] = 1.0
    perm[2 * idx, 2 * idx + 1] = 1.0
    x_swap = jnp.dot(x, jnp.asarray(perm, x.dtype), preferred_element_type=x.dtype)
    return x * c2 + x_swap * s2
