"""Interleaved partial rotary position embeddings.

Matches the published Moonshine rotary convention: GPT-NeoX-style
*interleaved* pairs over the first ``rotary_dim`` channels of each head,
pass-through for the remainder (partial_rotary_factor 0.9), computed in
float32 regardless of activation dtype.
"""

from __future__ import annotations

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


def apply_rotary(x: jnp.ndarray, cos: jnp.ndarray, sin: jnp.ndarray) -> jnp.ndarray:
    """Apply interleaved rotation to the leading rotary channels of x.

    x: [..., S, H, head_dim] (head axis after sequence), cos/sin: [S, half]
    or broadcastable [..., S, half].  Rotates channel pairs (2i, 2i+1) of the
    first 2*half channels; channels beyond pass through unchanged.
    """
    half = cos.shape[-1]
    rot = 2 * half
    x_rot = x[..., :rot]
    x_pass = x[..., rot:]
    shape = x_rot.shape[:-1] + (half, 2)
    xr = x_rot.reshape(shape)
    x_even = xr[..., 0]
    x_odd = xr[..., 1]
    # Broadcast cos/sin over the head axis: [S, half] -> [S, 1, half].
    c = jnp.expand_dims(cos, -2).astype(x.dtype)
    s = jnp.expand_dims(sin, -2).astype(x.dtype)
    out_even = x_even * c - x_odd * s
    out_odd = x_odd * c + x_even * s
    out = jnp.stack([out_even, out_odd], axis=-1).reshape(x_rot.shape)
    return jnp.concatenate([out, x_pass], axis=-1)
