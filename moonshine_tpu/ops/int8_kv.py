"""Int8 KV caches with dequantization fused into the attention einsums.

Every decode step is a bandwidth-bound streaming read of the KV caches
(measured: the bf16 dim-major layout already runs at the HBM ceiling —
see docs/PERF.md), so halving the bytes is the next 1.5x.  The reference
ships per-channel int8 weights as its load-bearing deployment format
(reference: scripts/quantize-streaming-model.sh:1-10); this is the
TPU-native analog for the *activation* caches.

The trick that makes it free: with one symmetric scale per KEY COLUMN
(per cached time position, amax over head_dim), the scales commute past
both attention contractions, so no dequantized copy of the cache is ever
materialized:

  K:  logits[s,t] = sum_d q[s,d] * (k_q[d,t] * ks[t])
                  = (sum_d q[s,d] * k_q[d,t]) * ks[t]
      -> int8 einsum, then a [.., t] broadcast multiply on the logits
         (fuses with the existing mask/softmax elementwise chain).

  V:  out[s,d]    = sum_t w[s,t] * (v_q[d,t] * vs[t])
                  = sum_t (w[s,t] * vs[t]) * v_q[d,t]
      -> fold the scale into the softmax weights (fuses with the
         softmax->cast chain), then an int8 einsum.

Cache layout stays layer-major dim-major ``[.., hd, T]`` (scales
``[.., T]``).  int8 tiles are (32, 128): head_dim pads 40->64 where bf16
pads 40->48, so physical traffic is 64 B vs 96 B per key column — the
measured 1.54x per-step win (docs/PERF.md).

Quantization is per-column and write-once: a column's scale depends only
on its own head_dim vector, so incremental cache appends are exact —
no requantization, and the not-yet-written region (zeros, scale 0)
dequantizes to zeros and is masked anyway.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

NEG_INF = -1e9


def quantize_kv(x: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Per-key-column symmetric int8 quantization.

    x: [..., hd, t] (dim-major) -> (q int8 [..., hd, t], scale f32 [..., t])
    with scale = amax over hd / 127.
    """
    xf = x.astype(jnp.float32)
    amax = jnp.max(jnp.abs(xf), axis=-2)  # [..., t]
    scale = jnp.where(amax > 0, amax / 127.0, 1.0).astype(jnp.float32)
    q = jnp.clip(jnp.round(xf / scale[..., None, :]), -127, 127).astype(jnp.int8)
    return q, scale


def dequantize_kv(q: jnp.ndarray, scale: jnp.ndarray, dtype=jnp.float32) -> jnp.ndarray:
    """Rebuild a float cache (testing/interop aid — the attention path
    below never materializes this)."""
    return (q.astype(jnp.float32) * scale[..., None, :]).astype(dtype)


def attention_dm_q8(
    q: jnp.ndarray,  # [B, s, H, hd] float
    k_q: jnp.ndarray,  # [B, H, hd, T] int8
    k_s: jnp.ndarray,  # [B, H, T] f32
    v_q: jnp.ndarray,  # [B, H, hd, T] int8
    v_s: jnp.ndarray,  # [B, H, T] f32
    mask: jnp.ndarray | None,  # broadcastable to [B, H, s, T]
) -> jnp.ndarray:
    """Attention over dim-major int8 K/V with fused dequantization."""
    scale = q.shape[-1] ** -0.5
    logits = jnp.einsum(
        "bshd,bhdt->bhst", q, k_q.astype(q.dtype), preferred_element_type=jnp.float32
    )
    logits = logits * (k_s * scale)[:, :, None, :]
    if mask is not None:
        logits = jnp.where(mask, logits, NEG_INF)
    weights = _softmax(logits)
    wv = (weights * v_s[:, :, None, :]).astype(q.dtype)
    return jnp.einsum("bhst,bhdt->bshd", wv, v_q.astype(q.dtype), preferred_element_type=q.dtype)


def attention_dm_q8_with_weights(q, k_q, k_s, v_q, v_s, mask):
    """attention_dm_q8 returning the (dequant-scaled) softmax weights
    [B, H, s, T] too — used by DTW word alignment."""
    scale = q.shape[-1] ** -0.5
    logits = jnp.einsum(
        "bshd,bhdt->bhst", q, k_q.astype(q.dtype), preferred_element_type=jnp.float32
    )
    logits = logits * (k_s * scale)[:, :, None, :]
    if mask is not None:
        logits = jnp.where(mask, logits, NEG_INF)
    weights = _softmax(logits)
    wv = (weights * v_s[:, :, None, :]).astype(q.dtype)
    out = jnp.einsum("bhst,bhdt->bshd", wv, v_q.astype(q.dtype), preferred_element_type=q.dtype)
    return out, weights


def _softmax(logits: jnp.ndarray) -> jnp.ndarray:
    return jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
