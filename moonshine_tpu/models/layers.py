"""Functional layer primitives and parameter initializers.

Parameters are plain nested-dict pytrees of ``jnp`` arrays.  Dense kernels
are stored ``[in, out]`` (JAX convention); conv kernels ``[k, in, out]``
(``WIO``).  The HF-checkpoint importer transposes torch layouts into these
(see moonshine_tpu.weights).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp

Params = dict[str, Any]


# -- initializers ----------------------------------------------------------

def dense_init(rng, in_dim: int, out_dim: int, bias: bool = True, scale: float | None = None) -> Params:
    k_rng, _ = jax.random.split(rng)
    if scale is None:
        scale = (1.0 / in_dim) ** 0.5
    p: Params = {"w": jax.random.uniform(k_rng, (in_dim, out_dim), jnp.float32, -scale, scale)}
    if bias:
        p["b"] = jnp.zeros((out_dim,), jnp.float32)
    return p


def conv1d_init(rng, k: int, in_ch: int, out_ch: int, bias: bool = True) -> Params:
    scale = (1.0 / (in_ch * k)) ** 0.5
    p: Params = {"w": jax.random.uniform(rng, (k, in_ch, out_ch), jnp.float32, -scale, scale)}
    if bias:
        p["b"] = jnp.zeros((out_ch,), jnp.float32)
    return p


def norm_init(dim: int, bias: bool = False) -> Params:
    p: Params = {"scale": jnp.ones((dim,), jnp.float32)}
    if bias:
        p["bias"] = jnp.zeros((dim,), jnp.float32)
    return p


# -- apply ----------------------------------------------------------------

def dense(p: Params, x: jnp.ndarray) -> jnp.ndarray:
    if "w_q" in p:
        return _dense_w8a8(p, x)
    y = jnp.dot(x, p["w"].astype(x.dtype), preferred_element_type=x.dtype)
    if "b" in p:
        y = y + p["b"].astype(x.dtype)
    return y


def _dense_w8a8(p: Params, x: jnp.ndarray) -> jnp.ndarray:
    """Dynamic-activation int8 x per-channel int8 weight matmul.

    The deployed arithmetic of the reference's ORT dynamic quantization
    (MatMulInteger: per-row symmetric activation scales at runtime,
    per-output-channel weight scales from quant.quantize_tree_exec), on
    the MXU's int8 path (2x bf16 peak on v5e).  The int32 accumulator is
    exact; the only quantization error is the activation rounding.
    """
    xf = x.astype(jnp.float32)
    amax = jnp.max(jnp.abs(xf), axis=-1, keepdims=True)
    s_x = jnp.maximum(amax, 1e-12) / 127.0
    x_q = jnp.clip(jnp.round(xf / s_x), -127, 127).astype(jnp.int8)
    acc = jax.lax.dot_general(
        x_q, p["w_q"],
        (((x_q.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    y = acc.astype(jnp.float32) * s_x * p["w_scale"]
    if "b" in p:
        y = y + p["b"]
    return y.astype(x.dtype)


def conv1d(p: Params, x: jnp.ndarray, stride: int) -> jnp.ndarray:
    """Valid strided conv.  x: [B, N, C_in] -> [B, T, C_out]."""
    y = jax.lax.conv_general_dilated(
        x,
        p["w"].astype(x.dtype),
        window_strides=(stride,),
        padding="VALID",
        dimension_numbers=("NWC", "WIO", "NWC"),
    )
    if "b" in p:
        y = y + p["b"].astype(x.dtype)
    return y


def layer_norm(p: Params, x: jnp.ndarray, eps: float = 1e-5) -> jnp.ndarray:
    """LayerNorm over the last axis; no bias unless present (HF bias=False)."""
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    y = y * p["scale"]
    if "bias" in p:
        y = y + p["bias"]
    return y.astype(x.dtype)


def group_norm_all(p: Params, x: jnp.ndarray, mask: jnp.ndarray | None, eps: float = 1e-5) -> jnp.ndarray:
    """GroupNorm with a single group over [T, C] per sample.

    x: [B, T, C].  mask: optional [B, T] validity mask — when given, the
    statistics cover only valid frames so batched padded inference matches
    unpadded batch-1 numerics exactly (unlike naive padded GroupNorm).

    One-pass statistics (sum and sum-of-squares in a single fused
    reduction; var = E[x²] − mean²): the [B,T,C] tensor is ~2 GB at
    offline bench shapes and the centered two-pass form cost an extra
    full fp32 read — measured 7.63 → 6.10 ms at [512,2498,416]
    (scripts/spike_groupnorm.py).  Post-tanh values are in [-1,1], so
    the cancellation term mean² ≪ E[x²] and fp32 accumulation keeps the
    difference at bf16-rounding level.
    """
    xf = x.astype(jnp.float32)
    if mask is None:
        denom = jnp.asarray(x.shape[1] * x.shape[2], jnp.float32)
        s1 = jnp.sum(xf, axis=(1, 2), keepdims=True)
        s2 = jnp.sum(jnp.square(xf), axis=(1, 2), keepdims=True)
    else:
        m = mask.astype(jnp.float32)[:, :, None]
        denom = jnp.maximum(jnp.sum(m, axis=(1, 2), keepdims=True) * x.shape[-1], 1.0)
        xm = xf * m
        s1 = jnp.sum(xm, axis=(1, 2), keepdims=True)
        s2 = jnp.sum(xm * xf, axis=(1, 2), keepdims=True)
    mean = s1 / denom
    var = jnp.maximum(s2 / denom - jnp.square(mean), 0.0)
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    y = y * p["scale"] + p["bias"]
    return y.astype(x.dtype)


def gelu(x: jnp.ndarray) -> jnp.ndarray:
    # torch nn.functional.gelu default is the exact erf formulation.
    # Sub-fp32 inputs compute in fp32: bf16 erf is BOTH ~3x slower on
    # TPU (the bf16 erf lowering dominated the whole MLP at bench
    # shapes — 14.1 vs 9.9 ms, scripts/spike notes in docs/PERF.md) and
    # less accurate than erf-in-fp32-then-round, which is also what
    # torch's bf16 gelu computes.
    if x.dtype in (jnp.bfloat16, jnp.float16):
        return jax.nn.gelu(
            x.astype(jnp.float32), approximate=False).astype(x.dtype)
    return jax.nn.gelu(x, approximate=False)


def silu(x: jnp.ndarray) -> jnp.ndarray:
    return jax.nn.silu(x)


ACTIVATIONS = {"gelu": gelu, "silu": silu, "tanh": jnp.tanh, "relu": jax.nn.relu}
