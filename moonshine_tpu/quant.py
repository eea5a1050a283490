"""Per-channel int8 weight quantization.

Mirror of the reference's load-bearing post-training quantization
(reference: scripts/quantize-streaming-model.sh:1-10 — per-channel int8,
frontend weights-only kept at float; README.md quantization section: the
weight-norm frontend's per-channel magnitudes span ~17x, so per-tensor
scales cost Tiny Streaming 7.57% vs 4.83% WER while per-channel is
accuracy-neutral).

TPU-first storage/execution model:
- ``quantize_tree``  — walk a param pytree; each dense/conv weight becomes
  {w_q: int8, w_scale: f32[out]} with symmetric per-output-channel scales.
  ~4x smaller checkpoints and HBM footprint.
- ``dequantize_tree`` — rebuild float params (any dtype) for execution;
  XLA folds the (q * scale) expansion into the consuming matmul where
  profitable.
- ``fake_quantize_tree`` — quantize+dequantize in place: the WER-delta
  harness runs the EXACT arithmetic of the deployed int8 weights through
  the float pipeline (same protocol as the reference's int8 .ort evals).

Norm scales/biases and biases stay float (tiny, accuracy-critical); the
frontend subtree is excluded by default, matching the reference.
"""

from __future__ import annotations

from typing import Any, Mapping

import jax
import jax.numpy as jnp
import numpy as np

Params = Any

# Keys whose arrays are quantized (2-D+ weights); everything else is kept.
_WEIGHT_KEY = "w"
_EMBED_KEY = "embed"


def _quantize_array(w: np.ndarray, axis: int = -1) -> tuple[np.ndarray, np.ndarray]:
    """Symmetric per-channel int8 quantization along ``axis`` (out-channel)."""
    w = np.asarray(w, np.float32)
    move = np.moveaxis(w, axis, -1)
    amax = np.max(np.abs(move), axis=tuple(range(move.ndim - 1)))
    scale = np.where(amax > 0, amax / 127.0, 1.0).astype(np.float32)
    q = np.clip(np.round(move / scale), -127, 127).astype(np.int8)
    return np.moveaxis(q, -1, axis), scale


def _dequantize_array(q: np.ndarray, scale: np.ndarray, axis: int = -1) -> np.ndarray:
    move = np.moveaxis(np.asarray(q, np.float32), axis, -1)
    return np.moveaxis(move * scale, -1, axis)


def quantize_tree(
    params: Params, skip_subtrees: tuple[str, ...] = ("frontend",)
) -> Params:
    """Param pytree -> same structure with int8 weights.

    Dense/conv ``{"w": [..., out]}`` leaves become
    ``{"w_q": int8, "w_scale": [out]}``; the decoder ``embed`` table
    ([vocab, d], rows are channels) becomes ``embed_q``/``embed_scale``.
    Subtrees named in ``skip_subtrees`` are kept float (default: the
    frontend, per the reference's policy).
    """

    def walk(node, path):
        if isinstance(node, Mapping):
            out = {}
            for k, v in node.items():
                if k in skip_subtrees and not path:
                    out[k] = v
                elif k == _WEIGHT_KEY and hasattr(v, "ndim") and v.ndim >= 2:
                    q, s = _quantize_array(np.asarray(v), axis=-1)
                    out["w_q"] = jnp.asarray(q)
                    out["w_scale"] = jnp.asarray(s)
                elif k == _EMBED_KEY and hasattr(v, "ndim") and v.ndim == 2:
                    q, s = _quantize_array(np.asarray(v), axis=0)  # per-row
                    out["embed_q"] = jnp.asarray(q)
                    out["embed_scale"] = jnp.asarray(s)
                else:
                    out[k] = walk(v, path + [k])
            return out
        if isinstance(node, (list, tuple)):
            return type(node)(walk(v, path + [i]) for i, v in enumerate(node))
        return node

    return walk(params, [])


def dequantize_tree(params_q: Params, dtype=jnp.float32) -> Params:
    """Inverse of quantize_tree: rebuild executable float params."""

    def walk(node):
        if isinstance(node, Mapping):
            out = {}
            keys = set(node.keys())
            for k, v in node.items():
                if k in ("w_scale", "embed_scale"):
                    continue
                if k == "w_q":
                    out[_WEIGHT_KEY] = jnp.asarray(
                        _dequantize_array(np.asarray(v), np.asarray(node["w_scale"]), -1),
                        dtype,
                    )
                elif k == "embed_q":
                    out[_EMBED_KEY] = jnp.asarray(
                        _dequantize_array(np.asarray(v), np.asarray(node["embed_scale"]), 0),
                        dtype,
                    )
                else:
                    out[k] = walk(v)
            return out
        if isinstance(node, (list, tuple)):
            return type(node)(walk(v) for v in node)
        return node

    return walk(params_q)


def fake_quantize_tree(
    params: Params,
    skip_subtrees: tuple[str, ...] = ("frontend",),
    per_channel: bool = True,
    dtype=jnp.float32,
) -> Params:
    """Quantize+dequantize: float params carrying exact int8 arithmetic.

    ``per_channel=False`` uses one scale per tensor — the configuration
    the reference measured at 7.57% WER (vs 4.83% per-channel) to justify
    per-channel scales; the harness exposes both for the same A/B.
    """

    def fq(w, axis):
        w_np = np.asarray(w)
        if per_channel:
            q, s = _quantize_array(w_np, axis)
            return jnp.asarray(_dequantize_array(q, s, axis), dtype)
        amax = float(np.max(np.abs(w_np)))
        scale = amax / 127.0 if amax > 0 else 1.0
        q = np.clip(np.round(w_np / scale), -127, 127)
        return jnp.asarray(q * scale, dtype)

    def walk(node, path):
        if isinstance(node, Mapping):
            out = {}
            for k, v in node.items():
                if k in skip_subtrees and not path:
                    out[k] = v
                elif k == _WEIGHT_KEY and hasattr(v, "ndim") and v.ndim >= 2:
                    out[k] = fq(v, -1)
                elif k == _EMBED_KEY and hasattr(v, "ndim") and v.ndim == 2:
                    out[k] = fq(v, 0)
                else:
                    out[k] = walk(v, path + [k])
            return out
        if isinstance(node, (list, tuple)):
            return type(node)(walk(v, path + [i]) for i, v in enumerate(node))
        return node

    return walk(params, [])


def quantize_tree_exec(params: Params, skip_subtrees: tuple[str, ...] = ("frontend",)) -> Params:
    """Param pytree -> int8 weights for EXECUTION on the MXU's int8 path.

    Unlike :func:`quantize_tree` (storage: scales reduce over every
    non-output axis, collapsing stacked layers), exec scales reduce ONLY
    over the contraction (``in``) axis: a stacked dense ``w [L, in, out]``
    becomes ``w_q int8 [L, in, out]`` + ``w_scale f32 [L, out]`` so a
    ``lax.scan`` over layers carries per-layer per-channel scales.
    ``layers.dense`` detects ``w_q`` and runs the w8a8 dynamic path —
    per-row int8 activations x per-channel int8 weights -> int32 -> f32
    rescale — the arithmetic of the reference's ORT dynamic quantization
    (MatMulInteger, scripts/quantize-streaming-model.sh) on hardware where
    int8 matmul peaks at 2x bf16.

    ``embed`` stays float (gather + logits projection; accuracy-critical
    and a negligible share of the GEMM time).
    """

    def walk(node, path):
        if isinstance(node, Mapping):
            out = {}
            for k, v in node.items():
                if k in skip_subtrees and not path:
                    out[k] = v
                elif k == _WEIGHT_KEY and hasattr(v, "ndim") and v.ndim >= 2:
                    w = np.asarray(v, np.float32)
                    amax = np.max(np.abs(w), axis=-2)  # reduce the in axis
                    scale = np.where(amax > 0, amax / 127.0, 1.0).astype(np.float32)
                    q = np.clip(
                        np.round(w / scale[..., None, :]), -127, 127
                    ).astype(np.int8)
                    out["w_q"] = jnp.asarray(q)
                    out["w_scale"] = jnp.asarray(scale)
                else:
                    out[k] = walk(v, path + [k])
            return out
        if isinstance(node, (list, tuple)):
            return type(node)(walk(v, path + [i]) for i, v in enumerate(node))
        return node

    return walk(params, [])


def weight_of(p: Mapping, dtype=jnp.float32) -> jnp.ndarray:
    """The float weight of a dense param dict, whether it holds ``w`` or
    exec-quantized ``w_q``/``w_scale`` (for consumers that contract the
    weight in a custom einsum rather than through ``layers.dense``; XLA
    folds the dequant into the consuming GEMM)."""
    if "w" in p:
        return p["w"].astype(dtype)
    return (p["w_q"].astype(dtype) * p["w_scale"][..., None, :].astype(dtype))


def tree_nbytes(params: Params) -> int:
    return sum(np.asarray(x).nbytes for x in jax.tree.leaves(params))
