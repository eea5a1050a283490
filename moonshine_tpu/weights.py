"""Checkpoint import: HF Moonshine ``safetensors``/state-dict -> param pytrees.

The reference ships quantized ``.ort`` snapshots of the published float
checkpoints (reference: README.md model distribution, scripts/
convert-models-to-ort.py).  Our WER-parity path instead imports the float
HF checkpoints directly (reference: README.md points at the HF repos), so
this module is the single place where torch tensor layouts are transposed
into the JAX conventions of moonshine_tpu.models.layers:

    torch Linear.weight [out, in]   -> dense w [in, out]
    torch Conv1d.weight [out,in,k]  -> conv w  [k, in, out]

Accepts either a mapping of numpy arrays (e.g. ``{k: v.numpy() for ...}``
from a torch state dict) or a ``.safetensors`` path.
"""

from __future__ import annotations

import re
from typing import Mapping

import jax.numpy as jnp
import numpy as np

from .core.config import MoonshineArchConfig


def _t(x: np.ndarray) -> np.ndarray:
    return np.ascontiguousarray(x.T)


def _conv(x: np.ndarray) -> np.ndarray:
    # [out, in, k] -> [k, in, out]
    return np.ascontiguousarray(np.transpose(x, (2, 1, 0)))


def load_safetensors(path: str) -> dict[str, np.ndarray]:
    from safetensors.numpy import load_file

    return load_file(path)


def _attn_from_sd(sd: Mapping[str, np.ndarray], prefix: str) -> dict:
    out = {}
    for ours, theirs in (("q", "q_proj"), ("k", "k_proj"), ("v", "v_proj"), ("o", "o_proj")):
        p = {"w": _t(sd[f"{prefix}.{theirs}.weight"])}
        if f"{prefix}.{theirs}.bias" in sd:
            p["b"] = sd[f"{prefix}.{theirs}.bias"]
        out[ours] = p
    return out


def _mlp_from_sd(sd: Mapping[str, np.ndarray], prefix: str) -> dict:
    out = {}
    for name in ("fc1", "fc2"):
        p = {"w": _t(sd[f"{prefix}.{name}.weight"])}
        if f"{prefix}.{name}.bias" in sd:
            p["b"] = sd[f"{prefix}.{name}.bias"]
        out[name] = p
    return out


def import_hf_gemma3_text(sd: Mapping[str, np.ndarray] | str, cfg, dtype=jnp.float32) -> dict:
    """HF ``Gemma3TextModel`` state dict -> moonshine_tpu.models.gemma params.

    The projection head (sentence-transformers dense stack) is not part of
    the HF text model; absent keys leave identity-like random projections
    untouched by the caller.
    """
    import jax

    if isinstance(sd, str):
        sd = load_safetensors(sd)
    if any(k.startswith("model.") for k in sd):
        sd = {k[len("model."):]: v for k, v in sd.items() if k.startswith("model.")}

    def g(k):
        return np.asarray(sd[k])

    layers = []
    for i in range(cfg.num_layers):
        pre = f"layers.{i}"
        layers.append(
            {
                "input_norm": g(f"{pre}.input_layernorm.weight"),
                "q": {"w": _t(g(f"{pre}.self_attn.q_proj.weight"))},
                "k": {"w": _t(g(f"{pre}.self_attn.k_proj.weight"))},
                "v": {"w": _t(g(f"{pre}.self_attn.v_proj.weight"))},
                "o": {"w": _t(g(f"{pre}.self_attn.o_proj.weight"))},
                "q_norm": g(f"{pre}.self_attn.q_norm.weight"),
                "k_norm": g(f"{pre}.self_attn.k_norm.weight"),
                "post_attn_norm": g(f"{pre}.post_attention_layernorm.weight"),
                "pre_ffw_norm": g(f"{pre}.pre_feedforward_layernorm.weight"),
                "gate": {"w": _t(g(f"{pre}.mlp.gate_proj.weight"))},
                "up": {"w": _t(g(f"{pre}.mlp.up_proj.weight"))},
                "down": {"w": _t(g(f"{pre}.mlp.down_proj.weight"))},
                "post_ffw_norm": g(f"{pre}.post_feedforward_layernorm.weight"),
            }
        )
    params = {
        "embed": jnp.asarray(g("embed_tokens.weight"), dtype),
        "layers": jax.tree.map(
            lambda *xs: jnp.stack([jnp.asarray(x, dtype) for x in xs]), *layers
        ),
        "final_norm": jnp.asarray(g("norm.weight"), dtype),
    }
    # Optional sentence-transformers dense head.
    for ours, theirs in (("proj1", "dense1.weight"), ("proj2", "dense2.weight")):
        if theirs in sd:
            params[ours] = {"w": jnp.asarray(_t(g(theirs)), dtype)}
    return params


def import_hf_moonshine(
    sd: Mapping[str, np.ndarray] | str,
    cfg: MoonshineArchConfig,
    dtype=jnp.float32,
) -> dict:
    """Convert an HF Moonshine checkpoint into our param pytree."""
    if isinstance(sd, str):
        sd = load_safetensors(sd)
    # Strip an optional leading "model." so both *ForConditionalGeneration
    # and bare MoonshineModel state dicts import.
    if not any(k.startswith("model.") for k in sd) and any(k.startswith("encoder.") for k in sd):
        sd = {f"model.{k}": v for k, v in sd.items()}

    def g(key: str) -> np.ndarray:
        return np.asarray(sd[key])

    frontend = {
        "conv1": {"w": _conv(g("model.encoder.conv1.weight"))},
        "gn": {
            "scale": g("model.encoder.groupnorm.weight"),
            "bias": g("model.encoder.groupnorm.bias"),
        },
        "conv2": {"w": _conv(g("model.encoder.conv2.weight")), "b": g("model.encoder.conv2.bias")},
        "conv3": {"w": _conv(g("model.encoder.conv3.weight")), "b": g("model.encoder.conv3.bias")},
    }

    enc_layers = []
    for i in range(cfg.encoder_layers):
        pre = f"model.encoder.layers.{i}"
        enc_layers.append(
            {
                "ln1": {"scale": g(f"{pre}.input_layernorm.weight")},
                "attn": _attn_from_sd(sd, f"{pre}.self_attn"),
                "ln2": {"scale": g(f"{pre}.post_attention_layernorm.weight")},
                "mlp": _mlp_from_sd(sd, f"{pre}.mlp"),
            }
        )
    dec_layers = []
    for i in range(cfg.decoder_layers):
        pre = f"model.decoder.layers.{i}"
        dec_layers.append(
            {
                "ln1": {"scale": g(f"{pre}.input_layernorm.weight")},
                "self_attn": _attn_from_sd(sd, f"{pre}.self_attn"),
                "ln2": {"scale": g(f"{pre}.post_attention_layernorm.weight")},
                "cross_attn": _attn_from_sd(sd, f"{pre}.encoder_attn"),
                "ln3": {"scale": g(f"{pre}.final_layernorm.weight")},
                "mlp": _mlp_from_sd(sd, f"{pre}.mlp"),
            }
        )

    import jax

    def stack(layers):
        return jax.tree.map(lambda *xs: jnp.stack([jnp.asarray(x, dtype) for x in xs]), *layers)

    params = {
        "frontend": jax.tree.map(lambda x: jnp.asarray(x, dtype), frontend),
        "encoder": {
            "layers": stack(enc_layers),
            "norm": {"scale": jnp.asarray(g("model.encoder.layer_norm.weight"), dtype)},
        },
        "decoder": {
            "embed": jnp.asarray(g("model.decoder.embed_tokens.weight"), dtype),
            "layers": stack(dec_layers),
            "norm": {"scale": jnp.asarray(g("model.decoder.norm.weight"), dtype)},
        },
    }
    return params
