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


# ---------------------------------------------------------------------------
# Streaming-family checkpoints
# ---------------------------------------------------------------------------
#
# A streaming checkpoint directory mirrors the reference's distribution
# layout (reference: README.md:935 — "Model components: ['adapter.ort',
# 'cross_kv.ort', 'decoder_kv.ort', 'encoder.ort', 'frontend.ort',
# 'streaming_config.json', 'tokenizer.bin']"), with float weights as either
# one `model.safetensors` / `model.onnx`, or the five per-session .onnx
# files whose graph initializers carry the canonical names below.
#
# Canonical flat naming (torch layouts: Linear [out,in], Conv1d [out,in,k]),
# modeled on the HF Moonshine conventions import_hf_moonshine consumes:
#
#   frontend.proj.{weight,bias}            [d_model,159] — 79-carry + 80 new
#   frontend.conv1.{weight,bias}           [c1,d_model,5] causal conv
#   frontend.conv2.{weight,bias}           [c2,c1,5]
#   frontend.norm.{weight,bias}            layer norm
#   encoder.in_proj.{weight,bias}
#   encoder.layers.N.input_layernorm.weight
#   encoder.layers.N.self_attn.{q,k,v,o}_proj.weight
#   encoder.layers.N.post_attention_layernorm.weight
#   encoder.layers.N.mlp.{fc1,fc2}.{weight,bias}
#   encoder.layer_norm.weight
#   adapter.proj.{weight,bias}; adapter.norm.{weight,bias}
#   decoder.embed_tokens.weight            [vocab,decoder_dim]
#   decoder.layers.N.input_layernorm.weight
#   decoder.layers.N.self_attn.{q,k,v,o}_proj.weight
#   decoder.layers.N.post_attention_layernorm.weight
#   decoder.layers.N.encoder_attn.{q,k,v,o}_proj.weight
#   decoder.layers.N.final_layernorm.weight
#   decoder.layers.N.mlp.{fc1,fc2}.{weight,bias}   (fc1 is the SwiGLU double
#                                                   projection [2*hidden,d])
#   decoder.norm.weight
#
# The session split of the reference is a serving artifact (ONNX cannot hold
# state); weight-wise the five sessions partition exactly these tensors
# (frontend.* -> frontend.ort; encoder.* -> encoder.ort; adapter.* ->
# adapter.ort; decoder.*.encoder_attn.{k,v} -> cross_kv.ort; the rest of
# decoder.* -> decoder_kv.ort; reference: moonshine-streaming-model.cpp
# 433-935), so merging the initializers of all five files recovers the flat
# dict.


def _norm_sd(prefix: str, p: Mapping[str, np.ndarray], out: dict) -> None:
    out[f"{prefix}.weight"] = np.asarray(p["scale"])
    if "bias" in p:
        out[f"{prefix}.bias"] = np.asarray(p["bias"])


def _dense_sd(prefix: str, p: Mapping[str, np.ndarray], out: dict) -> None:
    out[f"{prefix}.weight"] = _t(np.asarray(p["w"]))
    if "b" in p:
        out[f"{prefix}.bias"] = np.asarray(p["b"])


def _unstack(stacked, n):
    import jax

    return [jax.tree.map(lambda x: np.asarray(x[i]), stacked) for i in range(n)]


def export_streaming_state_dict(params: Mapping, cfg) -> dict[str, np.ndarray]:
    """moonshine_tpu streaming params -> canonical flat state dict.

    Inverse of import_streaming; used to publish checkpoints and to
    round-trip-test the importer without network access.
    """
    out: dict[str, np.ndarray] = {}
    fr = params["frontend"]
    _dense_sd("frontend.proj", fr["proj"], out)
    for name in ("conv1", "conv2"):
        out[f"frontend.{name}.weight"] = np.ascontiguousarray(
            np.transpose(np.asarray(fr[name]["w"]), (2, 1, 0))
        )
        out[f"frontend.{name}.bias"] = np.asarray(fr[name]["b"])
    _norm_sd("frontend.norm", fr["norm"], out)

    _dense_sd("encoder.in_proj", params["encoder"]["in_proj"], out)
    enc_layers = _unstack(params["encoder"]["layers"], int(cfg.enc_depth))
    for i, lp in enumerate(enc_layers):
        pre = f"encoder.layers.{i}"
        _norm_sd(f"{pre}.input_layernorm", lp["ln1"], out)
        for ours, theirs in (("q", "q_proj"), ("k", "k_proj"), ("v", "v_proj"), ("o", "o_proj")):
            _dense_sd(f"{pre}.self_attn.{theirs}", lp["attn"][ours], out)
        _norm_sd(f"{pre}.post_attention_layernorm", lp["ln2"], out)
        _dense_sd(f"{pre}.mlp.fc1", lp["mlp"]["fc1"], out)
        _dense_sd(f"{pre}.mlp.fc2", lp["mlp"]["fc2"], out)
    _norm_sd("encoder.layer_norm", params["encoder"]["norm"], out)

    _dense_sd("adapter.proj", params["adapter"]["proj"], out)
    _norm_sd("adapter.norm", params["adapter"]["norm"], out)

    out["decoder.embed_tokens.weight"] = np.asarray(params["decoder"]["embed"])
    dec_layers = _unstack(params["decoder"]["layers"], int(cfg.depth))
    for i, lp in enumerate(dec_layers):
        pre = f"decoder.layers.{i}"
        _norm_sd(f"{pre}.input_layernorm", lp["ln1"], out)
        for ours, theirs in (("q", "q_proj"), ("k", "k_proj"), ("v", "v_proj"), ("o", "o_proj")):
            _dense_sd(f"{pre}.self_attn.{theirs}", lp["self_attn"][ours], out)
        _norm_sd(f"{pre}.post_attention_layernorm", lp["ln2"], out)
        for ours, theirs in (("q", "q_proj"), ("k", "k_proj"), ("v", "v_proj"), ("o", "o_proj")):
            _dense_sd(f"{pre}.encoder_attn.{theirs}", lp["cross_attn"][ours], out)
        _norm_sd(f"{pre}.final_layernorm", lp["ln3"], out)
        _dense_sd(f"{pre}.mlp.fc1", lp["mlp"]["fc1"], out)
        _dense_sd(f"{pre}.mlp.fc2", lp["mlp"]["fc2"], out)
    _norm_sd("decoder.norm", params["decoder"]["norm"], out)
    return out


def _norm_from_sd(sd: Mapping[str, np.ndarray], prefix: str) -> dict:
    p = {"scale": np.asarray(sd[f"{prefix}.weight"])}
    if f"{prefix}.bias" in sd:
        p["bias"] = np.asarray(sd[f"{prefix}.bias"])
    return p


def import_streaming(
    sd: Mapping[str, np.ndarray] | str, cfg, dtype=jnp.float32
) -> dict:
    """Canonical streaming state dict (or .safetensors path) -> param pytree.

    Layer math parity is pinned by the round-trip tests in
    tests/test_streaming_import.py: export -> (safetensors|onnx) -> import
    reproduces decode_full outputs exactly.
    """
    import jax

    if isinstance(sd, str):
        sd = load_safetensors(sd)
    # Tolerate an optional leading "model." (HF *ForConditionalGeneration).
    if any(k.startswith("model.") for k in sd):
        sd = {k[len("model."):] if k.startswith("model.") else k: v for k, v in sd.items()}

    def g(key: str) -> np.ndarray:
        return np.asarray(sd[key])

    def dense_p(prefix: str) -> dict:
        p = {"w": _t(g(f"{prefix}.weight"))}
        if f"{prefix}.bias" in sd:
            p["b"] = g(f"{prefix}.bias")
        return p

    frontend = {
        "proj": dense_p("frontend.proj"),
        "conv1": {"w": _conv(g("frontend.conv1.weight")), "b": g("frontend.conv1.bias")},
        "conv2": {"w": _conv(g("frontend.conv2.weight")), "b": g("frontend.conv2.bias")},
        "norm": _norm_from_sd(sd, "frontend.norm"),
    }
    enc_layers = []
    for i in range(cfg.enc_depth):
        pre = f"encoder.layers.{i}"
        enc_layers.append(
            {
                "ln1": _norm_from_sd(sd, f"{pre}.input_layernorm"),
                "attn": _attn_from_sd(sd, f"{pre}.self_attn"),
                "ln2": _norm_from_sd(sd, f"{pre}.post_attention_layernorm"),
                "mlp": _mlp_from_sd(sd, f"{pre}.mlp"),
            }
        )
    dec_layers = []
    for i in range(cfg.depth):
        pre = f"decoder.layers.{i}"
        dec_layers.append(
            {
                "ln1": _norm_from_sd(sd, f"{pre}.input_layernorm"),
                "self_attn": _attn_from_sd(sd, f"{pre}.self_attn"),
                "ln2": _norm_from_sd(sd, f"{pre}.post_attention_layernorm"),
                "cross_attn": _attn_from_sd(sd, f"{pre}.encoder_attn"),
                "ln3": _norm_from_sd(sd, f"{pre}.final_layernorm"),
                "mlp": _mlp_from_sd(sd, f"{pre}.mlp"),
            }
        )

    def stack(layers):
        return jax.tree.map(lambda *xs: jnp.stack([jnp.asarray(x, dtype) for x in xs]), *layers)

    to = lambda tree: jax.tree.map(lambda x: jnp.asarray(x, dtype), tree)
    return {
        "frontend": to(frontend),
        "encoder": {
            "in_proj": to(dense_p("encoder.in_proj")),
            "layers": stack(enc_layers),
            "norm": to(_norm_from_sd(sd, "encoder.layer_norm")),
        },
        "adapter": {
            "proj": to(dense_p("adapter.proj")),
            "norm": to(_norm_from_sd(sd, "adapter.norm")),
        },
        "decoder": {
            "embed": jnp.asarray(g("decoder.embed_tokens.weight"), dtype),
            "layers": stack(dec_layers),
            "norm": to(_norm_from_sd(sd, "decoder.norm")),
        },
    }


# Session membership for the five-file distribution form (reference:
# moonshine-streaming-model.cpp:433-935 — which weights each session holds).
STREAMING_SESSIONS = ("frontend", "encoder", "adapter", "cross_kv", "decoder_kv")


def _session_of(key: str) -> str:
    if key.startswith("frontend."):
        return "frontend"
    if key.startswith("encoder."):
        return "encoder"
    if key.startswith("adapter."):
        return "adapter"
    if ".encoder_attn.k_proj" in key or ".encoder_attn.v_proj" in key:
        return "cross_kv"
    return "decoder_kv"


def split_streaming_sessions(sd: Mapping[str, np.ndarray]) -> dict[str, dict[str, np.ndarray]]:
    """Partition a flat state dict into the reference's five-session layout."""
    out: dict[str, dict[str, np.ndarray]] = {s: {} for s in STREAMING_SESSIONS}
    for k, v in sd.items():
        out[_session_of(k)][k] = np.asarray(v)
    return out


def load_streaming_checkpoint(path: str, dtype=jnp.float32):
    """Load a streaming checkpoint directory -> (params, StreamingConfig).

    Accepts, in priority order inside `path`:
      1. model.safetensors          — canonical flat state dict
      2. model.onnx                 — same names as graph initializers
      3. {frontend,encoder,adapter,cross_kv,decoder_kv}.onnx — the
         reference's five-session split; initializers are merged.
    streaming_config.json (reference field set, moonshine-streaming-model.h
    :17-33) defines the architecture.
    """
    import os

    from .core.config import StreamingConfig

    cfg_path = os.path.join(path, "streaming_config.json")
    if os.path.exists(cfg_path):
        with open(cfg_path) as f:
            cfg = StreamingConfig.from_json(f.read())
    else:
        cfg = StreamingConfig()

    st = os.path.join(path, "model.safetensors")
    if os.path.exists(st):
        return import_streaming(st, cfg, dtype), cfg

    from .core.onnx_io import load_onnx

    single = os.path.join(path, "model.onnx")
    if os.path.exists(single):
        return import_streaming(load_onnx(single).initializers, cfg, dtype), cfg

    merged: dict[str, np.ndarray] = {}
    found = False
    for session in STREAMING_SESSIONS:
        p = os.path.join(path, f"{session}.onnx")
        if os.path.exists(p):
            merged.update(load_onnx(p).initializers)
            found = True
    if not found:
        raise FileNotFoundError(
            f"{path}: no model.safetensors, model.onnx or per-session .onnx "
            "files found (note: .ort flatbuffer files are a quantized "
            "serving artifact; convert from the float sources)"
        )
    return import_streaming(merged, cfg, dtype), cfg


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
