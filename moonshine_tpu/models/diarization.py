"""Diarization neural models: segmentation + speaker embedding.

Capability mirror of the reference's cpp-annote model pair (reference:
core/cpp-annote/src/: segmentation ONNX + embedding ONNX, a port of the
pyannote community-1 pipeline), re-designed for TPU batching:

- ``SegmentationModel``: a 10 s analysis window -> per-frame *powerset*
  speaker-activity logits over up to 3 local speakers (classes: empty,
  {1}, {2}, {3}, {1,2}, {1,3}, {2,3}).  Conv downsampling over log-mel +
  a small bidirectional transformer; all windows of an update run as one
  batch.
- ``EmbeddingModel``: ECAPA-style speaker embedding — log-mel, dilated
  conv blocks, attentive statistics pooling, 192-d L2-normalized vector.
  Accepts a frame-level weight mask so one window yields one embedding
  per active local speaker (masked pooling), batched.

Weights are trainable/importable; clustering logic lives in
pipeline/diarization.py and is model-agnostic.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.mel import log_mel
from .layers import ACTIVATIONS, Params, dense, dense_init, layer_norm, norm_init

SAMPLE_RATE = 16000
WINDOW_SECONDS = 10.0
WINDOW_SAMPLES = int(WINDOW_SECONDS * SAMPLE_RATE)
N_MELS = 80
MEL_HOP = 160  # 100 fps
DOWNSAMPLE = 4  # -> 25 output frames/s
FRAMES_PER_SECOND = SAMPLE_RATE // MEL_HOP // DOWNSAMPLE
MAX_LOCAL_SPEAKERS = 3
# Powerset classes: subsets of {0,1,2} with |s| <= 2 (community-1 style).
POWERSET: tuple[tuple[int, ...], ...] = ((), (0,), (1,), (2,), (0, 1), (0, 2), (1, 2))
EMBED_DIM = 192


def powerset_to_multilabel() -> np.ndarray:
    """[n_classes, n_speakers] 0/1 mapping."""
    m = np.zeros((len(POWERSET), MAX_LOCAL_SPEAKERS), np.float32)
    for i, subset in enumerate(POWERSET):
        for s in subset:
            m[i, s] = 1.0
    return m


# -- segmentation ----------------------------------------------------------

def init_segmentation_params(rng: jax.Array, dim: int = 128, depth: int = 2) -> Params:
    r = jax.random.split(rng, 8)

    def conv_init(key, k, cin, cout):
        scale = (1.0 / (cin * k)) ** 0.5
        return {
            "w": jax.random.uniform(key, (k, cin, cout), jnp.float32, -scale, scale),
            "b": jnp.zeros((cout,), jnp.float32),
        }

    def block(key):
        kk = jax.random.split(key, 3)
        return {
            "ln1": norm_init(dim),
            "attn": {
                "q": dense_init(kk[0], dim, dim, bias=False),
                "k": dense_init(kk[0], dim, dim, bias=False),
                "v": dense_init(kk[0], dim, dim, bias=False),
                "o": dense_init(kk[0], dim, dim, bias=False),
            },
            "ln2": norm_init(dim),
            "mlp": {"fc1": dense_init(kk[1], dim, dim * 4), "fc2": dense_init(kk[2], dim * 4, dim)},
        }

    layers = [block(k) for k in jax.random.split(r[3], depth)]
    return {
        "conv1": conv_init(r[0], 5, N_MELS, dim),
        "conv2": conv_init(r[1], 5, dim, dim),
        "norm": norm_init(dim),
        "layers": jax.tree.map(lambda *xs: jnp.stack(xs), *layers),
        "head": dense_init(r[2], dim, len(POWERSET)),
    }


@jax.jit
def segmentation_forward(params: Params, audio: jnp.ndarray) -> jnp.ndarray:
    """[B, window_samples] -> [B, T, n_classes] powerset logits (T=25fps)."""
    mel = log_mel(audio, n_fft=400, hop=MEL_HOP, n_mels=N_MELS, center=True)
    h = mel

    def conv(p, x, stride):
        return jax.lax.conv_general_dilated(
            x, p["w"], window_strides=(stride,), padding="SAME",
            dimension_numbers=("NWC", "WIO", "NWC"),
        ) + p["b"]

    h = jax.nn.relu(conv(params["conv1"], h, 2))
    h = jax.nn.relu(conv(params["conv2"], h, 2))
    heads = 4

    def body(carry, lp):
        x = layer_norm(lp["ln1"], carry)
        b, t, d = x.shape
        q = dense(lp["attn"]["q"], x).reshape(b, t, heads, -1)
        k = dense(lp["attn"]["k"], x).reshape(b, t, heads, -1)
        v = dense(lp["attn"]["v"], x).reshape(b, t, heads, -1)
        logits = jnp.einsum("bshd,bthd->bhst", q, k, preferred_element_type=jnp.float32)
        logits = logits / jnp.sqrt(float(q.shape[-1]))
        w = jax.nn.softmax(logits, axis=-1).astype(x.dtype)
        o = jnp.einsum("bhst,bthd->bshd", w, v, preferred_element_type=x.dtype)
        h2 = carry + dense(lp["attn"]["o"], o.reshape(b, t, d))
        x2 = layer_norm(lp["ln2"], h2)
        return h2 + dense(lp["mlp"]["fc2"], ACTIVATIONS["gelu"](dense(lp["mlp"]["fc1"], x2))), None

    h, _ = jax.lax.scan(body, h, params["layers"])
    h = layer_norm(params["norm"], h)
    return dense(params["head"], h)


def segmentation_activations(params: Params, audio: jnp.ndarray) -> jnp.ndarray:
    """[B, N] -> [B, T, n_speakers] per-speaker activity probabilities
    (powerset softmax folded through the multilabel map)."""
    logits = segmentation_forward(params, audio)
    probs = jax.nn.softmax(logits, axis=-1)
    mapping = jnp.asarray(powerset_to_multilabel())
    return jnp.einsum("btc,cs->bts", probs, mapping)


# -- speaker embedding -----------------------------------------------------

def init_embedding_params(rng: jax.Array, dim: int = 256) -> Params:
    r = jax.random.split(rng, 8)

    def conv_init(key, k, cin, cout):
        scale = (1.0 / (cin * k)) ** 0.5
        return {
            "w": jax.random.uniform(key, (k, cin, cout), jnp.float32, -scale, scale),
            "b": jnp.zeros((cout,), jnp.float32),
        }

    return {
        "conv1": conv_init(r[0], 5, N_MELS, dim),
        "conv2": conv_init(r[1], 3, dim, dim),  # dilation 2
        "conv3": conv_init(r[2], 3, dim, dim),  # dilation 3
        "attn_pool": dense_init(r[3], dim, 1),
        "proj": dense_init(r[4], dim * 2, EMBED_DIM),
    }


@jax.jit
def embedding_forward(
    params: Params,
    audio: jnp.ndarray,  # [B, N]
    frame_weights: jnp.ndarray | None = None,  # [B, T_mel] soft mask
) -> jnp.ndarray:
    """[B, N] (+ optional per-frame weights) -> [B, 192] L2-normalized."""
    mel = log_mel(audio, n_fft=400, hop=MEL_HOP, n_mels=N_MELS, center=True)

    def conv(p, x, dilation):
        return jax.lax.conv_general_dilated(
            x, p["w"], window_strides=(1,), padding="SAME",
            rhs_dilation=(dilation,),
            dimension_numbers=("NWC", "WIO", "NWC"),
        ) + p["b"]

    h = jax.nn.relu(conv(params["conv1"], mel, 1))
    h = jax.nn.relu(conv(params["conv2"], h, 2)) + h
    h = jax.nn.relu(conv(params["conv3"], h, 3)) + h

    # Attentive statistics pooling with optional external frame weights.
    scores = dense(params["attn_pool"], h)[..., 0]  # [B, T]
    if frame_weights is not None:
        w = frame_weights[:, : scores.shape[1]]
        scores = jnp.where(w > 0, scores, -1e9)
        att = jax.nn.softmax(scores, axis=-1) * w
        att = att / jnp.maximum(att.sum(-1, keepdims=True), 1e-9)
    else:
        att = jax.nn.softmax(scores, axis=-1)
    mean = jnp.einsum("bt,btd->bd", att, h)
    var = jnp.einsum("bt,btd->bd", att, jnp.square(h)) - jnp.square(mean)
    std = jnp.sqrt(jnp.maximum(var, 1e-9))
    pooled = jnp.concatenate([mean, std], axis=-1)
    e = dense(params["proj"], pooled)
    return e / jnp.maximum(jnp.linalg.norm(e, axis=-1, keepdims=True), 1e-12)
