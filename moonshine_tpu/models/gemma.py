"""Gemma3-style text encoder for semantic embeddings.

Capability mirror of the reference's ``GemmaEmbeddingModel``
(reference: core/gemma-embedding-model.{h,cpp}: embeddinggemma-300m ONNX,
768-dim vectors, vocab 262144, mean pooling, task prefixes, MRL
truncation), built as a native JAX Gemma3 text stack so the published
safetensors import directly:

- RMSNorm (zero-centered gain, (1+w) convention), QK-norm per head
- GQA attention with per-layer sliding/full attention types and separate
  local/global RoPE bases
- GeGLU MLP (tanh-approx GELU), embedding scaled by sqrt(hidden)
- bidirectional attention for embedding use (``causal=False``), causal for
  parity testing against ``Gemma3TextModel``

The embedder wrapper applies the reference's exact prefixes, mean-pools
over valid tokens, L2-normalizes, and supports Matryoshka truncation
(reference: gemma-embedding-model.cpp:344-370).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from functools import partial
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from .layers import Params, dense, dense_init

QUERY_PREFIX = "task: search result | query: "  # reference: h:142
DOCUMENT_PREFIX = "title: none | text: "  # reference: h:143


@dataclass(frozen=True)
class GemmaTextConfig:
    vocab_size: int = 262144
    hidden_size: int = 768
    intermediate_size: int = 1152
    num_layers: int = 24
    num_heads: int = 3
    num_kv_heads: int = 1
    head_dim: int = 256
    rope_theta: float = 1_000_000.0
    rope_local_base_freq: float = 10_000.0
    sliding_window: int = 512
    # every Nth layer is full attention, the rest sliding
    global_layer_interval: int = 6
    query_pre_attn_scalar: float = 256.0
    rms_norm_eps: float = 1e-6
    bos_token_id: int = 2
    eos_token_id: int = 1
    pad_token_id: int = 0
    max_seq_length: int = 2048
    # Embedding head (sentence-transformers dense stack): 768 -> 3072 -> 768
    embedding_dim: int = 768
    projection_hidden: int = 3072

    def layer_is_global(self, i: int) -> bool:
        return (i + 1) % self.global_layer_interval == 0


def _rms_norm(w: jnp.ndarray, x: jnp.ndarray, eps: float) -> jnp.ndarray:
    xf = x.astype(jnp.float32)
    var = jnp.mean(jnp.square(xf), axis=-1, keepdims=True)
    y = xf * jax.lax.rsqrt(var + eps)
    return (y * (1.0 + w.astype(jnp.float32))).astype(x.dtype)


def _rope(x: jnp.ndarray, positions: jnp.ndarray, theta: float) -> jnp.ndarray:
    """Half-split (NeoX non-interleaved) rotary over the full head_dim.
    x: [B, S, H, hd]."""
    hd = x.shape[-1]
    half = hd // 2
    freqs = 1.0 / (theta ** (jnp.arange(half, dtype=jnp.float32) * 2.0 / hd))
    angles = positions.astype(jnp.float32)[..., None] * freqs  # [S, half] or [B,S,half]
    cos = jnp.cos(angles)[..., None, :].astype(x.dtype)  # broadcast over heads
    sin = jnp.sin(angles)[..., None, :].astype(x.dtype)
    if cos.ndim == 3:  # [S, 1, half] -> broadcastable with [B, S, H, half]
        cos = cos[None]
        sin = sin[None]
    x1, x2 = jnp.split(x, 2, axis=-1)
    return jnp.concatenate([x1 * cos - x2 * sin, x2 * cos + x1 * sin], axis=-1)


def _layer_init(rng, cfg: GemmaTextConfig) -> Params:
    r = jax.random.split(rng, 8)
    d, hd = cfg.hidden_size, cfg.head_dim
    return {
        "input_norm": jnp.zeros((d,), jnp.float32),
        "q": dense_init(r[0], d, cfg.num_heads * hd, bias=False),
        "k": dense_init(r[1], d, cfg.num_kv_heads * hd, bias=False),
        "v": dense_init(r[2], d, cfg.num_kv_heads * hd, bias=False),
        "o": dense_init(r[3], cfg.num_heads * hd, d, bias=False),
        "q_norm": jnp.zeros((hd,), jnp.float32),
        "k_norm": jnp.zeros((hd,), jnp.float32),
        "post_attn_norm": jnp.zeros((d,), jnp.float32),
        "pre_ffw_norm": jnp.zeros((d,), jnp.float32),
        "gate": dense_init(r[4], d, cfg.intermediate_size, bias=False),
        "up": dense_init(r[5], d, cfg.intermediate_size, bias=False),
        "down": dense_init(r[6], cfg.intermediate_size, d, bias=False),
        "post_ffw_norm": jnp.zeros((d,), jnp.float32),
    }


def init_params(cfg: GemmaTextConfig, rng: jax.Array) -> Params:
    r = jax.random.split(rng, 4 + cfg.num_layers)
    layers = [_layer_init(r[4 + i], cfg) for i in range(cfg.num_layers)]
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *layers)
    return {
        "embed": jax.random.normal(r[0], (cfg.vocab_size, cfg.hidden_size)) * 0.02,
        "layers": stacked,
        "final_norm": jnp.zeros((cfg.hidden_size,), jnp.float32),
        "proj1": dense_init(r[1], cfg.hidden_size, cfg.projection_hidden, bias=False),
        "proj2": dense_init(r[2], cfg.projection_hidden, cfg.embedding_dim, bias=False),
    }


def _layer_apply(cfg: GemmaTextConfig, h, lp, mask_sliding, mask_full, pos, is_global):
    b, s, d = h.shape
    x = _rms_norm(lp["input_norm"], h, cfg.rms_norm_eps)
    q = dense(lp["q"], x).reshape(b, s, cfg.num_heads, cfg.head_dim)
    k = dense(lp["k"], x).reshape(b, s, cfg.num_kv_heads, cfg.head_dim)
    v = dense(lp["v"], x).reshape(b, s, cfg.num_kv_heads, cfg.head_dim)
    q = _rms_norm(lp["q_norm"], q, cfg.rms_norm_eps)
    k = _rms_norm(lp["k_norm"], k, cfg.rms_norm_eps)
    theta = jnp.where(is_global, cfg.rope_theta, cfg.rope_local_base_freq)
    # theta is traced (scan over layers); compute both and select.
    q_g, k_g = _rope(q, pos, cfg.rope_theta), _rope(k, pos, cfg.rope_theta)
    q_l, k_l = _rope(q, pos, cfg.rope_local_base_freq), _rope(k, pos, cfg.rope_local_base_freq)
    q = jnp.where(is_global, q_g, q_l)
    k = jnp.where(is_global, k_g, k_l)
    mask = jnp.where(is_global, mask_full, mask_sliding)

    # GQA: repeat kv heads.
    rep = cfg.num_heads // cfg.num_kv_heads
    k = jnp.repeat(k, rep, axis=2)
    v = jnp.repeat(v, rep, axis=2)
    scale = cfg.query_pre_attn_scalar ** -0.5
    logits = jnp.einsum("bshd,bthd->bhst", q, k, preferred_element_type=jnp.float32) * scale
    logits = jnp.where(mask, logits, -1e9)
    w = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(q.dtype)
    o = jnp.einsum("bhst,bthd->bshd", w, v, preferred_element_type=q.dtype)
    attn = dense(lp["o"], o.reshape(b, s, -1))
    attn = _rms_norm(lp["post_attn_norm"], attn, cfg.rms_norm_eps)
    h = h + attn

    x = _rms_norm(lp["pre_ffw_norm"], h, cfg.rms_norm_eps)
    gate = jax.nn.gelu(dense(lp["gate"], x), approximate=True)
    mlp = dense(lp["down"], gate * dense(lp["up"], x))
    mlp = _rms_norm(lp["post_ffw_norm"], mlp, cfg.rms_norm_eps)
    return h + mlp


@partial(jax.jit, static_argnames=("cfg", "causal"))
def encode_tokens(
    params: Params,
    cfg: GemmaTextConfig,
    tokens: jnp.ndarray,  # [B, S] int32
    token_mask: jnp.ndarray,  # [B, S] bool
    causal: bool = False,
) -> jnp.ndarray:
    """Token ids -> [B, S, hidden] contextual states."""
    b, s = tokens.shape
    h = params["embed"][tokens] * jnp.sqrt(float(cfg.hidden_size)).astype(jnp.float32)
    pos = jnp.arange(s)

    valid = token_mask[:, None, None, :]  # keys valid
    qpos = pos[None, None, :, None]
    kpos = pos[None, None, None, :]
    base = valid
    if causal:
        base = jnp.logical_and(base, kpos <= qpos)
    window = jnp.abs(qpos - kpos) < cfg.sliding_window
    mask_sliding = jnp.logical_and(base, window)
    mask_full = base

    def body(carry, xs):
        lp, is_global = xs
        return _layer_apply(cfg, carry, lp, mask_sliding, mask_full, pos, is_global), None

    is_global = jnp.asarray(
        [cfg.layer_is_global(i) for i in range(cfg.num_layers)]
    )
    h, _ = jax.lax.scan(body, h, (params["layers"], is_global))
    return _rms_norm(params["final_norm"], h, cfg.rms_norm_eps)


@partial(jax.jit, static_argnames=("cfg",))
def embed_tokens(
    params: Params, cfg: GemmaTextConfig, tokens: jnp.ndarray, token_mask: jnp.ndarray
) -> jnp.ndarray:
    """Token ids -> [B, embedding_dim] L2-normalized sentence embeddings."""
    h = encode_tokens(params, cfg, tokens, token_mask, causal=False)
    m = token_mask.astype(h.dtype)[..., None]
    pooled = jnp.sum(h * m, axis=1) / jnp.maximum(jnp.sum(m, axis=1), 1.0)
    e = dense(params["proj2"], dense(params["proj1"], pooled))
    return e / jnp.maximum(jnp.linalg.norm(e, axis=-1, keepdims=True), 1e-12)


# =========================================================================
# TextEmbedder facade (reference: core/text-embedder.h, embedding-model.h)
# =========================================================================

class GemmaEmbedder:
    """Text -> embedding with reference-compatible prefixes and pooling."""

    # Sequence-length buckets to bound compiled program count.
    _BUCKETS = [16, 32, 64, 128, 256, 512, 1024, 2048]

    def __init__(self, params: Params, cfg: GemmaTextConfig, tokenizer):
        self.params = params
        self.cfg = cfg
        self.tokenizer = tokenizer

    def _tokenize(self, text: str) -> list[int]:
        # [bos] ids [eos], truncated to max_seq_length with EOS kept
        # (reference: gemma-embedding-model.cpp:185-195).
        ids = [self.cfg.bos_token_id] + self.tokenizer.text_to_tokens(text)
        ids = ids[: self.cfg.max_seq_length - 1]
        ids.append(self.cfg.eos_token_id)
        return ids

    def get_embeddings(self, text: str) -> np.ndarray:
        ids = self._tokenize(text)
        bucket = next((b for b in self._BUCKETS if b >= len(ids)), self._BUCKETS[-1])
        ids = ids[:bucket]
        tokens = np.full((1, bucket), self.cfg.pad_token_id, np.int32)
        tokens[0, : len(ids)] = ids
        mask = np.zeros((1, bucket), bool)
        mask[0, : len(ids)] = True
        e = embed_tokens(self.params, self.cfg, jnp.asarray(tokens), jnp.asarray(mask))
        return np.asarray(e[0])

    def get_embeddings_with_prefix(self, text: str, prefix: str) -> np.ndarray:
        return self.get_embeddings(prefix + text)

    def get_query_embeddings(self, query: str) -> np.ndarray:
        return self.get_embeddings_with_prefix(query, QUERY_PREFIX)

    def get_document_embeddings(self, document: str) -> np.ndarray:
        return self.get_embeddings_with_prefix(document, DOCUMENT_PREFIX)

    def get_similarity(self, a, b) -> float:
        ea = self.get_embeddings(a) if isinstance(a, str) else np.asarray(a)
        eb = self.get_embeddings(b) if isinstance(b, str) else np.asarray(b)
        return cosine_similarity(ea, eb)

    @staticmethod
    def truncate_embedding(embedding: np.ndarray, target_dim: int) -> np.ndarray:
        """Matryoshka truncation + renormalize (reference: cpp:344-358)."""
        embedding = np.asarray(embedding)
        if target_dim <= 0 or target_dim >= embedding.shape[-1]:
            return embedding
        t = embedding[..., :target_dim]
        norm = np.linalg.norm(t, axis=-1, keepdims=True)
        return np.where(norm > 0, t / np.maximum(norm, 1e-12), t)


def cosine_similarity(a: np.ndarray, b: np.ndarray) -> float:
    a, b = np.asarray(a, np.float32), np.asarray(b, np.float32)
    if a.shape != b.shape or a.size == 0:
        return 0.0
    denom = float(np.linalg.norm(a) * np.linalg.norm(b))
    if denom == 0.0:
        return 0.0
    return float(np.dot(a, b) / denom)


def cosine_distance(a: np.ndarray, b: np.ndarray) -> float:
    """1 - similarity, scipy convention (reference: cosine-distance.cpp)."""
    a, b = np.asarray(a), np.asarray(b)
    if a.shape != b.shape:
        raise ValueError("cosine distance: vectors must have the same length")
    return 1.0 - cosine_similarity(a, b)
