"""Char-level tokenizer-POS tagger — the zh/ja text-frontend neural tier.

The reference segments Chinese/Japanese text into words with UPOS tags
via ONNX transformer helpers (reference: core/moonshine-tts/src/
lang-specific/chinese-tok-pos-onnx.h — a RoBERTa BIO tagger — and
japanese-tok-pos-onnx.h).  Those models are CDN assets, absent here;
what IS in-tree is the reference's own annotated corpora
(tests/data/{zh_hans,ja}/tok_pos_wiki*.txt: ``surface/UPOS`` tokens).

This module is the TPU-native equivalent trained on that data
(train/tok_pos.py): a small char-level transformer encoder with two
classification heads — B/I word-boundary and UPOS — serving
``annotate(text) -> [(surface, upos)]`` with the reference helper's
contract.  Static [max_len] shapes: one compiled program serves any
line.
"""

from __future__ import annotations

import json
from functools import partial
from pathlib import Path
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..models.layers import Params, dense, dense_init, layer_norm, norm_init
from .g2p_transformer import _enc_block, _block_init

PAD, UNK = 0, 1


class TokPosConfig(NamedTuple):
    dim: int = 128
    layers: int = 2
    heads: int = 4
    max_len: int = 192


def init_params(cfg: TokPosConfig, rng, in_vocab_size: int, n_tags: int) -> Params:
    k = jax.random.split(rng, 4 + cfg.layers)
    return {
        "embed": jax.random.normal(k[0], (in_vocab_size, cfg.dim)) * 0.02,
        "pos": jax.random.normal(k[1], (cfg.max_len, cfg.dim)) * 0.02,
        "enc": [_block_init(k[2 + i], cfg.dim, cross=False) for i in range(cfg.layers)],
        "ln_f": norm_init(cfg.dim),
        "head_bio": dense_init(k[-2], cfg.dim, 2),
        "head_pos": dense_init(k[-1], cfg.dim, n_tags),
    }


@partial(jax.jit, static_argnums=(1,))
def forward(p: Params, cfg: TokPosConfig, src: jnp.ndarray):
    """src [B, max_len] int32 -> (bio logits [B, L, 2], pos logits [B, L, T])."""
    valid = src != PAD
    x = p["embed"][src] + p["pos"][None, : src.shape[1], :]
    mask = valid[:, None, None, :]
    for blk in p["enc"]:
        x = _enc_block(blk, x, cfg.heads, mask)
    x = layer_norm(p["ln_f"], x)
    return dense(p["head_bio"], x), dense(p["head_pos"], x)


class TokPosTagger:
    """Trained char tagger + vocab/tag tables, one self-describing artifact."""

    def __init__(self, cfg: TokPosConfig, params: Params,
                 char_vocab: list[str], tags: list[str]):
        self.cfg = cfg
        self.params = params
        self.char_vocab = list(char_vocab)
        self.tags = list(tags)
        self._char_map = {c: i + 2 for i, c in enumerate(self.char_vocab)}

    def encode(self, text: str) -> np.ndarray:
        ids = [self._char_map.get(c, UNK) for c in text[: self.cfg.max_len]]
        out = np.zeros(self.cfg.max_len, np.int32)
        out[: len(ids)] = ids
        return out

    def annotate(self, text: str) -> list[tuple[str, str]]:
        """-> one (surface, UPOS) per predicted word (reference:
        ChineseTokPosOnnx::annotate)."""
        text = text.strip()
        if not text:
            return []
        src = self.encode(text)[None, :]
        bio, pos = forward(self.params, self.cfg, jnp.asarray(src))
        n = min(len(text), self.cfg.max_len)
        is_b = np.asarray(jnp.argmax(bio[0, :n], axis=-1)) == 1
        tag_ids = np.asarray(jnp.argmax(pos[0, :n], axis=-1))
        words: list[tuple[str, str]] = []
        start = 0
        for i in range(1, n):
            if is_b[i]:
                words.append((text[start:i], self.tags[int(tag_ids[start])]))
                start = i
        words.append((text[start:n], self.tags[int(tag_ids[start])]))
        return [w for w in words if w[0].strip()]

    def segment(self, text: str) -> list[str]:
        return [w for w, _ in self.annotate(text)]

    # -- persistence (same safetensors shape as G2PTransformer) -------------

    def save(self, path: str | Path) -> None:
        from safetensors.numpy import save_file

        flat = {}
        for key_path, leaf in jax.tree_util.tree_flatten_with_path(self.params)[0]:
            name = "/".join(
                str(k.key) if hasattr(k, "key") else str(getattr(k, "idx", k))
                for k in key_path
            )
            flat[name] = np.asarray(leaf)
        meta = {
            "char_vocab": json.dumps(self.char_vocab, ensure_ascii=False),
            "tags": json.dumps(self.tags, ensure_ascii=False),
            "config": json.dumps(self.cfg._asdict()),
        }
        save_file(flat, str(path), metadata=meta)

    @classmethod
    def load(cls, path: str | Path) -> "TokPosTagger":
        from safetensors import safe_open
        from safetensors.numpy import load_file

        with safe_open(str(path), framework="numpy") as f:
            meta = f.metadata() or {}
        if "char_vocab" not in meta or "tags" not in meta:
            raise ValueError(f"{path}: not a TokPosTagger artifact")
        char_vocab = json.loads(meta["char_vocab"])
        tags = json.loads(meta["tags"])
        cfg = TokPosConfig(**json.loads(meta["config"]))
        flat = load_file(str(path))
        target = init_params(cfg, jax.random.PRNGKey(0), len(char_vocab) + 2, len(tags))
        paths = jax.tree_util.tree_flatten_with_path(target)[0]
        treedef = jax.tree_util.tree_structure(target)
        leaves = []
        for key_path, leaf in paths:
            name = "/".join(
                str(k.key) if hasattr(k, "key") else str(getattr(k, "idx", k))
                for k in key_path
            )
            arr = flat[name]
            if arr.shape != tuple(leaf.shape):
                raise ValueError(f"Shape mismatch for {name}")
            leaves.append(jnp.asarray(arr, leaf.dtype))
        return cls(cfg, jax.tree_util.tree_unflatten(treedef, leaves),
                   char_vocab, tags)
