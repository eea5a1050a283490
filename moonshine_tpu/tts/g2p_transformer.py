"""Neural OOV G2P: character -> IPA seq2seq transformer, TPU-native.

Analog of the reference's neural G2P helpers (reference:
core/moonshine-tts/src/lang-specific/g2p-transformer-model.{h,cpp} and
english-hand-oov.{h,cpp} — ONNX models invoked for words the lexicon
misses).  Here the helper is a small JAX encoder-decoder transformer
with static [max_word, max_ipa] shapes so one compiled program serves
every word; it is trained in-repo by distilling a language's
lexicon+rules engine (train/g2p.py) since published checkpoints cannot
be fetched in this environment.  ``GraphemeToPhonemizer(oov_model=...)``
routes only true out-of-lexicon words through the network, so lexicon
entries stay exact.

The output vocabulary is stored inside the safetensors file's metadata,
making a saved model a single self-describing artifact (the ``.ort``
distribution analog).
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

# Input alphabet: lowercase word characters the engines tokenize.
_IN_CHARS = "abcdefghijklmnopqrstuvwxyz'-0123456789"
PAD, BOS, EOS, UNK = 0, 1, 2, 3
_IN_VOCAB = {c: i + 4 for i, c in enumerate(_IN_CHARS)}
IN_VOCAB_SIZE = len(_IN_CHARS) + 4


class G2PModelConfig(NamedTuple):
    dim: int = 128
    layers: int = 2
    heads: int = 4
    max_word: int = 28
    max_ipa: int = 40


def encode_word(word: str, max_word: int) -> np.ndarray:
    """word -> [max_word] int32 ids (BOS ... EOS PAD...)."""
    ids = [BOS] + [_IN_VOCAB.get(c, UNK) for c in word.lower()[: max_word - 2]] + [EOS]
    out = np.zeros(max_word, np.int32)
    out[: len(ids)] = ids
    return out


def _block_init(rng, dim: int, cross: bool):
    n = 5 if cross else 3
    k = jax.random.split(rng, n + 2)
    p = {
        "ln1": norm_init(dim),
        "qkv": dense_init(k[0], dim, 3 * dim),
        "attn_out": dense_init(k[1], dim, dim),
        "ln2": norm_init(dim),
        "fc1": dense_init(k[2], dim, 4 * dim),
        "fc2": dense_init(k[3], 4 * dim, dim),
    }
    if cross:
        p["ln_x"] = norm_init(dim)
        p["x_q"] = dense_init(k[4], dim, dim)
        p["x_kv"] = dense_init(k[5], dim, 2 * dim)
        p["x_out"] = dense_init(k[6], dim, dim)
    return p


def init_params(cfg: G2PModelConfig, rng, out_vocab_size: int,
                in_vocab_size: int = IN_VOCAB_SIZE) -> Params:
    k = jax.random.split(rng, 6 + 2 * cfg.layers)
    p: Params = {
        "in_embed": jax.random.normal(k[0], (in_vocab_size, cfg.dim)) * 0.02,
        "in_pos": jax.random.normal(k[1], (cfg.max_word, cfg.dim)) * 0.02,
        "out_embed": jax.random.normal(k[2], (out_vocab_size, cfg.dim)) * 0.02,
        "out_pos": jax.random.normal(k[3], (cfg.max_ipa, cfg.dim)) * 0.02,
        "enc": [_block_init(k[4 + i], cfg.dim, cross=False) for i in range(cfg.layers)],
        "dec": [
            _block_init(k[4 + cfg.layers + i], cfg.dim, cross=True)
            for i in range(cfg.layers)
        ],
        "ln_f": norm_init(cfg.dim),
        "head": dense_init(k[-1], cfg.dim, out_vocab_size),
    }
    return p


def _mha(q, k, v, heads: int, mask):
    B, Tq, D = q.shape
    Tk = k.shape[1]
    hd = D // heads
    q = q.reshape(B, Tq, heads, hd).transpose(0, 2, 1, 3)
    k = k.reshape(B, Tk, heads, hd).transpose(0, 2, 1, 3)
    v = v.reshape(B, Tk, heads, hd).transpose(0, 2, 1, 3)
    logits = jnp.einsum("bhqd,bhkd->bhqk", q, k) * (hd**-0.5)
    logits = jnp.where(mask, logits, -1e9)
    w = jax.nn.softmax(logits, axis=-1)
    o = jnp.einsum("bhqk,bhkd->bhqd", w, v)
    return o.transpose(0, 2, 1, 3).reshape(B, Tq, D)


def _enc_block(p, x, heads, mask):
    h = layer_norm(p["ln1"], x)
    q, k, v = jnp.split(dense(p["qkv"], h), 3, axis=-1)
    x = x + dense(p["attn_out"], _mha(q, k, v, heads, mask))
    h = layer_norm(p["ln2"], x)
    return x + dense(p["fc2"], jax.nn.gelu(dense(p["fc1"], h)))


def _dec_block(p, x, memory, heads, self_mask, cross_mask):
    h = layer_norm(p["ln1"], x)
    q, k, v = jnp.split(dense(p["qkv"], h), 3, axis=-1)
    x = x + dense(p["attn_out"], _mha(q, k, v, heads, self_mask))
    h = layer_norm(p["ln_x"], x)
    xq = dense(p["x_q"], h)
    xk, xv = jnp.split(dense(p["x_kv"], memory), 2, axis=-1)
    x = x + dense(p["x_out"], _mha(xq, xk, xv, heads, cross_mask))
    h = layer_norm(p["ln2"], x)
    return x + dense(p["fc2"], jax.nn.gelu(dense(p["fc1"], h)))


def encode(p: Params, cfg: G2PModelConfig, src: jnp.ndarray):
    """src [B, max_word] -> (memory [B, max_word, D], valid [B, max_word])."""
    valid = src != PAD
    x = p["in_embed"][src] + p["in_pos"][None, :, :]
    mask = valid[:, None, None, :]
    for blk in p["enc"]:
        x = _enc_block(blk, x, cfg.heads, mask)
    return x, valid


def decoder_logits(p, cfg: G2PModelConfig, memory, mem_valid, tgt):
    """Teacher-forced logits [B, T, V] for target prefix ids [B, T]."""
    T = tgt.shape[1]
    x = p["out_embed"][tgt] + p["out_pos"][None, :T, :]
    causal = jnp.tril(jnp.ones((T, T), bool))[None, None, :, :]
    self_mask = causal & (tgt != PAD)[:, None, None, :]
    cross_mask = mem_valid[:, None, None, :]
    for blk in p["dec"]:
        x = _dec_block(blk, x, memory, cfg.heads, self_mask, cross_mask)
    return dense(p["head"], layer_norm(p["ln_f"], x))


@partial(jax.jit, static_argnums=(1,))
def greedy(p: Params, cfg: G2PModelConfig, src: jnp.ndarray) -> jnp.ndarray:
    """Batched greedy decode: src [B, max_word] -> out ids [B, max_ipa].

    Re-runs the (tiny) decoder over the full prefix each step via scan —
    at dim<=128, T<=40 the whole loop is microseconds on any backend, so
    a KV cache would only add surface area.
    """
    B = src.shape[0]
    memory, mem_valid = encode(p, cfg, src)

    def step(carry, t):
        tokens, done = carry
        logits = decoder_logits(p, cfg, memory, mem_valid, tokens)
        nxt = jnp.argmax(logits[:, t, :], axis=-1).astype(jnp.int32)
        nxt = jnp.where(done, PAD, nxt)
        tokens = jax.lax.dynamic_update_slice(tokens, nxt[:, None], (0, t + 1))
        done = done | (nxt == EOS)
        return (tokens, done), None

    tokens = jnp.zeros((B, cfg.max_ipa), jnp.int32).at[:, 0].set(BOS)
    (tokens, _), _ = jax.lax.scan(
        step, (tokens, jnp.zeros(B, bool)), jnp.arange(cfg.max_ipa - 1)
    )
    return tokens


class G2PTransformer:
    """A trained char->IPA model + its output vocabulary, as one artifact."""

    def __init__(self, cfg: G2PModelConfig, params: Params, out_vocab: list[str],
                 in_vocab: list[str] | None = None):
        """``in_vocab``: optional custom input alphabet (one codepoint per
        entry, id = index + 4 after the specials) for non-Latin scripts —
        the ja kanji-reading tier stores kana+kanji here.  None keeps the
        default Latin ``_IN_CHARS`` table."""
        self.cfg = cfg
        self.params = params
        self.out_vocab = list(out_vocab)
        self.in_vocab = list(in_vocab) if in_vocab is not None else None
        self._in_map = (
            {c: i + 4 for i, c in enumerate(self.in_vocab)}
            if self.in_vocab is not None else None
        )
        self._id_to_sym = {i: s for i, s in enumerate(self.out_vocab)}
        self._sym_to_id = {s: i for i, s in enumerate(self.out_vocab)}

    @staticmethod
    def build_in_vocab(words) -> list[str]:
        """Input alphabet = every codepoint seen in the training surfaces."""
        return sorted({ch for w in words for ch in w})

    def encode_src(self, word: str) -> np.ndarray:
        """word -> [max_word] ids using the model's input alphabet."""
        if self._in_map is None:
            return encode_word(word, self.cfg.max_word)
        ids = [BOS] + [
            self._in_map.get(c, UNK) for c in word[: self.cfg.max_word - 2]
        ] + [EOS]
        out = np.zeros(self.cfg.max_word, np.int32)
        out[: len(ids)] = ids
        return out

    @property
    def in_vocab_size(self) -> int:
        return (len(self.in_vocab) + 4 if self.in_vocab is not None
                else IN_VOCAB_SIZE)

    # -- vocab ---------------------------------------------------------------

    @staticmethod
    def build_out_vocab(ipa_strings) -> list[str]:
        """Output symbols = specials + every codepoint seen in targets."""
        syms = sorted({ch for s in ipa_strings for ch in s})
        return ["<pad>", "<bos>", "<eos>", "<unk>"] + syms

    def encode_ipa(self, ipa: str) -> np.ndarray:
        ids = [BOS] + [
            self._sym_to_id.get(ch, UNK) for ch in ipa[: self.cfg.max_ipa - 2]
        ] + [EOS]
        out = np.zeros(self.cfg.max_ipa, np.int32)
        out[: len(ids)] = ids
        return out

    def decode_ids(self, ids: np.ndarray) -> str:
        out = []
        for i in np.asarray(ids):
            i = int(i)
            if i == EOS:
                break
            if i in (PAD, BOS, UNK):
                continue
            out.append(self._id_to_sym.get(i, ""))
        return "".join(out)

    # -- inference -------------------------------------------------------------

    def predict(self, word: str) -> str:
        return self.predict_batch([word])[0]

    def predict_batch(self, words: list[str]) -> list[str]:
        src = np.stack([self.encode_src(w) for w in words])
        out = greedy(self.params, self.cfg, jnp.asarray(src))
        return [self.decode_ids(row[1:]) for row in np.asarray(out)]

    # -- persistence -----------------------------------------------------------

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
            "out_vocab": json.dumps(self.out_vocab, ensure_ascii=False),
            "config": json.dumps(self.cfg._asdict()),
        }
        if self.in_vocab is not None:
            meta["in_vocab"] = json.dumps(self.in_vocab, ensure_ascii=False)
        save_file(flat, str(path), metadata=meta)

    @classmethod
    def load(cls, path: str | Path) -> "G2PTransformer":
        from safetensors import safe_open
        from safetensors.numpy import load_file

        with safe_open(str(path), framework="numpy") as f:
            meta = f.metadata() or {}
        if "out_vocab" not in meta or "config" not in meta:
            raise ValueError(f"{path}: not a G2PTransformer artifact (missing metadata)")
        out_vocab = json.loads(meta["out_vocab"])
        in_vocab = json.loads(meta["in_vocab"]) if "in_vocab" in meta else None
        cfg = G2PModelConfig(**json.loads(meta["config"]))
        flat = load_file(str(path))
        in_size = len(in_vocab) + 4 if in_vocab is not None else IN_VOCAB_SIZE
        target = init_params(cfg, jax.random.PRNGKey(0), len(out_vocab), in_size)
        paths = jax.tree_util.tree_flatten_with_path(target)[0]
        treedef = jax.tree_util.tree_structure(target)
        new_leaves = []
        for key_path, leaf in paths:
            name = "/".join(
                str(k.key) if hasattr(k, "key") else str(getattr(k, "idx", k))
                for k in key_path
            )
            if name not in flat:
                raise KeyError(f"G2P model missing tensor {name!r}")
            arr = flat[name]
            if arr.shape != tuple(leaf.shape):
                raise ValueError(f"Shape mismatch for {name}: {arr.shape} vs {tuple(leaf.shape)}")
            new_leaves.append(jnp.asarray(arr, leaf.dtype))
        params = jax.tree_util.tree_unflatten(treedef, new_leaves)
        return cls(cfg, params, out_vocab, in_vocab)
