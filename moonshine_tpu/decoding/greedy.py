"""Jitted greedy autoregressive decoding with on-HBM KV cache.

TPU-native counterpart of the reference's per-token ORT decode loop
(reference: core/moonshine-model.cpp:349-511): the whole loop runs inside
one ``lax.while_loop`` under ``jit`` — no host round-trips per token — with
an early exit once every batch element has emitted EOS or hit its
per-utterance token cap (the reference's ``duration * max_tokens_per_second``
hallucination watchdog, core/moonshine-model.cpp:349).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..core.config import MoonshineArchConfig
from ..models import moonshine as mm


class GreedyResult(NamedTuple):
    tokens: jnp.ndarray  # [B, max_tokens] int32, EOS-padded
    lengths: jnp.ndarray  # [B] int32 tokens emitted before EOS (exclusive)


@partial(jax.jit, static_argnames=("cfg", "max_tokens", "kv_int8"))
def greedy_decode(
    params: dict,
    cfg: MoonshineArchConfig,
    memory: jnp.ndarray,  # [B, T, D] encoder output
    memory_mask: jnp.ndarray,  # [B, T]
    max_tokens: int,
    token_caps: jnp.ndarray | None = None,  # [B] per-utterance cap
    kv_int8: bool = False,  # int8 KV caches with fused dequant (ops/int8_kv.py)
) -> GreedyResult:
    b = memory.shape[0]
    dec = params["decoder"]
    k_cross, v_cross = mm.compute_cross_kv(dec, cfg, memory)
    cache = mm.init_cache(
        cfg, b, max_tokens + 1, k_cross, v_cross, memory_mask,
        dtype=memory.dtype, kv_int8=kv_int8,
    )

    if token_caps is None:
        token_caps = jnp.full((b,), max_tokens, jnp.int32)
    token_caps = jnp.minimum(token_caps, max_tokens)

    bos = jnp.full((b, 1), cfg.decoder_start_token_id, jnp.int32)
    logits, cache, _ = mm.decoder_apply(dec, cfg, bos, cache)
    first = jnp.argmax(logits[:, -1, :], axis=-1).astype(jnp.int32)

    tokens0 = jnp.full((b, max_tokens), cfg.eos_token_id, jnp.int32)

    class Carry(NamedTuple):
        cache: mm.DecoderCache
        tokens: jnp.ndarray
        last: jnp.ndarray  # [B]
        done: jnp.ndarray  # [B]
        lengths: jnp.ndarray  # [B]
        step: jnp.ndarray  # scalar

    keep0 = (first != cfg.eos_token_id) & (token_caps > 0)
    tokens0 = tokens0.at[:, 0].set(jnp.where(keep0, first, cfg.eos_token_id))
    lengths0 = keep0.astype(jnp.int32)
    done0 = (first == cfg.eos_token_id) | (lengths0 >= token_caps)
    carry = Carry(cache, tokens0, jnp.where(done0, cfg.eos_token_id, first), done0, lengths0, jnp.ones((), jnp.int32))

    def cond(c: Carry):
        return jnp.logical_and(c.step < max_tokens, jnp.logical_not(jnp.all(c.done)))

    def body(c: Carry):
        logits, cache, _ = mm.decoder_apply(dec, cfg, c.last[:, None], c.cache)
        nxt = jnp.argmax(logits[:, -1, :], axis=-1).astype(jnp.int32)
        is_eos = nxt == cfg.eos_token_id
        active = jnp.logical_not(c.done)
        keep = active & jnp.logical_not(is_eos)
        emit = jnp.where(keep, nxt, cfg.eos_token_id)
        tokens = jax.lax.dynamic_update_slice(c.tokens, emit[:, None], (0, c.step))
        lengths = c.lengths + keep.astype(jnp.int32)
        # An element stops on EOS or at its per-utterance token cap
        # (the max_tokens_per_second watchdog).
        done = c.done | is_eos | (lengths >= token_caps)
        last = jnp.where(done, cfg.eos_token_id, nxt)
        return Carry(cache, tokens, last, done, lengths, c.step + 1)

    out = jax.lax.while_loop(cond, body, carry)
    return GreedyResult(out.tokens, out.lengths)
