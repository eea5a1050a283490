"""Batched beam search in one jitted while_loop.

The reference decodes greedily only (reference: core/moonshine-model.cpp:
349-511); beam search is a first-class addition of the TPU build (BASELINE
config: "Base batched beam on LibriSpeech").  Beams are flattened into the
batch axis so every step is one decoder call over [B*K] rows; beam
reordering gathers the self-KV cache along that axis on device.

Finished beams stay in the active set with frozen scores: their only
continuation is EOS at logprob 0, so top-k naturally keeps or drops them
against live hypotheses.  Scores use Google-NMT length normalization
``score / ((5+len)/6)**alpha`` at selection time.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..core.config import MoonshineArchConfig
from ..models import moonshine as mm
from ..ops.beam_gather import gather_kv_rows, gather_scale_rows

NEG_INF = -1e9


class BeamResult(NamedTuple):
    tokens: jnp.ndarray  # [B, max_tokens] best beam, EOS-padded
    lengths: jnp.ndarray  # [B]
    scores: jnp.ndarray  # [B] normalized log-prob of the best beam


def _expand_per_beam(x: jnp.ndarray, k: int, axis: int) -> jnp.ndarray:
    return jnp.repeat(x, k, axis=axis)


@partial(jax.jit, static_argnames=("cfg", "beam_size", "max_tokens", "gather_impl", "kv_int8"))
def beam_decode(
    params: dict,
    cfg: MoonshineArchConfig,
    memory: jnp.ndarray,  # [B, T, D]
    memory_mask: jnp.ndarray,  # [B, T]
    beam_size: int = 4,
    max_tokens: int = 64,
    length_penalty: float = 0.6,
    token_caps: jnp.ndarray | None = None,  # [B]
    gather_impl: str = "auto",  # "pallas" | "xla" | "auto" — like attn_impl:
    # auto = Pallas row-copy gather on a single TPU backend, jnp.take
    # elsewhere; sharded (pjit/GSPMD) callers should pass "xla" (a
    # pallas_call is opaque to GSPMD repartitioning).
    kv_int8: bool = False,  # int8 KV with fused dequant (ops/int8_kv.py);
    # the parent reorder also gathers the per-column scale arrays.
) -> BeamResult:
    b = memory.shape[0]
    k = beam_size
    bk = b * k
    dec = params["decoder"]
    eos = cfg.eos_token_id
    if gather_impl == "auto":
        use_pallas_gather = jax.default_backend() == "tpu"
    else:
        use_pallas_gather = gather_impl == "pallas"

    # Cross caches stay UNEXPANDED at B rows: the K beams of an utterance
    # share its memory, and decoder_apply(beam_k=k) folds beams into the
    # cross-attention query axis — removing the K-fold redundant cross-KV
    # streaming per step (the dominant beam HBM cost).  Only the self
    # caches are per-beam (B*K rows).
    k_cross, v_cross = mm.compute_cross_kv(dec, cfg, memory)
    cache = mm.init_cache(
        cfg, bk, max_tokens + 1, k_cross, v_cross, memory_mask,
        dtype=memory.dtype, kv_int8=kv_int8,
    )

    if token_caps is None:
        token_caps = jnp.full((b,), max_tokens, jnp.int32)
    token_caps = jnp.minimum(token_caps, max_tokens)
    caps_bk = _expand_per_beam(token_caps, k, axis=0)  # [B*K]

    # Prefill BOS on every beam.
    bos = jnp.full((bk, 1), cfg.decoder_start_token_id, jnp.int32)
    logits, cache, _ = mm.decoder_apply(dec, cfg, bos, cache, beam_k=k)
    logp0 = jax.nn.log_softmax(logits[:, -1].astype(jnp.float32), axis=-1)  # [B*K, V]

    # Initial expansion: take top-k distinct first tokens per batch element
    # from beam 0 (all beams are identical at this point).
    logp0_b = logp0.reshape(b, k, -1)[:, 0]  # [B, V]
    top_scores, top_tokens = jax.lax.top_k(logp0_b, k)  # [B, K]

    class Carry(NamedTuple):
        cache: mm.DecoderCache
        tokens: jnp.ndarray  # [B, K, max_tokens]
        scores: jnp.ndarray  # [B, K] cumulative logprob
        last: jnp.ndarray  # [B, K]
        lengths: jnp.ndarray  # [B, K]
        finished: jnp.ndarray  # [B, K]
        step: jnp.ndarray

    tokens0 = jnp.full((b, k, max_tokens), eos, jnp.int32)
    tokens0 = tokens0.at[:, :, 0].set(top_tokens)
    finished0 = (top_tokens == eos) | (caps_bk.reshape(b, k) <= 0)
    lengths0 = jnp.where(finished0, 0, 1).astype(jnp.int32)
    carry = Carry(
        cache=cache,
        tokens=tokens0,
        scores=top_scores,
        last=top_tokens,
        lengths=lengths0,
        finished=finished0,
        step=jnp.ones((), jnp.int32),
    )

    vocab = cfg.vocab_size

    def cond(c: Carry):
        return jnp.logical_and(c.step < max_tokens, jnp.logical_not(jnp.all(c.finished)))

    def body(c: Carry):
        logits, cache, _ = mm.decoder_apply(
            dec, cfg, c.last.reshape(bk, 1), c.cache, beam_k=k
        )
        logp = jax.nn.log_softmax(logits[:, -1].astype(jnp.float32), axis=-1).reshape(b, k, vocab)
        # Finished beams: only EOS at logprob 0 (score frozen).
        eos_only = jnp.full((vocab,), NEG_INF).at[eos].set(0.0)
        logp = jnp.where(c.finished[:, :, None], eos_only[None, None, :], logp)
        cand = c.scores[:, :, None] + logp  # [B, K, V]
        flat = cand.reshape(b, k * vocab)
        new_scores, idx = jax.lax.top_k(flat, k)  # [B, K]
        parent = idx // vocab  # [B, K] beam index
        token = (idx % vocab).astype(jnp.int32)

        # Gather beam state from parents.
        batch_idx = jnp.arange(b)[:, None]
        tokens = c.tokens[batch_idx, parent]  # [B, K, max_tokens]
        lengths = c.lengths[batch_idx, parent]
        was_finished = c.finished[batch_idx, parent]

        # Gather self-KV along the flattened beam axis.  On TPU this is a
        # Pallas block-copy kernel (scalar-prefetched row indices) — XLA's
        # gather path runs at ~28 GB/s here, 12.5 ms/step of bookkeeping
        # at bench shapes (docs/PERF.md); the DMA copy doesn't.
        flat_parent = (batch_idx * k + parent).reshape(bk)  # [B*K]
        if use_pallas_gather:
            k_self, v_self = gather_kv_rows(
                cache.k_self, cache.v_self, flat_parent
            )
            if kv_int8:
                ks, vs = gather_scale_rows(
                    cache.k_self_scale, cache.v_self_scale, flat_parent
                )
        else:
            k_self = jnp.take(cache.k_self, flat_parent, axis=1)
            v_self = jnp.take(cache.v_self, flat_parent, axis=1)
            if kv_int8:
                ks = jnp.take(cache.k_self_scale, flat_parent, axis=1)
                vs = jnp.take(cache.v_self_scale, flat_parent, axis=1)
        cache = cache._replace(k_self=k_self, v_self=v_self)
        if kv_int8:
            cache = cache._replace(k_self_scale=ks, v_self_scale=vs)

        is_eos = token == eos
        keep = jnp.logical_not(was_finished) & jnp.logical_not(is_eos)
        emit = jnp.where(keep, token, eos)
        tokens = jax.vmap(
            lambda t, e: jax.lax.dynamic_update_slice(t, e[:, None], (0, c.step))
        )(tokens, emit)
        lengths = lengths + keep.astype(jnp.int32)
        finished = was_finished | is_eos | (lengths >= caps_bk.reshape(b, k))
        last = jnp.where(finished, eos, token)
        return Carry(cache, tokens, new_scores, last, lengths, finished, c.step + 1)

    out = jax.lax.while_loop(cond, body, carry)

    # Length-normalized selection.
    norm = ((5.0 + out.lengths.astype(jnp.float32)) / 6.0) ** length_penalty
    final_scores = out.scores / norm
    best = jnp.argmax(final_scores, axis=1)  # [B]
    batch_idx = jnp.arange(b)
    return BeamResult(
        tokens=out.tokens[batch_idx, best],
        lengths=out.lengths[batch_idx, best],
        scores=final_scores[batch_idx, best],
    )
