"""Cross-model speculative decoding: small draft model + large verifier.

TPU-native mirror of the reference's speculative-decode benchmark
(reference: core/speculative-decode-bench.cpp — greedy vs speculative
decoder time) generalized to a two-model scheme: a draft model proposes
``gamma`` tokens autoregressively, the verify model scores the whole
proposal in ONE batched pass, and the longest agreeing prefix is accepted
(greedy acceptance — output is bit-identical to the verifier's own greedy
decode).  The entire propose/verify/rollback loop runs inside one
``lax.while_loop`` under jit; cache rollback is index arithmetic on the
fixed-capacity KV caches, never reallocation.

Cache-position invariant: with input sequence I = [bos, t0, t1, ...],
a cache at ``cur_len = m`` holds K/V for I[0..m-1] and the next input is
I[m].  At every loop entry both caches sit at ``cur_len == count`` (count
= accepted tokens), so rollback after a round is just ``cur_len = count'``.
The draft consumes one input beyond its last proposal so its cache stays
valid even when every proposal is accepted.

Both Moonshine sizes share the 32768-token vocabulary (reference:
core/moonshine-streaming-model.h:23), which is what makes tiny-draft /
base-verify work.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..core.config import MoonshineArchConfig
from ..models import moonshine as mm


class SpecResult(NamedTuple):
    tokens: jnp.ndarray  # [max_tokens] int32, EOS-padded
    length: jnp.ndarray  # scalar int32
    # Telemetry: accepted-draft-token count and verifier call count, the two
    # numbers that decide whether speculation pays off.
    accepted_draft_tokens: jnp.ndarray
    verify_calls: jnp.ndarray


@partial(jax.jit, static_argnames=("draft_cfg", "verify_cfg", "gamma", "max_tokens"))
def speculative_decode(
    draft_params: dict,
    draft_cfg: MoonshineArchConfig,
    verify_params: dict,
    verify_cfg: MoonshineArchConfig,
    draft_memory: jnp.ndarray,  # [1, Td, Dd]
    draft_mask: jnp.ndarray,
    verify_memory: jnp.ndarray,  # [1, Tv, Dv]
    verify_mask: jnp.ndarray,
    gamma: int = 4,
    max_tokens: int = 64,
) -> SpecResult:
    """Single-utterance greedy decode of the verify model, accelerated by
    the draft model.  Output equals ``greedy_decode`` on the verifier."""
    assert draft_cfg.eos_token_id == verify_cfg.eos_token_id
    eos = verify_cfg.eos_token_id
    bos = verify_cfg.decoder_start_token_id

    ddec, vdec = draft_params["decoder"], verify_params["decoder"]
    cap = max_tokens + gamma + 2  # cache slack for a final over-proposal

    dk, dv = mm.compute_cross_kv(ddec, draft_cfg, draft_memory)
    draft_cache = mm.init_cache(draft_cfg, 1, cap, dk, dv, draft_mask, dtype=draft_memory.dtype)
    vk, vv = mm.compute_cross_kv(vdec, verify_cfg, verify_memory)
    verify_cache = mm.init_cache(verify_cfg, 1, cap, vk, vv, verify_mask, dtype=verify_memory.dtype)

    buf = max_tokens + gamma + 1

    class Carry(NamedTuple):
        draft_cache: mm.DecoderCache
        verify_cache: mm.DecoderCache
        tokens: jnp.ndarray  # [buf]
        count: jnp.ndarray  # accepted token count
        done: jnp.ndarray
        accepted_draft: jnp.ndarray
        verify_calls: jnp.ndarray

    def get_last(tokens, count):
        return jnp.where(count > 0, tokens[jnp.maximum(count - 1, 0)], bos)

    def cond(c: Carry):
        return jnp.logical_not(c.done)

    def body(c: Carry):
        last = get_last(c.tokens, c.count)

        # ---- Draft proposes gamma tokens (gamma+1 inputs consumed so the
        # cache covers the all-accepted case) ---------------------------
        def draft_step(i, st):
            dcache, proposals, nxt_in = st
            logits, dcache, _ = mm.decoder_apply(ddec, draft_cfg, nxt_in[None, None], dcache)
            pred = jnp.argmax(logits[0, -1]).astype(jnp.int32)
            proposals = jnp.where(jnp.arange(gamma) == i, pred, proposals)
            return (dcache, proposals, pred)

        dcache, proposals, last_pred = jax.lax.fori_loop(
            0, gamma, draft_step, (c.draft_cache, jnp.zeros((gamma,), jnp.int32), last)
        )
        # Consume the final proposal so draft cache holds I[0..count+gamma].
        _, dcache, _ = mm.decoder_apply(ddec, draft_cfg, last_pred[None, None], dcache)

        # ---- Verifier scores [last, p0..p_{g-1}] in one pass ----------
        seq = jnp.concatenate([last[None], proposals])  # [gamma+1]
        logits, vcache, _ = mm.decoder_apply(vdec, verify_cfg, seq[None], c.verify_cache)
        preds = jnp.argmax(logits[0], axis=-1).astype(jnp.int32)  # [gamma+1]
        # preds[i] = verifier's token t_{count+i}; proposal i accepted iff
        # preds[i] == proposals[i] and no earlier disagreement.
        agree = preds[:gamma] == proposals
        n_accept = jnp.argmin(jnp.concatenate([agree, jnp.zeros(1, bool)]).astype(jnp.int32))
        correction = preds[n_accept]  # verifier's token at the divergence

        # EOS inside the accepted prefix ends the sequence there.
        eos_pos = jnp.argmax(
            jnp.concatenate([(proposals == eos), jnp.ones(1, bool)]).astype(jnp.int32)
        )
        eos_in_accept = eos_pos < n_accept
        n_keep = jnp.where(eos_in_accept, eos_pos, n_accept)

        # Write accepted proposals at [count, count+n_keep) and (when the
        # correction is a real token) the correction at count+n_keep.
        idx = jnp.arange(buf)
        rel = idx - c.count
        corr_is_token = jnp.logical_not(eos_in_accept) & (correction != eos)
        new_tokens = jnp.where(
            (rel >= 0) & (rel < n_keep),
            proposals[jnp.clip(rel, 0, gamma - 1)],
            jnp.where((rel == n_keep) & corr_is_token, correction, c.tokens),
        )
        count = c.count + n_keep + corr_is_token.astype(jnp.int32)
        done = eos_in_accept | (correction == eos) | (count >= max_tokens)
        count = jnp.minimum(count, max_tokens)

        # Roll both caches back to the accepted prefix.
        dcache = dcache._replace(cur_len=count)
        vcache = vcache._replace(cur_len=count)
        return Carry(
            draft_cache=dcache,
            verify_cache=vcache,
            tokens=new_tokens,
            count=count,
            done=done,
            accepted_draft=c.accepted_draft + n_keep,
            verify_calls=c.verify_calls + 1,
        )

    init = Carry(
        draft_cache=draft_cache,
        verify_cache=verify_cache,
        tokens=jnp.full((buf,), eos, jnp.int32),
        count=jnp.zeros((), jnp.int32),
        done=jnp.zeros((), bool),
        accepted_draft=jnp.zeros((), jnp.int32),
        verify_calls=jnp.zeros((), jnp.int32),
    )
    out = jax.lax.while_loop(cond, body, init)
    idx = jnp.arange(buf)
    tokens = jnp.where(idx < out.count, out.tokens, eos)[:max_tokens]
    return SpecResult(tokens, out.count, out.accepted_draft, out.verify_calls)
