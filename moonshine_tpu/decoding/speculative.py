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


# =========================================================================
# Batched cross-model speculative decoding (B > 1)
# =========================================================================
#
# Lanes accept different prefix lengths each round, so cache cursors
# diverge per lane: ``cur_len`` becomes a vector and K/V writes land at
# per-lane offsets via a one-hot matmul scatter (see _decoder_apply_vec).
# Rounds run in
# lockstep across lanes; finished lanes are masked (their cursors stop
# advancing, which voids any writes beyond them).  Acceptance is greedy,
# so per-lane output is bit-identical to the verifier's own greedy decode
# (BASELINE config 4: tiny-draft/base-verify as a measured configuration;
# reference: core/speculative-decode-bench.cpp).


class BatchSpecResult(NamedTuple):
    tokens: jnp.ndarray  # [B, max_tokens] int32, EOS-padded
    lengths: jnp.ndarray  # [B] int32
    accepted_draft_tokens: jnp.ndarray  # [B]
    rounds: jnp.ndarray  # scalar int32 — verify passes (shared, lockstep)


def _decoder_apply_vec(
    dec: dict,
    cfg: MoonshineArchConfig,
    tokens: jnp.ndarray,  # [B, s]
    cur_len: jnp.ndarray,  # [B] per-lane cache cursors
    k_self: jnp.ndarray,  # [L, B, H, hd, cap] — dim-major (see DecoderCache)
    v_self: jnp.ndarray,
    k_cross: jnp.ndarray,  # [L, B, H, hd, T] — dim-major (int8 if scales set)
    v_cross: jnp.ndarray,
    memory_mask: jnp.ndarray,  # [B, T]
    k_cross_scale: jnp.ndarray | None = None,  # [L, B, H, T] f32
    v_cross_scale: jnp.ndarray | None = None,
):
    """moonshine.decoder_apply with a per-lane cache cursor vector.

    Same layer math (rotary causal self-attn over the cache, rope-free
    cross-attn, SwiGLU MLP, tied unembedding); K/V writes land at each
    lane's own offset via a one-hot matmul scatter: a vmapped
    ``dynamic_update_slice`` with per-lane offsets lowers to an XLA
    scatter that measured ~200x slower than the production decode step
    on TPU (1.7 s for one 9-token Base pass at B=512 vs 8.5 ms), while
    ``einsum`` against a [B, s, cap] position one-hot plus a masked
    select is three streaming passes over the (tiny) self cache.
    """
    from ..models.layers import ACTIVATIONS, dense, layer_norm
    from ..models.moonshine import _attention_dm, _split_heads
    from ..ops.int8_kv import attention_dm_q8
    from ..ops.rotary import apply_rotary, rotary_tables

    b, s = tokens.shape
    cap = k_self.shape[4]
    eps = cfg.layer_norm_eps
    embed = dec["embed"]
    h = embed[tokens]

    positions = cur_len[:, None] + jnp.arange(s)[None, :]  # [B, s]
    cos, sin = jax.vmap(lambda p: rotary_tables(p, cfg.rotary_dim, cfg.rope_theta))(positions)

    key_pos = jnp.arange(cap)
    self_mask = key_pos[None, None, None, :] <= positions[:, None, :, None]  # [B,1,s,cap]
    cross_mask = memory_mask[:, None, None, :]
    # [B, s, cap] one-hot of each new token's cache slot; writes past the
    # cap vanish (finished lanes' frozen cursors stay harmless).
    write_oh = (key_pos[None, None, :] == positions[:, :, None])
    written = jnp.any(write_oh, axis=1)[:, None, None, :]  # [B,1,1,cap]

    def scatter_write(buf, val):  # buf [B,H,hd,cap], val [B,s,H,hd]
        scat = jnp.einsum(
            "bshd,bsc->bhdc", val.astype(buf.dtype),
            write_oh.astype(buf.dtype),
        )
        return jnp.where(written, scat, buf)

    int8_cross = k_cross_scale is not None

    def body(carry, xs):
        h = carry
        if int8_cross:
            lp, k_l, v_l, kc_l, vc_l, kc_s, vc_s = xs
        else:
            lp, k_l, v_l, kc_l, vc_l = xs  # k_l [B, H, hd, cap]
        x = layer_norm(lp["ln1"], h, eps)
        a = lp["self_attn"]
        q = _split_heads(dense(a["q"], x), cfg.decoder_heads)
        k_new = _split_heads(dense(a["k"], x), cfg.decoder_kv_heads)
        v_new = _split_heads(dense(a["v"], x), cfg.decoder_kv_heads)
        q = jax.vmap(apply_rotary)(q, cos, sin)
        k_new = jax.vmap(apply_rotary)(k_new, cos, sin)
        k_l = scatter_write(k_l, k_new)
        v_l = scatter_write(v_l, v_new)
        o = _attention_dm(q, k_l.astype(q.dtype), v_l.astype(q.dtype), self_mask)
        h = h + dense(a["o"], o.reshape(b, s, -1))
        x = layer_norm(lp["ln2"], h, eps)
        c = lp["cross_attn"]
        qc = _split_heads(dense(c["q"], x), cfg.decoder_heads)
        if int8_cross:
            # int8 cross caches with in-einsum dequant (ops/int8_kv.py) —
            # the cross-KV stream is the decode-side bandwidth roofline.
            oc = attention_dm_q8(qc, kc_l, kc_s, vc_l, vc_s, cross_mask)
        else:
            oc = _attention_dm(qc, kc_l.astype(qc.dtype), vc_l.astype(qc.dtype), cross_mask)
        h = h + dense(c["o"], oc.reshape(b, s, -1))
        x = layer_norm(lp["ln3"], h, eps)
        up = dense(lp["mlp"]["fc1"], x)
        hh, gate = jnp.split(up, 2, axis=-1)
        h = h + dense(lp["mlp"]["fc2"], ACTIVATIONS[cfg.decoder_hidden_act](gate) * hh)
        return h, (k_l, v_l)

    xs = (dec["layers"], k_self, v_self, k_cross, v_cross)
    if int8_cross:
        xs = xs + (k_cross_scale, v_cross_scale)
    # Full unroll: the layer count is small and static; straight-line
    # code lets XLA fold the per-layer xs slicing / output stacking and
    # alias the cache updates instead of copying the carry every
    # iteration (measured: the draft step cost is dominated by exactly
    # these small ops at B=512).
    h, (k_out, v_out) = jax.lax.scan(
        body, h, xs, unroll=cfg.decoder_layers)
    h = layer_norm(dec["norm"], h, eps)
    logits = jnp.dot(h, embed.T.astype(h.dtype), preferred_element_type=jnp.float32)
    return logits, k_out, v_out


@partial(
    jax.jit,
    static_argnames=("draft_cfg", "verify_cfg", "gamma", "max_tokens",
                     "kv_int8"),
)
def speculative_decode_batched(
    draft_params: dict,
    draft_cfg: MoonshineArchConfig,
    verify_params: dict,
    verify_cfg: MoonshineArchConfig,
    draft_memory: jnp.ndarray,  # [B, Td, Dd]
    draft_mask: jnp.ndarray,  # [B, Td]
    verify_memory: jnp.ndarray,  # [B, Tv, Dv]
    verify_mask: jnp.ndarray,  # [B, Tv]
    gamma: int = 4,
    max_tokens: int = 64,
    token_caps: jnp.ndarray | None = None,  # [B] optional per-lane caps
    kv_int8: bool = False,  # int8 cross caches, fused dequant (ops/int8_kv)
) -> BatchSpecResult:
    """Batched tiny-draft / large-verify greedy speculative decoding."""
    assert draft_cfg.eos_token_id == verify_cfg.eos_token_id
    eos = verify_cfg.eos_token_id
    bos = verify_cfg.decoder_start_token_id
    B = draft_memory.shape[0]
    caps = (
        jnp.full((B,), max_tokens, jnp.int32)
        if token_caps is None
        else jnp.minimum(token_caps.astype(jnp.int32), max_tokens)
    )

    ddec, vdec = draft_params["decoder"], verify_params["decoder"]
    cap = max_tokens + gamma + 2

    dk, dv = mm.compute_cross_kv(ddec, draft_cfg, draft_memory)
    vk, vv = mm.compute_cross_kv(vdec, verify_cfg, verify_memory)
    dk_s = dv_s = vk_s = vv_s = None
    if kv_int8:
        from ..ops.int8_kv import quantize_kv

        dk, dk_s = quantize_kv(dk)
        dv, dv_s = quantize_kv(dv)
        vk, vk_s = quantize_kv(vk)
        vv, vv_s = quantize_kv(vv)
    mkd = lambda c, n: jnp.zeros(
        (c.decoder_layers, B, c.decoder_kv_heads, c.head_dim, n), draft_memory.dtype
    )
    dks, dvs = mkd(draft_cfg, cap), mkd(draft_cfg, cap)
    mkv = lambda c, n: jnp.zeros(
        (c.decoder_layers, B, c.decoder_kv_heads, c.head_dim, n), verify_memory.dtype
    )
    vks, vvs = mkv(verify_cfg, cap), mkv(verify_cfg, cap)

    buf = max_tokens + gamma + 1
    out_idx = jnp.arange(buf)[None, :]

    class Carry(NamedTuple):
        dks: jnp.ndarray
        dvs: jnp.ndarray
        vks: jnp.ndarray
        vvs: jnp.ndarray
        tokens: jnp.ndarray  # [B, buf]
        count: jnp.ndarray  # [B]
        done: jnp.ndarray  # [B]
        accepted: jnp.ndarray  # [B]
        rounds: jnp.ndarray

    def get_last(tokens, count):
        idx = jnp.maximum(count - 1, 0)
        last = jnp.take_along_axis(tokens, idx[:, None], axis=1)[:, 0]
        return jnp.where(count > 0, last, bos)

    def cond(c: Carry):
        return jnp.any(~c.done)

    def body(c: Carry):
        act = ~c.done
        last = get_last(c.tokens, c.count)

        # ---- draft proposes gamma tokens per lane ---------------------
        # Statically unrolled (gamma is small): a fori_loop here pays a
        # full carry copy of the draft caches per proposal step.
        dks, dvs, nxt = c.dks, c.dvs, last
        prop_list = []
        for i in range(gamma):
            lg, dks, dvs = _decoder_apply_vec(
                ddec, draft_cfg, nxt[:, None], c.count + i, dks, dvs, dk, dv,
                draft_mask, dk_s, dv_s,
            )
            nxt = jnp.argmax(lg[:, -1], axis=-1).astype(jnp.int32)
            prop_list.append(nxt)
        proposals = jnp.stack(prop_list, axis=1)  # [B, gamma]
        last_pred = nxt
        # Consume the final proposal so the draft cache covers position
        # count+gamma (needed when all proposals + correction are accepted).
        _, dks, dvs = _decoder_apply_vec(
            ddec, draft_cfg, last_pred[:, None], c.count + gamma, dks, dvs,
            dk, dv, draft_mask, dk_s, dv_s,
        )

        # ---- verifier scores [last, p0..p_{g-1}] per lane in one pass --
        seq = jnp.concatenate([last[:, None], proposals], axis=1)  # [B, g+1]
        lg, vks, vvs = _decoder_apply_vec(
            vdec, verify_cfg, seq, c.count, c.vks, c.vvs, vk, vv, verify_mask,
            vk_s, vv_s,
        )
        preds = jnp.argmax(lg, axis=-1).astype(jnp.int32)  # [B, g+1]
        agree = preds[:, :gamma] == proposals
        n_accept = jnp.argmin(
            jnp.concatenate([agree, jnp.zeros((B, 1), bool)], axis=1).astype(jnp.int32),
            axis=1,
        )
        correction = jnp.take_along_axis(preds, n_accept[:, None], axis=1)[:, 0]

        eos_pos = jnp.argmax(
            jnp.concatenate([proposals == eos, jnp.ones((B, 1), bool)], axis=1).astype(
                jnp.int32
            ),
            axis=1,
        )
        eos_in_accept = eos_pos < n_accept
        n_keep = jnp.where(eos_in_accept, eos_pos, n_accept)
        n_keep = jnp.minimum(n_keep, jnp.maximum(caps - c.count, 0))

        rel = out_idx - c.count[:, None]  # [B, buf]
        corr_is_token = (
            act
            & jnp.logical_not(eos_in_accept)
            & (correction != eos)
            & (c.count + n_keep < caps)
        )
        prop_at = jnp.take_along_axis(
            proposals, jnp.clip(rel, 0, gamma - 1), axis=1
        )  # [B, buf]
        write_prop = act[:, None] & (rel >= 0) & (rel < n_keep[:, None])
        write_corr = (rel == n_keep[:, None]) & corr_is_token[:, None]
        new_tokens = jnp.where(
            write_prop, prop_at, jnp.where(write_corr, correction[:, None], c.tokens)
        )
        n_keep = jnp.where(act, n_keep, 0)
        count = c.count + n_keep + corr_is_token.astype(jnp.int32)
        done = c.done | eos_in_accept | (correction == eos) | (count >= caps)

        return Carry(
            dks=dks,
            dvs=dvs,
            vks=vks,
            vvs=vvs,
            tokens=new_tokens,
            count=count,
            done=done,
            accepted=c.accepted + n_keep,
            rounds=c.rounds + 1,
        )

    init = Carry(
        dks=dks, dvs=dvs, vks=vks, vvs=vvs,
        tokens=jnp.full((B, buf), eos, jnp.int32),
        count=jnp.zeros((B,), jnp.int32),
        done=jnp.zeros((B,), bool),
        accepted=jnp.zeros((B,), jnp.int32),
        rounds=jnp.zeros((), jnp.int32),
    )
    out = jax.lax.while_loop(cond, body, init)
    tokens = jnp.where(out_idx < out.count[:, None], out.tokens, eos)[:, :max_tokens]
    return BatchSpecResult(tokens, out.count, out.accepted, out.rounds)
