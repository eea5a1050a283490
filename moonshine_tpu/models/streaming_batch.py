"""Multi-stream batched streaming — ONE fused device program per update.

The economic argument for a TPU build is one chip serving many live
streams.  The reference multiplexes independent ``Stream``s over one loaded
model with host threads (reference: core/transcriber.h:77-110, one ORT run
per stage per stream); here the whole update for ALL streams is a single
jitted program over state with a leading stream axis:

    frontend (masked variable-length) -> windowed encode -> adapter/cross-KV
    -> speculative verify + rollback + greedy continue (while_loop)

Per-stream control (segment resets, final flags, variable new-sample
counts, token budgets) enters as device arrays, so one compiled program
serves every per-stream phase combination — no program-count explosion,
no per-stream dispatch overhead (~2.5 ms/dispatch through the axon relay
would otherwise bound a 0.5 s update loop at ~4 streams/chip).

Design notes:
- Variable work under static shapes: every stream pays the same padded
  compute; masked rows write zeros into positions that later real frames
  overwrite (write cursors only advance by the valid counts).
- vmap over the single-stream building blocks (frontend math, encoder
  window, decode step) gives batched matmuls [S, ...] that XLA maps onto
  the MXU — the per-token decode step, memory-bound at S=1, becomes a
  batch-S GEMM.
- The greedy continuation is one while_loop over ALL streams with per-lane
  done masks: iterations = max new tokens across the batch, which for
  0.5 s updates is small and similar across lanes.

Reference contracts preserved per stream: moonshine-streaming-model.cpp
433-498 (frontend carry math), 596-740 (stable-frame arithmetic,
left-context window, adapter), 1244-1316 (decode_full verify semantics).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..core.config import StreamingConfig
from ..ops.rotary import apply_rotary, rotary_tables
from .layers import ACTIVATIONS, Params, dense, layer_norm
from .moonshine import _attention, _split_heads
from .streaming import (
    CONV_CARRY,
    ENC_STEP,
    ENC_WIN,
    FEAT_CAP,
    MEM_CAP,
    SAMPLE_CTX,
    StreamingState,
    _causal_conv,
    _sinusoid,
    init_state,
)

# Default static caps for the service program (tunable per deployment).
DRAFT_CAP = 256  # verified draft tokens per update (≈19 s at 13 tok/s)


def cast_params(params: Params, dtype) -> Params:
    """Cast encoder/adapter/decoder params to ``dtype``; frontend stays f32
    (weight-norm per-channel magnitudes span ~17x on Tiny — reference
    README.md quantization section keeps the frontend in float too).
    Exec-quantized trees keep their int8 ``w_q`` (non-floating) AND their
    f32 ``w_scale`` — downcasting the per-channel scales to bf16 would
    change the int8 dequant arithmetic the w8a8 tests validate."""

    def cast(node):
        if isinstance(node, dict):
            return {
                k: v if k == "w_scale" else cast(v) for k, v in node.items()
            }
        if isinstance(node, (list, tuple)):
            return type(node)(cast(v) for v in node)
        if hasattr(node, "dtype") and jnp.issubdtype(node.dtype, jnp.floating):
            return node.astype(dtype)
        return node

    out = dict(params)
    for k in ("encoder", "adapter", "decoder"):
        out[k] = cast(params[k])
    return out


# KV fields live in LAYER-MAJOR, DIM-MAJOR layout [L, S, H, hd, T]:
#   layer-major — lax.scan over decoder layers consumes them directly (a
#                 stream-major layout would transpose the full multi-GB
#                 cache on every while_loop iteration);
#   dim-major   — TPU bf16 arrays are tiled (16 sublanes, 128 lanes) on the
#                 LAST TWO dims.  A cache ending in head_dim=40 pads every
#                 lane row 40 -> 128: 3.2x physical bytes on what is a pure
#                 KV-streaming loop (measured 197 GB/s useful = ~630 GB/s
#                 physical, the HBM ceiling).  With [hd, T] the lane dim is
#                 the 128-aligned time axis and hd only pads 40 -> 48
#                 sublanes: measured 519 GB/s useful on the same attention
#                 step, 2.6x faster.  The layout IS the kernel.
_KV_FIELDS = ("k_cross", "v_cross", "k_self", "v_self")
# Per-key-column scale arrays for the optional int8 KV mode (None when the
# caches are float).  Same layer-major layout with the stream axis at 1:
# [L, S, H, T].
_KV_SCALE_FIELDS = ("k_cross_scale", "v_cross_scale", "k_self_scale", "v_self_scale")


class BatchedStreamingState(NamedTuple):
    """StreamingState with a stream axis (KV caches layer/dim-major)."""

    sample_ctx: jnp.ndarray  # [S, 79]
    conv1_carry: jnp.ndarray  # [S, 4, d_model]
    conv2_carry: jnp.ndarray  # [S, 4, c1]
    frame_count: jnp.ndarray  # [S]
    feats: jnp.ndarray  # [S, FEAT_CAP, c2]
    feat_count: jnp.ndarray  # [S]
    enc_emitted: jnp.ndarray  # [S]
    memory: jnp.ndarray  # [S, MEM_CAP, decoder_dim]
    mem_len: jnp.ndarray  # [S]
    k_cross: jnp.ndarray  # [L, S, H, hd, MEM_CAP]
    v_cross: jnp.ndarray
    k_self: jnp.ndarray  # [L, S, H, hd, max_seq_len]
    v_self: jnp.ndarray
    cache_len: jnp.ndarray  # [S]
    # int8 KV mode (ops/int8_kv.py): caches above hold int8 with these
    # per-key-column scales; attention dequantizes in-einsum — half the
    # HBM bytes on the bandwidth-bound decode phases.
    k_cross_scale: jnp.ndarray | None = None  # [L, S, H, MEM_CAP] f32
    v_cross_scale: jnp.ndarray | None = None
    k_self_scale: jnp.ndarray | None = None  # [L, S, H, max_seq_len] f32
    v_self_scale: jnp.ndarray | None = None


def init_batch_state(
    cfg: StreamingConfig,
    n_streams: int,
    dtype=jnp.float32,
    mem_cap: int = MEM_CAP,
    kv_int8: bool = False,
) -> BatchedStreamingState:
    """dtype applies to features/memory/KV; frontend carries stay f32
    (the learned frontend's per-channel dynamic range is extreme — the
    reference keeps it above int8 for the same reason, README.md
    quantization notes).  ``kv_int8`` stores the four KV caches as int8
    with per-key-column scales (dtype still governs features/memory)."""
    L, H, hd = cfg.depth, cfg.nheads, cfg.head_dim
    kv_dtype = jnp.int8 if kv_int8 else dtype
    zf = lambda *shape: jnp.zeros((n_streams, *shape), jnp.float32)
    z = lambda *shape: jnp.zeros((n_streams, *shape), dtype)
    zkv = lambda t: jnp.zeros((L, n_streams, H, hd, t), kv_dtype)
    zs = lambda t: jnp.zeros((L, n_streams, H, t), jnp.float32) if kv_int8 else None
    zi = lambda: jnp.zeros((n_streams,), jnp.int32)
    return BatchedStreamingState(
        sample_ctx=zf(SAMPLE_CTX),
        conv1_carry=zf(CONV_CARRY, cfg.d_model_frontend),
        conv2_carry=zf(CONV_CARRY, cfg.c1),
        frame_count=zi(),
        feats=z(FEAT_CAP, cfg.c2),
        feat_count=zi(),
        enc_emitted=zi(),
        memory=z(mem_cap, cfg.decoder_dim),
        mem_len=zi(),
        k_cross=zkv(mem_cap),
        v_cross=zkv(mem_cap),
        k_self=zkv(cfg.max_seq_len),
        v_self=zkv(cfg.max_seq_len),
        cache_len=zi(),
        k_cross_scale=zs(mem_cap),
        v_cross_scale=zs(mem_cap),
        k_self_scale=zs(cfg.max_seq_len),
        v_self_scale=zs(cfg.max_seq_len),
    )


def _single(state: BatchedStreamingState, s: int) -> StreamingState:
    """Extract stream ``s`` as a single-stream StreamingState (testing aid:
    converts the KV caches back to the single-stream sequence-major
    [L, T, H, hd] layout; int8 caches are dequantized to f32)."""
    from ..ops.int8_kv import dequantize_kv

    vals = {}
    for name, x in zip(BatchedStreamingState._fields, state):
        if name in _KV_SCALE_FIELDS:
            continue
        x = jnp.asarray(x)
        if name in _KV_FIELDS:
            kv = x[:, s]  # [L, H, hd, T]
            scale = getattr(state, name + "_scale")
            if scale is not None:
                kv = dequantize_kv(kv, jnp.asarray(scale)[:, s])
            vals[name] = kv.transpose(0, 3, 1, 2)
        else:
            vals[name] = x[s]
    return StreamingState(**vals)


# Buffers a reset does NOT need to zero: every read is masked/sliced by
# the cursors the reset does clear (feat_count, enc_emitted, mem_len,
# per-tick cache_len) — cross attention masks keys by mem_len, the
# windowed encode masks by win_valid/feat arithmetic and slices only
# n_new rows, decode self caches rewrite from position 0 each tick, and
# memory/feats append at their cursors before any read.  Zeroing them
# anyway cost ~GBs of cache traffic behind a jnp.where EVERY tick
# (k/v cross alone are ~750 MB each at medium-32 x 3200).
_RESET_SKIP_FIELDS = _KV_FIELDS + _KV_SCALE_FIELDS + ("memory", "feats")


def _mask_reset(state: BatchedStreamingState, reset: jnp.ndarray) -> BatchedStreamingState:
    """Zero the CONTROL state of streams flagged in ``reset`` [S] bool
    (cursors, frontend carries, sample context); the bulk KV/feature
    buffers stay — their stale contents are unreachable once the
    cursors are zero (see _RESET_SKIP_FIELDS)."""

    def f(name, x):
        if x is None or name in _RESET_SKIP_FIELDS:
            return x
        m = reset.reshape((-1,) + (1,) * (x.ndim - 1))
        return jnp.where(m, jnp.zeros_like(x), x)

    return BatchedStreamingState(
        *[f(n, x) for n, x in zip(BatchedStreamingState._fields, state)]
    )


# ---------------------------------------------------------------------------
# Masked frontend: F padded frames per stream, n_valid real
# ---------------------------------------------------------------------------


def _frontend_one(
    params: Params,
    cfg: StreamingConfig,
    chunk: jnp.ndarray,  # [F*80] padded new samples
    n_valid: jnp.ndarray,  # scalar int32 — real frames in chunk
    sample_ctx: jnp.ndarray,
    conv1_carry: jnp.ndarray,
    conv2_carry: jnp.ndarray,
    feats: jnp.ndarray,
    feat_count: jnp.ndarray,
):
    """Per-stream frontend with masked variable frame count.

    Causality makes partial progress safe: frame i's output depends only on
    samples ≤ (i+1)*80, so rows ≥ n_valid are garbage that the advancing
    write cursor overwrites on the next update.  Carries roll forward by
    exactly n_valid frames via dynamic slices at traced offsets.
    """
    F = chunk.shape[0] // cfg.frame_len
    x = jnp.concatenate([sample_ctx, chunk])  # [79 + 80F]
    idx = (
        jnp.arange(F)[:, None] * cfg.frame_len
        + jnp.arange(SAMPLE_CTX + cfg.frame_len)[None, :]
    )
    windows = x[idx]  # [F, 159]
    p = params["frontend"]
    h = ACTIVATIONS["gelu"](dense(p["proj"], windows))  # [F, d]

    h1_in = jnp.concatenate([conv1_carry, h], axis=0)  # [4+F, d]
    h1 = ACTIVATIONS["gelu"](_causal_conv(p["conv1"], h1_in, F))  # [F, c1]
    h2_in = jnp.concatenate([conv2_carry, h1], axis=0)
    h2 = ACTIVATIONS["gelu"](_causal_conv(p["conv2"], h2_in, F))
    out = layer_norm(p["norm"], h2)  # [F, c2]

    new_feats = jax.lax.dynamic_update_slice(feats, out.astype(feats.dtype), (feat_count, 0))
    new_ctx = jax.lax.dynamic_slice(x, (n_valid * cfg.frame_len,), (SAMPLE_CTX,))
    new_c1 = jax.lax.dynamic_slice(h1_in, (n_valid, 0), (CONV_CARRY, h1_in.shape[1]))
    new_c2 = jax.lax.dynamic_slice(h2_in, (n_valid, 0), (CONV_CARRY, h2_in.shape[1]))
    return new_ctx, new_c1, new_c2, new_feats, feat_count + n_valid


# ---------------------------------------------------------------------------
# Encoder window + adapter + incremental cross-KV (per stream, vmapped)
# ---------------------------------------------------------------------------


def _encode_one(
    params: Params,
    cfg: StreamingConfig,
    feats: jnp.ndarray,  # [FEAT_CAP, c2]
    feat_count: jnp.ndarray,
    enc_emitted: jnp.ndarray,
    memory: jnp.ndarray,
    mem_len: jnp.ndarray,
    k_cross: jnp.ndarray,
    v_cross: jnp.ndarray,
    n_new: jnp.ndarray,  # scalar int32, 0 <= n_new <= ENC_STEP
    kc_scale: jnp.ndarray | None = None,  # [L, H, M] — int8 cross-KV scales
    vc_scale: jnp.ndarray | None = None,
):
    """One ENC_STEP window re-encode; append n_new frames to memory.

    Mirror of streaming.encode_step with traced (possibly zero) n_new.
    """
    left = cfg.left_context_frames
    win_start = jnp.maximum(enc_emitted - left, 0)
    win_valid = jnp.minimum(feat_count - win_start, ENC_WIN)

    window = jax.lax.dynamic_slice(feats, (win_start, 0), (ENC_WIN, feats.shape[1]))
    h = dense(params["encoder"]["in_proj"], window)

    positions = jnp.arange(ENC_WIN)
    rot_dim = cfg.head_dim - (cfg.head_dim % 2)
    cos, sin = rotary_tables(positions, rot_dim, cfg.rope_theta)
    mask = (positions < win_valid)[None, None, None, :]

    def layer(carry, lp):
        x = layer_norm(lp["ln1"], carry)
        a = lp["attn"]
        q = _split_heads(dense(a["q"], x)[None], cfg.nheads)[0]
        k = _split_heads(dense(a["k"], x)[None], cfg.nheads)[0]
        v = _split_heads(dense(a["v"], x)[None], cfg.nheads)[0]
        q = apply_rotary(q, cos, sin)
        k = apply_rotary(k, cos, sin)
        o = _attention(q[None], k[None], v[None], mask)[0]
        carry = carry + dense(a["o"], o.reshape(o.shape[0], -1))
        x = layer_norm(lp["ln2"], carry)
        carry = carry + dense(
            lp["mlp"]["fc2"], ACTIVATIONS["gelu"](dense(lp["mlp"]["fc1"], x))
        )
        return carry, None

    h, _ = jax.lax.scan(layer, h, params["encoder"]["layers"])
    h = layer_norm(params["encoder"]["norm"], h)

    rel = enc_emitted - win_start
    new_block = jax.lax.dynamic_slice(h, (rel, 0), (ENC_STEP, h.shape[1]))
    block_idx = jnp.arange(ENC_STEP)
    new_mask = block_idx < n_new

    pos = mem_len + block_idx
    mem_new = dense(params["adapter"]["proj"], new_block)
    mem_new = mem_new + _sinusoid(pos, mem_new.shape[-1]).astype(mem_new.dtype)
    mem_new = layer_norm(params["adapter"]["norm"], mem_new)
    mem_new = jnp.where(new_mask[:, None], mem_new, 0.0)

    memory = jax.lax.dynamic_update_slice(memory, mem_new.astype(memory.dtype), (mem_len, 0))

    def ckv(carry, lp):
        a = lp["cross_attn"]
        # [ENC_STEP, H, hd] -> dim-major [H, hd, ENC_STEP] (the new block is
        # tiny; transposing here keeps the multi-GB cache in its native
        # dim-major layout with no relayout at decode time).
        k = _split_heads(dense(a["k"], mem_new)[None], cfg.nheads)[0].transpose(1, 2, 0)
        v = _split_heads(dense(a["v"], mem_new)[None], cfg.nheads)[0].transpose(1, 2, 0)
        return carry, (k, v)

    _, (k_new, v_new) = jax.lax.scan(ckv, None, params["decoder"]["layers"])
    # k_cross per stream: [L, H, hd, M]; write the new frames at mem_len.
    if kc_scale is not None:
        from ..ops.int8_kv import quantize_kv

        kq, ks = quantize_kv(k_new)
        vq, vs = quantize_kv(v_new)
        k_cross = jax.lax.dynamic_update_slice(k_cross, kq, (0, 0, 0, mem_len))
        v_cross = jax.lax.dynamic_update_slice(v_cross, vq, (0, 0, 0, mem_len))
        kc_scale = jax.lax.dynamic_update_slice(kc_scale, ks, (0, 0, mem_len))
        vc_scale = jax.lax.dynamic_update_slice(vc_scale, vs, (0, 0, mem_len))
    else:
        k_cross = jax.lax.dynamic_update_slice(
            k_cross, k_new.astype(k_cross.dtype), (0, 0, 0, mem_len)
        )
        v_cross = jax.lax.dynamic_update_slice(
            v_cross, v_new.astype(v_cross.dtype), (0, 0, 0, mem_len)
        )
    return memory, mem_len + n_new, k_cross, v_cross, enc_emitted + n_new, kc_scale, vc_scale


# ---------------------------------------------------------------------------
# Batched decoder step (explicit batch axis — shared by verify and continue)
# ---------------------------------------------------------------------------


def _attention_dm(
    q: jnp.ndarray,  # [B, s, H, hd]
    k: jnp.ndarray,  # [B, H, hd, T] — dim-major
    v: jnp.ndarray,  # [B, H, hd, T]
    mask: jnp.ndarray,  # broadcastable to [B, H, s, T]
) -> jnp.ndarray:
    """Attention over dim-major K/V (lane axis = 128-aligned time axis; a
    trailing head_dim lane axis would pad 40 -> 128 and triple the HBM
    traffic of this bandwidth-bound step — see _KV_FIELDS)."""
    from .moonshine import NEG_INF

    scale = q.shape[-1] ** -0.5
    logits = jnp.einsum("bshd,bhdt->bhst", q, k, preferred_element_type=jnp.float32) * scale
    logits = jnp.where(mask, logits, NEG_INF)
    weights = jax.nn.softmax(logits, axis=-1).astype(q.dtype)
    return jnp.einsum("bhst,bhdt->bshd", weights, v, preferred_element_type=q.dtype)


def _decode_step_batch(
    params: Params,
    cfg: StreamingConfig,
    tokens: jnp.ndarray,  # [S, s] int32
    cache_len: jnp.ndarray,  # [S]
    k_self: jnp.ndarray,  # [L, S, H, hd, max_seq] — layer/dim-major
    v_self: jnp.ndarray,
    k_cross: jnp.ndarray,  # [L, S, H, hd, <=M] — layer/dim-major, pre-sliced
    v_cross: jnp.ndarray,
    mem_len: jnp.ndarray,  # [S]
    mem_bucket: int,
    k_self_s: jnp.ndarray | None = None,  # [L, S, H, max_seq] — int8 KV scales
    v_self_s: jnp.ndarray | None = None,
    kc_s: jnp.ndarray | None = None,  # [L, S, H, <=M]
    vc_s: jnp.ndarray | None = None,
):
    """Decoder over s tokens for all S streams.

    Returns (logits, k, v, k_s, v_s) — the scale outputs are None in float
    mode.  Equivalent math to streaming.decode_tokens with a stream axis;
    the KV update uses per-stream write offsets (vmapped
    dynamic_update_slice).

    KV caches are LAYER-MAJOR (lax.scan consumes them without a transpose
    on every while_loop iteration) and DIM-MAJOR (128-aligned lane reads —
    see the note on _KV_FIELDS).  In int8 mode dequantization fuses into
    the attention einsums (ops/int8_kv.py) — half the HBM bytes.
    """
    from ..ops.int8_kv import attention_dm_q8, quantize_kv

    quant = k_self_s is not None
    dec = params["decoder"]
    S, s = tokens.shape
    h = dec["embed"][tokens]  # [S, s, d]
    positions = cache_len[:, None] + jnp.arange(s)[None, :]  # [S, s]
    rot_dim = cfg.head_dim - (cfg.head_dim % 2)
    cos, sin = jax.vmap(lambda p: rotary_tables(p, rot_dim, cfg.rope_theta))(positions)

    key_pos = jnp.arange(cfg.max_seq_len)
    self_mask = key_pos[None, None, None, :] <= positions[:, None, :, None]  # [S,1,s,K]
    mem_pos = jnp.arange(mem_bucket)
    cross_mask = (mem_pos[None, :] < mem_len[:, None])[:, None, None, :]  # [S,1,1,M]
    kc_b = k_cross[..., :mem_bucket] if k_cross.shape[4] > mem_bucket else k_cross
    vc_b = v_cross[..., :mem_bucket] if v_cross.shape[4] > mem_bucket else v_cross
    if quant:
        kc_sb = kc_s[..., :mem_bucket] if kc_s.shape[3] > mem_bucket else kc_s
        vc_sb = vc_s[..., :mem_bucket] if vc_s.shape[3] > mem_bucket else vc_s

    upd = jax.vmap(
        lambda buf, val, off: jax.lax.dynamic_update_slice(
            buf, val.astype(buf.dtype), (0, 0, off)
        )
    )  # buf [H, hd, T], val [H, hd, s]
    upd_s = jax.vmap(
        lambda buf, val, off: jax.lax.dynamic_update_slice(buf, val, (0, off))
    )  # buf [H, T], val [H, s]

    def body(carry, xs):
        h = carry  # [S, s, d]
        if quant:
            lp, k_l, v_l, kc_l, vc_l, ks_l, vs_l, kcs_l, vcs_l = xs
        else:
            lp, k_l, v_l, kc_l, vc_l = xs
            ks_l = vs_l = kcs_l = vcs_l = None
        x = layer_norm(lp["ln1"], h)
        a = lp["self_attn"]
        q = _split_heads(dense(a["q"], x), cfg.nheads)  # [S, s, H, hd]
        k_new = _split_heads(dense(a["k"], x), cfg.nheads)
        v_new = _split_heads(dense(a["v"], x), cfg.nheads)
        q = jax.vmap(apply_rotary)(q, cos, sin)
        k_new = jax.vmap(apply_rotary)(k_new, cos, sin)
        if quant:
            kq, ks = quantize_kv(k_new.transpose(0, 2, 3, 1))
            vq, vs = quantize_kv(v_new.transpose(0, 2, 3, 1))
            k_l = upd(k_l, kq, cache_len)
            v_l = upd(v_l, vq, cache_len)
            ks_l = upd_s(ks_l, ks, cache_len)
            vs_l = upd_s(vs_l, vs, cache_len)
            o = attention_dm_q8(q, k_l, ks_l, v_l, vs_l, self_mask)
        else:
            k_l = upd(k_l, k_new.transpose(0, 2, 3, 1), cache_len)
            v_l = upd(v_l, v_new.transpose(0, 2, 3, 1), cache_len)
            o = _attention_dm(q, k_l.astype(q.dtype), v_l.astype(q.dtype), self_mask)
        h = h + dense(a["o"], o.reshape(S, s, -1))
        x = layer_norm(lp["ln2"], h)
        c = lp["cross_attn"]
        qc = _split_heads(dense(c["q"], x), cfg.nheads)
        if quant:
            oc = attention_dm_q8(qc, kc_l, kcs_l, vc_l, vcs_l, cross_mask)
        else:
            oc = _attention_dm(qc, kc_l.astype(qc.dtype), vc_l.astype(qc.dtype), cross_mask)
        h = h + dense(c["o"], oc.reshape(S, s, -1))
        x = layer_norm(lp["ln3"], h)
        up = dense(lp["mlp"]["fc1"], x)
        hh, gate = jnp.split(up, 2, axis=-1)
        h = h + dense(lp["mlp"]["fc2"], ACTIVATIONS["silu"](gate) * hh)
        if quant:
            return h, (k_l, v_l, ks_l, vs_l)
        return h, (k_l, v_l)

    if quant:
        xs = (dec["layers"], k_self, v_self, kc_b, vc_b, k_self_s, v_self_s, kc_sb, vc_sb)
        h, (k_out, v_out, ks_out, vs_out) = jax.lax.scan(body, h, xs)
    else:
        h, (k_out, v_out) = jax.lax.scan(
            body, h, (dec["layers"], k_self, v_self, kc_b, vc_b)
        )
        ks_out = vs_out = None
    h = layer_norm(dec["norm"], h)
    logits = jnp.dot(h, dec["embed"].T.astype(h.dtype), preferred_element_type=jnp.float32)
    return logits, k_out, v_out, ks_out, vs_out


# ---------------------------------------------------------------------------
# The fused service update
# ---------------------------------------------------------------------------


class ServiceUpdateOut(NamedTuple):
    tokens: jnp.ndarray  # [S, max_seq_len] int32, EOS-padded hypotheses
    counts: jnp.ndarray  # [S] int32
    state: BatchedStreamingState
    # tokens||count packed [S, max_seq_len+1]: fetch THIS with one host
    # transfer instead of two (the relay charges per transfer round trip).
    packed: jnp.ndarray | None = None


def _with_packed(out: "ServiceUpdateOut") -> "ServiceUpdateOut":
    return out._replace(
        packed=jnp.concatenate([out.tokens, out.counts[:, None]], axis=1)
    )


@partial(
    jax.jit,
    static_argnames=("cfg", "mem_bucket", "draft_cap", "enc_passes", "decode"),
    # The caller always replaces its state with the returned one; donating
    # lets XLA update the multi-hundred-MB KV caches in place instead of
    # copying them every update.
    donate_argnames=("state",),
)
def service_update(
    params: Params,
    cfg: StreamingConfig,
    state: BatchedStreamingState,
    chunk: jnp.ndarray,  # [S, F*frame_len] padded new segment samples
    n_frames: jnp.ndarray,  # [S] int32 — valid new frames per stream
    reset: jnp.ndarray,  # [S] bool — reset state before ingesting (new segment)
    is_final: jnp.ndarray,  # [S] bool — segment ended; release lookahead
    draft: jnp.ndarray,  # [S, draft_cap] int32 EOS-padded previous hypotheses
    draft_len: jnp.ndarray,  # [S] int32
    budget: jnp.ndarray,  # [S] int32 token caps
    decode_mask: jnp.ndarray,  # [S] bool — streams that need a decode this update
    mem_bucket: int = 2048,
    draft_cap: int = DRAFT_CAP,
    enc_passes: int = 2,
    decode: bool = True,
) -> ServiceUpdateOut:
    """ONE device program: reset + frontend + encode + decode for S streams.

    Masked streams still pay padded compute; their outputs are ignored and
    their state advances by zero (all cursors move by masked amounts).
    """
    return _with_packed(_service_update_impl(
        params, cfg, state, chunk, n_frames, reset, is_final, draft,
        draft_len, budget, decode_mask, mem_bucket, draft_cap, enc_passes,
        decode,
    ))


@partial(
    jax.jit,
    static_argnames=("cfg", "mem_bucket", "draft_cap", "enc_passes",
                     "decode", "decode_mem_bucket"),
    donate_argnames=("state",),
)
def service_update_meta(
    params: Params,
    cfg: StreamingConfig,
    state: BatchedStreamingState,
    chunk: jnp.ndarray,  # [S, F*frame_len]
    meta: jnp.ndarray,  # [6, S] int32 control plane, see below
    draft: jnp.ndarray,  # [S, draft_cap]
    mem_bucket: int = 2048,
    draft_cap: int = DRAFT_CAP,
    enc_passes: int = 2,
    decode: bool = True,
    decode_mem_bucket: int | None = None,
) -> ServiceUpdateOut:
    """:func:`service_update` with a one-array control plane.

    ``meta`` rows are (n_frames, reset, is_final, draft_len, budget,
    decode_mask) as int32 — ONE host→device transfer per tick instead of
    six (the axon relay charges a fixed cost per transfer; input puts
    were ~25 ms of a 160 ms medium-32 tick, docs/PERF.md).  The serving
    layer fetches ``out.packed`` with one device→host transfer likewise.
    """
    return _with_packed(_service_update_impl(
        params, cfg, state, chunk,
        meta[0], meta[1] != 0, meta[2] != 0, draft,
        meta[3], meta[4], meta[5] != 0,
        mem_bucket, draft_cap, enc_passes, decode,
        decode_mem_bucket,
    ))


def _service_update_impl(
    params: Params,
    cfg: StreamingConfig,
    state: BatchedStreamingState,
    chunk: jnp.ndarray,
    n_frames: jnp.ndarray,
    reset: jnp.ndarray,
    is_final: jnp.ndarray,
    draft: jnp.ndarray,
    draft_len: jnp.ndarray,
    budget: jnp.ndarray,
    decode_mask: jnp.ndarray,
    mem_bucket: int,
    draft_cap: int,
    enc_passes: int,
    decode: bool,
    decode_mem_bucket: int | None = None,
) -> ServiceUpdateOut:
    # Memory-length bucketing for the DECODE phases (verify + greedy
    # continue): their cross-attention streams the whole sliced cache
    # every token, so reading only the smallest 128-multiple bucket
    # covering this tick's longest memory — instead of always the full
    # mem_bucket — scales the dominant per-token HBM traffic with the
    # ACTUAL segment fill.  Encode/state layout is untouched; callers
    # must guarantee max(mem_len) + this tick's new frames <=
    # decode_mem_bucket (serving picks from its host mirror).
    dmb = mem_bucket if decode_mem_bucket is None else min(
        decode_mem_bucket, mem_bucket)
    state = _mask_reset(state, reset)

    # Frontend (vmapped masked variable-length ingest).
    ctx, c1, c2, feats, feat_count = jax.vmap(
        lambda ch, nv, sc, cc1, cc2, f, fc: _frontend_one(
            params, cfg, ch, nv, sc, cc1, cc2, f, fc
        )
    )(
        chunk, n_frames, state.sample_ctx, state.conv1_carry, state.conv2_carry,
        state.feats, state.feat_count,
    )
    state = state._replace(
        sample_ctx=ctx, conv1_carry=c1, conv2_carry=c2,
        feats=feats, feat_count=feat_count,
        frame_count=state.frame_count + n_frames,
    )

    # Stable-frame arithmetic on device (reference: cpp:596-615).
    quant = state.k_self_scale is not None
    lookahead = jnp.where(is_final, 0, cfg.total_lookahead)
    for _ in range(enc_passes):
        stable = jnp.maximum(state.feat_count - lookahead, 0)
        n_new = jnp.clip(stable - state.enc_emitted, 0, ENC_STEP)
        memory, mem_len, k_cross, v_cross, enc_emitted, kc_scale, vc_scale = jax.vmap(
            lambda f, fc, ee, m, ml, kc, vc, nn, kcs, vcs: _encode_one(
                params, cfg, f, fc, ee, m, ml, kc, vc, nn, kcs, vcs
            ),
            # KV caches carry the stream axis at position 1 (layer-major).
            # (Axis specs on the None scale pytrees are vacuous in float mode.)
            in_axes=(0, 0, 0, 0, 0, 1, 1, 0, 1, 1),
            out_axes=(0, 0, 1, 1, 0, 1, 1),
        )(
            state.feats, state.feat_count, state.enc_emitted, state.memory,
            state.mem_len, state.k_cross, state.v_cross, n_new,
            state.k_cross_scale, state.v_cross_scale,
        )
        state = state._replace(
            memory=memory, mem_len=mem_len, k_cross=k_cross, v_cross=v_cross,
            enc_emitted=enc_emitted,
            k_cross_scale=kc_scale, v_cross_scale=vc_scale,
        )

    if not decode:
        S = chunk.shape[0]
        return ServiceUpdateOut(
            tokens=jnp.full((S, cfg.max_seq_len), cfg.eos_id, jnp.int32),
            counts=jnp.zeros((S,), jnp.int32),
            state=state,
        )

    # ---- speculative verify (decoder reset: clear self cache) -----------
    # Caches are already layer/head-major: no relayout here or inside the
    # greedy while_loop.
    S = chunk.shape[0]
    kc_lm = state.k_cross[..., :dmb]
    vc_lm = state.v_cross[..., :dmb]
    kc_slm = state.k_cross_scale[..., :dmb] if quant else None
    vc_slm = state.v_cross_scale[..., :dmb] if quant else None
    zero_len = jnp.zeros((S,), jnp.int32)
    seq = jnp.concatenate(
        [jnp.full((S, 1), cfg.bos_id, jnp.int32), draft[:, :draft_cap]], axis=1
    )  # [S, 1 + draft_cap]
    logits, k_self, v_self, k_self_s, v_self_s = _decode_step_batch(
        params, cfg, seq, zero_len, state.k_self, state.v_self,
        kc_lm, vc_lm, state.mem_len, dmb,
        state.k_self_scale, state.v_self_scale, kc_slm, vc_slm,
    )
    preds = jnp.argmax(logits, axis=-1).astype(jnp.int32)  # [S, 1 + draft_cap]

    idx = jnp.arange(draft_cap)[None, :]
    eff_budget = jnp.where(decode_mask, budget, 0)
    valid = idx < jnp.minimum(draft_len, eff_budget)[:, None]
    agree = (preds[:, :draft_cap] == draft) & valid & (draft != cfg.eos_id)
    n_accept = jnp.argmin(
        jnp.concatenate([agree, jnp.zeros((S, 1), bool)], axis=1).astype(jnp.int32),
        axis=1,
    )  # [S]
    correction = jnp.take_along_axis(preds, n_accept[:, None], axis=1)[:, 0]

    max_seq = cfg.max_seq_len
    out_idx = jnp.arange(max_seq)[None, :]
    draft_pad = jnp.concatenate(
        [draft, jnp.full((S, max_seq - draft_cap), cfg.eos_id, jnp.int32)], axis=1
    )
    tokens0 = jnp.where(out_idx < n_accept[:, None], draft_pad, cfg.eos_id)
    corr_is_token = (correction != cfg.eos_id) & (n_accept < eff_budget) & decode_mask
    tokens0 = jnp.where(
        (out_idx == n_accept[:, None]) & corr_is_token[:, None], correction[:, None], tokens0
    )
    count0 = n_accept + corr_is_token.astype(jnp.int32)
    cache_len0 = 1 + n_accept  # [bos, accepted...]
    done0 = ~corr_is_token | (count0 >= eff_budget)

    # ---- greedy continuation: one while_loop over all streams -----------
    class Carry(NamedTuple):
        k_self: jnp.ndarray
        v_self: jnp.ndarray
        k_self_s: jnp.ndarray | None
        v_self_s: jnp.ndarray | None
        cache_len: jnp.ndarray
        tokens: jnp.ndarray
        last: jnp.ndarray
        count: jnp.ndarray
        done: jnp.ndarray

    def cond(c: Carry):
        return jnp.any(~c.done)

    def body(c: Carry):
        lg, k_s, v_s, k_ss, v_ss = _decode_step_batch(
            params, cfg, c.last[:, None], c.cache_len, c.k_self, c.v_self,
            kc_lm, vc_lm, state.mem_len, dmb,
            c.k_self_s, c.v_self_s, kc_slm, vc_slm,
        )
        nxt = jnp.argmax(lg[:, -1], axis=-1).astype(jnp.int32)
        act = ~c.done
        is_eos = nxt == cfg.eos_id
        cache_full = c.cache_len + 1 >= max_seq - 1
        write = act & ~is_eos
        tokens = jnp.where(
            (out_idx == c.count[:, None]) & write[:, None], nxt[:, None], c.tokens
        )
        count = c.count + write.astype(jnp.int32)
        done = c.done | is_eos | cache_full | (count >= eff_budget)
        # Frozen lanes keep their cursors; their KV write landed at the
        # stale cache_len row (>= cursor, i.e. the invalid region) and is
        # voided by not advancing — no need to where-copy the caches back,
        # which would re-materialize the full self-KV every iteration.
        return Carry(
            k_self=k_s,
            v_self=v_s,
            k_self_s=k_ss,
            v_self_s=v_ss,
            cache_len=jnp.where(act, c.cache_len + 1, c.cache_len),
            tokens=tokens,
            last=jnp.where(act, nxt, c.last),
            count=count,
            done=done,
        )

    init = Carry(
        k_self, v_self, k_self_s, v_self_s, cache_len0, tokens0, correction, count0, done0
    )
    out = jax.lax.while_loop(cond, body, init)

    new_state = state._replace(
        k_self=out.k_self, v_self=out.v_self, cache_len=out.cache_len,
        k_self_scale=out.k_self_s, v_self_scale=out.v_self_s,
    )
    return ServiceUpdateOut(tokens=out.tokens, counts=out.count, state=new_state)
