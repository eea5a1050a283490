"""Streaming Moonshine family — TPU-native incremental encoder/decoder.

Capability mirror of the reference ``MoonshineStreamingModel`` (reference:
core/moonshine-streaming-model.{h,cpp}), re-designed for XLA rather than
translated: the reference splits the model into five ONNX sessions because
ONNX graphs cannot hold state; here each stage is a pure function over an
explicit ``StreamingState`` pytree of fixed-capacity device arrays, so the
whole update path is jittable with static shapes and state lives in HBM
between calls.

Algorithmic contracts kept exactly (these define the model family):
- frontend: strictly causal with O(1) carry — 79-sample context +
  two 4-frame conv carries, one feature per ``frame_len`` (80) samples
  (reference: moonshine-streaming-model.h:37-41, cpp:433-498);
- encoder: sliding-window re-encode with fixed per-layer left context
  ``16*depth`` frames, withholding ``total_lookahead`` (16) frames until
  ``is_final`` (reference: cpp:596-615).  RoPE makes window re-encodes
  position-consistent without an offset input;
- adapter: projects new encoded frames with *absolute* position offset and
  appends 1:1 to ``memory`` (reference: cpp:706-740);
- cross-KV: precomputed from memory for the decoder (reference:
  cpp:744-806) — but computed *incrementally* here: appending memory
  frames appends their K/V instead of recomputing the whole buffer
  (the K/V of a frame depends only on that frame);
- decoder: rotary causal self-attention with a ``max_seq_len`` (448)
  KV cache, rope-free cross-attention over memory, SwiGLU MLP;
  ``decoder_reset`` keeps cross-KV and clears self-KV (reference:
  cpp decoder_reset);
- speculative self-verify: the previous hypothesis is verified in ONE
  batched decoder pass and decoding continues from the first divergence
  with the cache rolled back by index, not reallocation (reference:
  cpp:1244-1316).

Capacities are static: ``FEAT_CAP`` and ``MEM_CAP`` cover the VAD's 15 s
force-split bound at 200 frames/s with margin (reference:
voice-activity-detector.cpp:159-170 keeps segments finite).
"""

from __future__ import annotations

from functools import partial
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp

from ..core.config import StreamingConfig
from ..ops.rotary import apply_rotary, rotary_tables
from .layers import (
    ACTIVATIONS,
    Params,
    dense,
    dense_init,
    layer_norm,
    norm_init,
)
from .moonshine import NEG_INF, _attention, _split_heads

SAMPLE_CTX = 79  # frontend sample carry (reference: h:37 sample_buffer[79])
CONV_CARRY = 4  # frames of carry per causal conv (reference: h:39-40)
CONV_K = CONV_CARRY + 1  # causal conv kernel size
ENC_STEP = 128  # new frames encoded per device call
ENC_WIN = 256  # padded encoder window (left ctx 96 + step 128 + lookahead 16)
# Max usable frames per segment: the VAD force-split bounds segments to
# ~15 s (up to ~20 s at low thresholds) = 4000 frames at 200 fps.
SEG_CAP = 4096
# Buffer slack so windowed dynamic_slice reads never clamp near the cap.
FEAT_CAP = SEG_CAP + ENC_WIN
MEM_CAP = SEG_CAP + ENC_STEP


# =========================================================================
# Parameters
# =========================================================================

def init_params(cfg: StreamingConfig, rng: jax.Array) -> Params:
    r = jax.random.split(rng, 10)
    d = cfg.d_model_frontend

    def conv_carry_init(key, cin, cout):
        scale = (1.0 / (cin * CONV_K)) ** 0.5
        return {
            "w": jax.random.uniform(key, (CONV_K, cin, cout), jnp.float32, -scale, scale),
            "b": jnp.zeros((cout,), jnp.float32),
        }

    frontend = {
        # 159-sample projection window: 79 carry + 80 new samples per frame.
        "proj": dense_init(r[0], SAMPLE_CTX + cfg.frame_len, d),
        "conv1": conv_carry_init(r[1], d, cfg.c1),
        "conv2": conv_carry_init(r[2], cfg.c1, cfg.c2),
        "norm": norm_init(cfg.c2),
    }

    def enc_layer(key):
        k = jax.random.split(key, 3)
        dim = cfg.encoder_dim
        hidden = dim * 4
        return {
            "ln1": norm_init(dim),
            "attn": {
                "q": dense_init(k[0], dim, cfg.nheads * cfg.head_dim, bias=False),
                "k": dense_init(k[0], dim, cfg.nheads * cfg.head_dim, bias=False),
                "v": dense_init(k[0], dim, cfg.nheads * cfg.head_dim, bias=False),
                "o": dense_init(k[0], cfg.nheads * cfg.head_dim, dim, bias=False),
            },
            "ln2": norm_init(dim),
            "mlp": {
                "fc1": dense_init(k[1], dim, hidden),
                "fc2": dense_init(k[2], hidden, dim),
            },
        }

    def dec_layer(key):
        k = jax.random.split(key, 4)
        dim = cfg.decoder_dim
        hidden = dim * 4
        return {
            "ln1": norm_init(dim),
            "self_attn": {
                "q": dense_init(k[0], dim, cfg.nheads * cfg.head_dim, bias=False),
                "k": dense_init(k[0], dim, cfg.nheads * cfg.head_dim, bias=False),
                "v": dense_init(k[0], dim, cfg.nheads * cfg.head_dim, bias=False),
                "o": dense_init(k[0], cfg.nheads * cfg.head_dim, dim, bias=False),
            },
            "ln2": norm_init(dim),
            "cross_attn": {
                "q": dense_init(k[1], dim, cfg.nheads * cfg.head_dim, bias=False),
                "k": dense_init(k[1], dim, cfg.nheads * cfg.head_dim, bias=False),
                "v": dense_init(k[1], dim, cfg.nheads * cfg.head_dim, bias=False),
                "o": dense_init(k[1], cfg.nheads * cfg.head_dim, dim, bias=False),
            },
            "ln3": norm_init(dim),
            "mlp": {
                "fc1": dense_init(k[2], dim, hidden * 2),
                "fc2": dense_init(k[3], hidden, dim),
            },
        }

    stack = lambda keys, f: jax.tree.map(
        lambda *xs: jnp.stack(xs), *[f(k) for k in keys]
    )
    encoder = {
        "in_proj": dense_init(r[3], cfg.c2, cfg.encoder_dim),
        "layers": stack(jax.random.split(r[4], cfg.enc_depth), enc_layer),
        "norm": norm_init(cfg.encoder_dim),
    }
    adapter = {
        "proj": dense_init(r[5], cfg.encoder_dim, cfg.decoder_dim),
        "norm": norm_init(cfg.decoder_dim),
    }
    decoder = {
        "embed": jax.random.normal(r[6], (cfg.vocab_size, cfg.decoder_dim)) * 0.02,
        "layers": stack(jax.random.split(r[7], cfg.depth), dec_layer),
        "norm": norm_init(cfg.decoder_dim),
    }
    return {"frontend": frontend, "encoder": encoder, "adapter": adapter, "decoder": decoder}


# =========================================================================
# State
# =========================================================================

class StreamingState(NamedTuple):
    """Device-resident incremental state (one stream).

    Counterpart of ``MoonshineStreamingState`` (reference:
    moonshine-streaming-model.h:35-70) with fixed capacities.
    """

    # frontend
    sample_ctx: jnp.ndarray  # [79]
    conv1_carry: jnp.ndarray  # [4, d_model]
    conv2_carry: jnp.ndarray  # [4, c1]
    frame_count: jnp.ndarray  # scalar int32
    # features
    feats: jnp.ndarray  # [FEAT_CAP, c2]
    feat_count: jnp.ndarray  # scalar int32
    enc_emitted: jnp.ndarray  # scalar int32
    # memory + cross-KV
    memory: jnp.ndarray  # [MEM_CAP, decoder_dim]
    mem_len: jnp.ndarray  # scalar int32
    k_cross: jnp.ndarray  # [L, MEM_CAP, H, hd] (sequence-major: attention
    v_cross: jnp.ndarray  #   reads the cache without a materialized transpose)
    # decoder self-KV
    k_self: jnp.ndarray  # [L, max_seq_len, H, hd]
    v_self: jnp.ndarray  # [L, max_seq_len, H, hd]
    cache_len: jnp.ndarray  # scalar int32


def init_state(cfg: StreamingConfig, dtype=jnp.float32) -> StreamingState:
    L, H, hd = cfg.depth, cfg.nheads, cfg.head_dim
    z = jnp.zeros
    return StreamingState(
        sample_ctx=z((SAMPLE_CTX,), dtype),
        conv1_carry=z((CONV_CARRY, cfg.d_model_frontend), dtype),
        conv2_carry=z((CONV_CARRY, cfg.c1), dtype),
        frame_count=z((), jnp.int32),
        feats=z((FEAT_CAP, cfg.c2), dtype),
        feat_count=z((), jnp.int32),
        enc_emitted=z((), jnp.int32),
        memory=z((MEM_CAP, cfg.decoder_dim), dtype),
        mem_len=z((), jnp.int32),
        k_cross=z((L, MEM_CAP, H, hd), dtype),
        v_cross=z((L, MEM_CAP, H, hd), dtype),
        k_self=z((L, cfg.max_seq_len, H, hd), dtype),
        v_self=z((L, cfg.max_seq_len, H, hd), dtype),
        cache_len=z((), jnp.int32),
    )


def decoder_reset(state: StreamingState) -> StreamingState:
    """Keep cross-KV, clear self-KV (reference: cpp decoder_reset)."""
    return state._replace(cache_len=jnp.zeros((), jnp.int32))


# =========================================================================
# Frontend (one jitted call per whole-frame chunk)
# =========================================================================

@partial(jax.jit, static_argnames=("cfg",))
def frontend_step(
    params: Params, cfg: StreamingConfig, chunk: jnp.ndarray, state: StreamingState
) -> StreamingState:
    """Process ``n_frames*frame_len`` new samples into features.

    chunk: [n_frames * 80] float32 (host buffers sub-frame remainders).
    Appends ``n_frames`` feature rows to the state's feats buffer.
    """
    p = params["frontend"]
    n = chunk.shape[0] // cfg.frame_len
    x = jnp.concatenate([state.sample_ctx, chunk])  # [79 + 80n]
    # Overlapping 159-sample windows at stride 80 == conv1d as matmul.
    idx = jnp.arange(n)[:, None] * cfg.frame_len + jnp.arange(SAMPLE_CTX + cfg.frame_len)[None, :]
    windows = x[idx]  # [n, 159]
    h = ACTIVATIONS["gelu"](dense(p["proj"], windows))  # [n, d_model]

    # Causal conv 1: kernel 5 over frames with 4-frame carry.
    h1_in = jnp.concatenate([state.conv1_carry, h], axis=0)  # [4+n, d]
    h1 = _causal_conv(p["conv1"], h1_in, n)  # [n, c1]
    h1 = ACTIVATIONS["gelu"](h1)
    # Causal conv 2.
    h2_in = jnp.concatenate([state.conv2_carry, h1], axis=0)
    h2 = _causal_conv(p["conv2"], h2_in, n)  # [n, c2]
    h2 = ACTIVATIONS["gelu"](h2)
    feats = layer_norm(p["norm"], h2)

    new_feats = jax.lax.dynamic_update_slice(
        state.feats, feats.astype(state.feats.dtype), (state.feat_count, 0)
    )
    return state._replace(
        sample_ctx=x[-SAMPLE_CTX:],
        conv1_carry=h1_in[-CONV_CARRY:],  # last 4 projection frames
        conv2_carry=h2_in[-CONV_CARRY:],  # last 4 conv1-output frames
        frame_count=state.frame_count + n,
        feats=new_feats,
        feat_count=state.feat_count + n,
    )


def _causal_conv(p: Params, x_with_carry: jnp.ndarray, n: int) -> jnp.ndarray:
    """Valid conv over [carry+n, cin] -> [n, cout] (kernel CONV_K)."""
    y = jax.lax.conv_general_dilated(
        x_with_carry[None],
        p["w"].astype(x_with_carry.dtype),
        window_strides=(1,),
        padding="VALID",
        dimension_numbers=("NWC", "WIO", "NWC"),
    )[0]
    return y + p["b"].astype(y.dtype)


# =========================================================================
# Encoder + adapter (one jitted call per <=ENC_STEP new frames)
# =========================================================================

def _encoder_layer(cfg: StreamingConfig, h, lp, cos, sin, mask):
    x = layer_norm(lp["ln1"], h)
    a = lp["attn"]
    q = _split_heads(dense(a["q"], x)[None], cfg.nheads)[0]  # [W, H, hd]
    k = _split_heads(dense(a["k"], x)[None], cfg.nheads)[0]
    v = _split_heads(dense(a["v"], x)[None], cfg.nheads)[0]
    q = apply_rotary(q, cos, sin)
    k = apply_rotary(k, cos, sin)
    o = _attention(q[None], k[None], v[None], mask)[0]
    h = h + dense(a["o"], o.reshape(o.shape[0], -1))
    x = layer_norm(lp["ln2"], h)
    h = h + dense(lp["mlp"]["fc2"], ACTIVATIONS["gelu"](dense(lp["mlp"]["fc1"], x)))
    return h


@partial(jax.jit, static_argnames=("cfg",))
def encode_step(
    params: Params, cfg: StreamingConfig, state: StreamingState, n_new: jnp.ndarray
) -> StreamingState:
    """Re-encode the sliding window and append ``n_new`` frames to memory.

    n_new: scalar int32, number of new stable frames to emit
    (caller guarantees 0 < n_new <= ENC_STEP).  The window is
    [enc_emitted - left_ctx, enc_emitted + n_new + lookahead) clamped and
    padded to ENC_WIN with masking.
    """
    left = cfg.left_context_frames
    win_start = jnp.maximum(state.enc_emitted - left, 0)
    # Frames available to attend: everything accumulated so far.
    win_valid = jnp.minimum(state.feat_count - win_start, ENC_WIN)

    feats = jax.lax.dynamic_slice(
        state.feats, (win_start, 0), (ENC_WIN, state.feats.shape[1])
    )
    h = dense(params["encoder"]["in_proj"], feats)  # [ENC_WIN, enc_dim]

    positions = jnp.arange(ENC_WIN)
    cos, sin = rotary_tables(positions, cfg.head_dim - (cfg.head_dim % 2), cfg.rope_theta)
    valid = positions < win_valid
    mask = valid[None, None, None, :]  # [1,1,1,W] key mask

    def body(carry, lp):
        return _encoder_layer(cfg, carry, lp, cos, sin, mask), None

    h, _ = jax.lax.scan(body, h, params["encoder"]["layers"])
    h = layer_norm(params["encoder"]["norm"], h)

    # Slice out the newly-stable frames: window-relative index of enc_emitted.
    rel = state.enc_emitted - win_start
    new_block = jax.lax.dynamic_slice(h, (rel, 0), (ENC_STEP, h.shape[1]))
    block_idx = jnp.arange(ENC_STEP)
    new_mask = block_idx < n_new

    # Adapter: absolute sinusoidal position + projection
    # (reference: adapter.ort consumes pos_offset, cpp:706-712).
    pos = state.mem_len + block_idx
    mem_new = dense(params["adapter"]["proj"], new_block)
    mem_new = mem_new + _sinusoid(pos, mem_new.shape[-1]).astype(mem_new.dtype)
    mem_new = layer_norm(params["adapter"]["norm"], mem_new)
    mem_new = jnp.where(new_mask[:, None], mem_new, 0.0)

    memory = jax.lax.dynamic_update_slice(
        state.memory, mem_new.astype(state.memory.dtype), (state.mem_len, 0)
    )

    # Incremental cross-KV for the new memory rows.
    def ckv(carry, lp):
        a = lp["cross_attn"]
        k = _split_heads(dense(a["k"], mem_new)[None], cfg.nheads)[0]  # [T, H, hd]
        v = _split_heads(dense(a["v"], mem_new)[None], cfg.nheads)[0]
        return carry, (k, v)

    _, (k_new, v_new) = jax.lax.scan(ckv, None, params["decoder"]["layers"])
    k_cross = jax.lax.dynamic_update_slice(
        state.k_cross, k_new.astype(state.k_cross.dtype), (0, state.mem_len, 0, 0)
    )
    v_cross = jax.lax.dynamic_update_slice(
        state.v_cross, v_new.astype(state.v_cross.dtype), (0, state.mem_len, 0, 0)
    )

    return state._replace(
        enc_emitted=state.enc_emitted + n_new,
        memory=memory,
        mem_len=state.mem_len + n_new,
        k_cross=k_cross,
        v_cross=v_cross,
    )


def _sinusoid(pos: jnp.ndarray, dim: int) -> jnp.ndarray:
    half = dim // 2
    freqs = jnp.exp(-jnp.log(10000.0) * jnp.arange(half) / half)
    angles = pos.astype(jnp.float32)[:, None] * freqs[None, :]
    return jnp.concatenate([jnp.sin(angles), jnp.cos(angles)], axis=-1)


def encode(params: Params, cfg: StreamingConfig, state: StreamingState, is_final: bool) -> tuple[StreamingState, int]:
    """Emit all newly-stable frames (host-side loop over encode_step calls).

    Mirrors the reference's stable-count arithmetic (reference:
    cpp:596-615): stable = total - lookahead unless is_final.
    Returns (state, frames_emitted).
    """
    total = int(state.feat_count)
    stable = total if is_final else max(0, total - cfg.total_lookahead)
    new = stable - int(state.enc_emitted)
    if new <= 0:
        return state, 0
    emitted = 0
    while emitted < new:
        step = min(new - emitted, ENC_STEP)
        state = encode_step(params, cfg, state, jnp.asarray(step, jnp.int32))
        emitted += step
    return state, new


# =========================================================================
# Decoder
# =========================================================================

MEM_BUCKETS = (512, 1024, 2048, MEM_CAP)


def mem_bucket_for(mem_len: int) -> int:
    """Smallest static memory bucket covering ``mem_len`` frames.

    Cross-attention cost in the decode path is O(tokens x bucket); without
    this, every verify pass paid for the full MEM_CAP (4224) keys even on
    a 2 s segment — the dominant streaming-compute term.
    """
    for b in MEM_BUCKETS:
        if mem_len <= b:
            return b
    return MEM_CAP


@partial(jax.jit, static_argnames=("cfg", "collect_attention", "mem_bucket"))
def decode_tokens(
    params: Params,
    cfg: StreamingConfig,
    tokens: jnp.ndarray,  # [s] int32
    state: StreamingState,
    collect_attention: bool = False,
    mem_bucket: int = MEM_CAP,
) -> tuple[jnp.ndarray, StreamingState, jnp.ndarray | None]:
    """Run the decoder over ``s`` tokens from the current cache position.

    Covers the reference's decode_step (s=1) and decode_tokens (batched
    verify) (reference: moonshine-streaming-model.h:145-160).  Returns
    (logits [s, vocab], state, cross_attention [L, H, s, MEM_CAP] or None).
    """
    dec = params["decoder"]
    s = tokens.shape[0]
    h = dec["embed"][tokens]  # [s, d]
    positions = state.cache_len + jnp.arange(s)
    rot_dim = cfg.head_dim - (cfg.head_dim % 2)
    cos, sin = rotary_tables(positions, rot_dim, cfg.rope_theta)

    key_pos = jnp.arange(cfg.max_seq_len)
    self_mask = key_pos[None, None, None, :] <= positions[None, None, :, None]
    mem_pos = jnp.arange(mem_bucket)
    cross_mask = (mem_pos < state.mem_len)[None, None, None, :]
    # Static slice of the cross cache down to the active bucket.
    k_cross_b = state.k_cross[:, :mem_bucket]
    v_cross_b = state.v_cross[:, :mem_bucket]

    def body(carry, xs):
        h = carry
        lp, k_l, v_l, kc_l, vc_l = xs
        # Self-attention
        x = layer_norm(lp["ln1"], h)
        a = lp["self_attn"]
        q = _split_heads(dense(a["q"], x)[None], cfg.nheads)[0]
        k_new = _split_heads(dense(a["k"], x)[None], cfg.nheads)[0]
        v_new = _split_heads(dense(a["v"], x)[None], cfg.nheads)[0]
        q = apply_rotary(q, cos, sin)
        k_new = apply_rotary(k_new, cos, sin)
        k_l = jax.lax.dynamic_update_slice(
            k_l, k_new.astype(k_l.dtype), (state.cache_len, 0, 0)
        )
        v_l = jax.lax.dynamic_update_slice(
            v_l, v_new.astype(v_l.dtype), (state.cache_len, 0, 0)
        )
        o = _attention(
            q[None], k_l[None].astype(q.dtype), v_l[None].astype(q.dtype), self_mask
        )[0]
        h = h + dense(a["o"], o.reshape(s, -1))
        # Cross-attention over memory
        x = layer_norm(lp["ln2"], h)
        c = lp["cross_attn"]
        qc = _split_heads(dense(c["q"], x)[None], cfg.nheads)[0]
        if collect_attention:
            from .moonshine import _attention_with_weights

            oc, w = _attention_with_weights(
                qc[None], kc_l[None].astype(qc.dtype), vc_l[None].astype(qc.dtype), cross_mask
            )
            oc, w = oc[0], w[0]
        else:
            oc = _attention(
                qc[None], kc_l[None].astype(qc.dtype), vc_l[None].astype(qc.dtype), cross_mask
            )[0]
            w = None
        h = h + dense(c["o"], oc.reshape(s, -1))
        # SwiGLU MLP
        x = layer_norm(lp["ln3"], h)
        up = dense(lp["mlp"]["fc1"], x)
        hh, gate = jnp.split(up, 2, axis=-1)
        h = h + dense(lp["mlp"]["fc2"], ACTIVATIONS["silu"](gate) * hh)
        return h, (k_l, v_l, w)

    h, (k_self, v_self, cross_w) = jax.lax.scan(
        body, h, (dec["layers"], state.k_self, state.v_self, k_cross_b, v_cross_b)
    )
    h = layer_norm(dec["norm"], h)
    logits = jnp.dot(h, dec["embed"].T.astype(h.dtype), preferred_element_type=jnp.float32)
    state = state._replace(k_self=k_self, v_self=v_self, cache_len=state.cache_len + s)
    return logits, state, (cross_w if collect_attention else None)


@partial(jax.jit, static_argnames=("cfg", "mem_bucket"))
def _greedy_continue(
    params: Params,
    cfg: StreamingConfig,
    first_token: jnp.ndarray,
    state: StreamingState,
    budget: jnp.ndarray,  # scalar int32 — traced so one program serves all budgets
    mem_bucket: int = MEM_CAP,
):
    """Greedy loop from ``first_token`` until EOS/budget, fully on device."""
    max_new = cfg.max_seq_len  # static token buffer capacity

    class Carry(NamedTuple):
        state: StreamingState
        tokens: jnp.ndarray  # [max_new]
        last: jnp.ndarray
        count: jnp.ndarray
        done: jnp.ndarray

    tokens0 = jnp.full((max_new,), cfg.eos_id, jnp.int32)

    def cond(c: Carry):
        return jnp.logical_not(c.done)

    def body(c: Carry):
        logits, new_state, _ = decode_tokens(
            params, cfg, c.last[None], c.state, mem_bucket=mem_bucket
        )
        nxt = jnp.argmax(logits[-1]).astype(jnp.int32)
        is_eos = nxt == cfg.eos_id
        full = new_state.cache_len >= cfg.max_seq_len - 1
        tokens = jnp.where(
            (jnp.arange(max_new) == c.count) & ~is_eos, nxt, c.tokens
        )
        count = c.count + jnp.where(is_eos, 0, 1)
        done = is_eos | full | (count >= budget)
        return Carry(new_state, tokens, nxt, count, done)

    init = Carry(state, tokens0, first_token, jnp.zeros((), jnp.int32), jnp.zeros((), bool))
    out = jax.lax.while_loop(cond, body, init)
    return out.tokens, out.count, out.state


@partial(jax.jit, static_argnames=("cfg", "mem_bucket"))
def decode_full_fused(
    params: Params,
    cfg: StreamingConfig,
    state: StreamingState,
    draft: jnp.ndarray,  # [max_seq_len] int32, EOS-padded previous hypothesis
    draft_len: jnp.ndarray,  # scalar int32
    budget: jnp.ndarray,  # scalar int32 token cap
    mem_bucket: int = MEM_CAP,
) -> tuple[jnp.ndarray, jnp.ndarray, StreamingState]:
    """Verify + rollback + greedy-continue as ONE device program.

    The host decode_full costs two dispatches plus host syncs per update
    (verify pass, divergence compare on host, continue loop) and compiles
    one program per power-of-two draft length; through the axon relay that
    overhead dominates short streaming updates.  This version runs the
    whole reference decode_full contract (reference: cpp:1244-1316) under
    one jit with a static [max_seq_len] draft buffer: batched verify,
    on-device first-divergence, cache rollback by index, and the greedy
    while_loop continuation.  Returns (tokens [max_seq_len], count, state).
    """
    max_draft = cfg.max_seq_len - 2
    state = decoder_reset(state)

    # ---- batched verify over [bos, d0..d_{max_draft-1}] ------------------
    seq = jnp.concatenate([jnp.full((1,), cfg.bos_id, jnp.int32), draft[:max_draft]])
    logits, vstate, _ = decode_tokens(params, cfg, seq, state, mem_bucket=mem_bucket)
    preds = jnp.argmax(logits, axis=-1).astype(jnp.int32)  # [max_draft + 1]

    idx = jnp.arange(max_draft)
    valid = idx < jnp.minimum(draft_len, budget)
    agree = (preds[:max_draft] == draft[:max_draft]) & valid & (draft[:max_draft] != cfg.eos_id)
    # First position where agreement fails (== number of accepted tokens).
    n_accept = jnp.argmin(jnp.concatenate([agree, jnp.zeros((1,), bool)]).astype(jnp.int32))
    correction = preds[n_accept]

    tokens0 = jnp.where(idx < n_accept, draft[:max_draft], cfg.eos_id)
    tokens0 = jnp.concatenate([tokens0, jnp.full((cfg.max_seq_len - max_draft,), cfg.eos_id, jnp.int32)])

    corr_is_token = (correction != cfg.eos_id) & (n_accept < budget)
    tokens0 = jnp.where(
        (jnp.arange(cfg.max_seq_len) == n_accept) & corr_is_token, correction, tokens0
    )
    count0 = n_accept + corr_is_token.astype(jnp.int32)
    # Cache holds [bos, d0..d_{n_accept-1}]; the continuation loop consumes
    # the correction token itself (writing its KV at 1 + n_accept).
    state = vstate._replace(cache_len=1 + n_accept)
    done0 = jnp.logical_not(corr_is_token) | (count0 >= budget)

    # ---- greedy continuation (inlined _greedy_continue) ------------------
    class Carry(NamedTuple):
        state: StreamingState
        tokens: jnp.ndarray
        last: jnp.ndarray
        count: jnp.ndarray
        done: jnp.ndarray

    def cond(c: Carry):
        return jnp.logical_not(c.done)

    def body(c: Carry):
        lg, new_state, _ = decode_tokens(
            params, cfg, c.last[None], c.state, mem_bucket=mem_bucket
        )
        nxt = jnp.argmax(lg[-1]).astype(jnp.int32)
        is_eos = nxt == cfg.eos_id
        cache_full = new_state.cache_len >= cfg.max_seq_len - 1
        tokens = jnp.where(
            (jnp.arange(cfg.max_seq_len) == c.count) & ~is_eos, nxt, c.tokens
        )
        count = c.count + jnp.where(is_eos, 0, 1)
        done = is_eos | cache_full | (count >= budget)
        return Carry(new_state, tokens, nxt, count, done)

    init = Carry(state, tokens0, correction, count0, done0)
    out = jax.lax.while_loop(cond, body, init)
    return out.tokens, out.count, out.state


def decode_full(
    params: Params,
    cfg: StreamingConfig,
    state: StreamingState,
    speculative_tokens: list[int] | None = None,
    max_tokens: int | None = None,
) -> tuple[list[int], StreamingState]:
    """Full decode with speculative verification (reference: cpp:1244-1316).

    If ``speculative_tokens`` (the previous pass's hypothesis) is given, one
    batched decoder pass verifies the whole draft; decoding continues from
    the first divergence with the cache rolled back by index.  Otherwise
    greedy from BOS.
    """
    state = decoder_reset(state)
    cap = cfg.max_seq_len - 2
    max_tokens = min(max_tokens or cap, cap)

    accepted: list[int] = []
    if speculative_tokens:
        draft = [t for t in speculative_tokens if t not in (cfg.eos_id,)][:max_tokens]
    else:
        draft = []

    if draft:
        # One pass over [bos, d0..dn-1] yields predictions for every draft
        # position (reference: decode_full's single batched verify).  The
        # sequence is padded to a power-of-two bucket so only O(log) decode
        # programs ever compile; padded positions are causal-masked garbage
        # we never read, and the cache rollback below voids their KV rows.
        seq_list = [cfg.bos_id] + draft
        bucket = 1
        while bucket < len(seq_list):
            bucket *= 2
        seq = jnp.asarray(seq_list + [0] * (bucket - len(seq_list)), jnp.int32)
        mem_bucket = mem_bucket_for(int(state.mem_len))
        logits, vstate, _ = decode_tokens(params, cfg, seq, state, mem_bucket=mem_bucket)
        preds = jnp.argmax(logits, axis=-1)
        preds_host = [int(x) for x in preds]
        n_match = 0
        for i, d in enumerate(draft):
            if preds_host[i] == d:
                n_match += 1
            else:
                break
        accepted = draft[:n_match]
        next_token = preds_host[n_match]  # first diverging prediction
        # Roll the cache back to bos + accepted tokens.
        state = vstate._replace(cache_len=jnp.asarray(1 + n_match, jnp.int32))
        if next_token == cfg.eos_id or len(accepted) >= max_tokens:
            return accepted, state
        start = jnp.asarray(next_token, jnp.int32)
        budget = max_tokens - len(accepted) - 1
        accepted.append(next_token)
    else:
        mem_bucket = mem_bucket_for(int(state.mem_len))
        logits, state, _ = decode_tokens(
            params, cfg, jnp.asarray([cfg.bos_id], jnp.int32), state,
            mem_bucket=mem_bucket,
        )
        first = int(jnp.argmax(logits[-1]))
        if first == cfg.eos_id:
            return [], state
        accepted.append(first)
        start = jnp.asarray(first, jnp.int32)
        budget = max_tokens - 1

    if budget > 0:
        tokens, count, state = _greedy_continue(
            params, cfg, start, state, jnp.asarray(budget, jnp.int32),
            mem_bucket=mem_bucket,
        )
        accepted.extend(int(t) for t in tokens[: int(count)])
    return accepted, state
