"""TPU-native Moonshine encoder/decoder (non-streaming family).

Covers the reference's ``MoonshineModel`` capability (reference:
core/moonshine-model.h:17-108): encoder over the raw waveform and a
KV-cached autoregressive decoder.  The design is one pure-functional JAX
model rather than two ONNX sessions: layer parameters are stacked on a
leading axis and traversed with ``lax.scan`` so compilation cost is
per-layer-count-independent, KV caches are fixed-capacity on-HBM arrays
updated in place with ``dynamic_update_slice``, and every entry point is
shape-static and jittable.

Architecture parity target is the published Moonshine checkpoints
(HF ``MoonshineForConditionalGeneration``): strided-conv raw-audio
frontend, rotary transformer encoder (pre-LN, GELU MLP), decoder with
rotary causal self-attention, rope-free cross-attention and SwiGLU MLP,
tied embedding/output projection.  ``tests/test_hf_parity.py`` asserts
logit-level agreement against randomly-initialized torch references.
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp

from ..core.config import MoonshineArchConfig
from ..ops.int8_kv import attention_dm_q8, attention_dm_q8_with_weights, quantize_kv
from ..ops.rotary import (
    apply_rotary,
    apply_rotary_fullwidth,
    pair_swap_perm,
    rotary_tables,
    swap_dense_params,
)
from ..quant import weight_of
from .layers import (
    ACTIVATIONS,
    Params,
    conv1d,
    conv1d_init,
    dense,
    dense_init,
    group_norm_all,
    layer_norm,
    norm_init,
)

NEG_INF = -1e9  # large-negative mask value; avoids NaN from (-inf) - (-inf)


# =========================================================================
# Parameter initialization
# =========================================================================

def _attn_init(rng, dim: int, heads: int, head_dim: int, bias: bool) -> Params:
    r = jax.random.split(rng, 4)
    return {
        "q": dense_init(r[0], dim, heads * head_dim, bias=bias),
        "k": dense_init(r[1], dim, heads * head_dim, bias=bias),
        "v": dense_init(r[2], dim, heads * head_dim, bias=bias),
        "o": dense_init(r[3], heads * head_dim, dim, bias=False),
    }


def _encoder_layer_init(rng, cfg: MoonshineArchConfig) -> Params:
    r = jax.random.split(rng, 3)
    d = cfg.hidden_size
    return {
        "ln1": norm_init(d),
        "attn": _attn_init(r[0], d, cfg.encoder_heads, cfg.head_dim, cfg.attention_bias),
        "ln2": norm_init(d),
        "mlp": {
            "fc1": dense_init(r[1], d, cfg.intermediate_size),
            "fc2": dense_init(r[2], cfg.intermediate_size, d),
        },
    }


def _decoder_layer_init(rng, cfg: MoonshineArchConfig) -> Params:
    r = jax.random.split(rng, 4)
    d = cfg.hidden_size
    return {
        "ln1": norm_init(d),
        "self_attn": _attn_init(r[0], d, cfg.decoder_heads, cfg.head_dim, cfg.attention_bias),
        "ln2": norm_init(d),
        "cross_attn": _attn_init(r[1], d, cfg.decoder_heads, cfg.head_dim, cfg.attention_bias),
        "ln3": norm_init(d),
        "mlp": {
            "fc1": dense_init(r[2], d, cfg.intermediate_size * 2),
            "fc2": dense_init(r[3], cfg.intermediate_size, d),
        },
    }


def _stack_layers(layer_params: list[Params]) -> Params:
    return jax.tree.map(lambda *xs: jnp.stack(xs, axis=0), *layer_params)


def init_params(cfg: MoonshineArchConfig, rng: jax.Array) -> Params:
    r = jax.random.split(rng, 8)
    d = cfg.hidden_size
    k1, k2, k3 = cfg.conv_kernels
    frontend = {
        "conv1": conv1d_init(r[0], k1, 1, d, bias=False),
        "gn": {"scale": jnp.ones((d,), jnp.float32), "bias": jnp.zeros((d,), jnp.float32)},
        "conv2": conv1d_init(r[1], k2, d, 2 * d, bias=True),
        "conv3": conv1d_init(r[2], k3, 2 * d, d, bias=True),
    }
    enc_layers = [_encoder_layer_init(k, cfg) for k in jax.random.split(r[3], cfg.encoder_layers)]
    dec_layers = [_decoder_layer_init(k, cfg) for k in jax.random.split(r[4], cfg.decoder_layers)]
    encoder = {"layers": _stack_layers(enc_layers), "norm": norm_init(d)}
    decoder = {
        "embed": jax.random.normal(r[5], (cfg.vocab_size, d), jnp.float32) * 0.02,
        "layers": _stack_layers(dec_layers),
        "norm": norm_init(d),
    }
    return {"frontend": frontend, "encoder": encoder, "decoder": decoder}


# =========================================================================
# Attention core
# =========================================================================

def _split_heads(x: jnp.ndarray, heads: int) -> jnp.ndarray:
    # [B, S, H*hd] -> [B, S, H, hd]
    b, s, _ = x.shape
    return x.reshape(b, s, heads, -1)


def _attention(
    q: jnp.ndarray,  # [B, S, H, hd]
    k: jnp.ndarray,  # [B, T, H, hd]
    v: jnp.ndarray,  # [B, T, H, hd]
    mask: jnp.ndarray | None,  # broadcastable to [B, H, S, T]; True = attend
) -> jnp.ndarray:
    head_dim = q.shape[-1]
    scale = head_dim ** -0.5
    logits = jnp.einsum("bshd,bthd->bhst", q, k, preferred_element_type=jnp.float32) * scale
    if mask is not None:
        logits = jnp.where(mask, logits, NEG_INF)
    weights = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(q.dtype)
    out = jnp.einsum("bhst,bthd->bshd", weights, v, preferred_element_type=q.dtype)
    return out


def _attention_with_weights(q, k, v, mask):
    """Same as _attention but also returns the softmax weights [B,H,S,T]
    (used by DTW word alignment, reference: core/word-alignment.cpp)."""
    head_dim = q.shape[-1]
    scale = head_dim ** -0.5
    logits = jnp.einsum("bshd,bthd->bhst", q, k, preferred_element_type=jnp.float32) * scale
    if mask is not None:
        logits = jnp.where(mask, logits, NEG_INF)
    weights = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
    out = jnp.einsum("bhst,bthd->bshd", weights.astype(q.dtype), v, preferred_element_type=q.dtype)
    return out, weights


# =========================================================================
# Frontend + encoder
# =========================================================================

def frontend_apply(
    p: Params,
    cfg: MoonshineArchConfig,
    audio: jnp.ndarray,  # [B, N] float32 in [-1, 1]
    lengths: jnp.ndarray | None = None,  # [B] int32 valid sample counts
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Strided-conv frontend: raw waveform -> [B, T, D] features + [B, T] mask."""
    if cfg.frames_for_samples(audio.shape[-1]) < 1:
        raise ValueError(
            f"Audio too short: {audio.shape[-1]} samples yields no encoder "
            f"frames (minimum {cfg.min_samples()} samples at 16 kHz)"
        )
    s1, s2, s3 = cfg.conv_strides
    k1 = cfg.conv_kernels[0]
    # Stage 1 has ONE input channel: as a conv the MXU pads channels to 128
    # and runs at ~1% utilization (measured 41 ms of a 322 ms pipeline at
    # B=128x10s).  As im2col windows x a [k1, D] matmul it is a dense GEMM.
    # With k1 (127) <= 2*s1 (128), the im2col is gather-free: 64-sample
    # blocks, adjacent pairs concatenated to 128-wide rows, and the weight
    # padded with one zero row — bit-identical, 1.2x faster than the
    # fancy-gather (docs/PERF.md), and the 128 width is lane-exact.
    n_frames1 = (audio.shape[-1] - k1) // s1 + 1
    w1 = p["conv1"]["w"]  # [k1, 1, D]
    if k1 <= 2 * s1:
        # Space-to-channel: stride-s1 sample blocks become s1 input
        # channels, so stage 1 is a k=2 conv over the block axis — XLA's
        # implicit-im2col conv path, no materialized [B, T1, 2*s1]
        # window tensor (round-5 measurement: 9.4 -> 6.5 ms at B=512,
        # maxdiff 0.0 vs the round-2 pairs-GEMM; docs/PERF.md).
        pad = (-audio.shape[-1]) % s1 + s1  # to a block multiple, +1 block
        a = jnp.pad(audio.astype(w1.dtype), ((0, 0), (0, pad)))
        blocks = a.reshape(a.shape[0], -1, s1)  # [B, nb, s1]
        w1_full = jnp.concatenate(
            [w1[:, 0, :], jnp.zeros((2 * s1 - k1, w1.shape[-1]), w1.dtype)], axis=0
        )
        y = jax.lax.conv_general_dilated(
            blocks, w1_full.reshape(2, s1, -1), window_strides=(1,),
            padding="VALID", dimension_numbers=("NWC", "WIO", "NWC"),
        )[:, :n_frames1]
        h = jnp.tanh(y).astype(w1.dtype)
    else:  # generic fallback for non-reference conv geometries
        idx = jnp.arange(n_frames1)[:, None] * s1 + jnp.arange(k1)[None, :]
        windows = audio.astype(w1.dtype)[:, idx]  # [B, T1, k1]
        w1_full = w1[:, 0, :]
        h = jnp.tanh(
            jnp.dot(windows, w1_full, preferred_element_type=jnp.float32)
        ).astype(w1.dtype)
    if "b" in p["conv1"]:
        h = h + p["conv1"]["b"].astype(h.dtype)
    if lengths is not None:
        k1 = cfg.conv_kernels[0]
        l1 = jnp.maximum((lengths - k1) // s1 + 1, 0)
        m1 = jnp.arange(h.shape[1])[None, :] < l1[:, None]
    else:
        m1 = None
    h = group_norm_all(p["gn"], h, m1)
    h = ACTIVATIONS["gelu"](conv1d(p["conv2"], h, s2))
    h = ACTIVATIONS["gelu"](conv1d(p["conv3"], h, s3))
    t = h.shape[1]
    if lengths is not None:
        valid = jax.vmap(lambda n: _frames_for_samples_traced(cfg, n))(lengths)
        mask = jnp.arange(t)[None, :] < valid[:, None]
    else:
        mask = jnp.ones((h.shape[0], t), dtype=bool)
    return h, mask


def _frames_for_samples_traced(cfg: MoonshineArchConfig, n: jnp.ndarray) -> jnp.ndarray:
    for k, s in zip(cfg.conv_kernels, cfg.conv_strides):
        n = (n - k) // s + 1
    return jnp.maximum(n, 0)


def frames_for_samples(cfg: MoonshineArchConfig, n: int) -> int:
    """Encoder frame count for ``n`` input samples (host int math)."""
    for k, s in zip(cfg.conv_kernels, cfg.conv_strides):
        n = (n - k) // s + 1
    return max(n, 0)


def lane_aligned_samples(cfg: MoonshineArchConfig, n: int, align: int = 128) -> int:
    """Smallest padded sample count ≥ ``n`` whose encoder frame count is a
    multiple of ``align``.

    TPU arrays put the time axis on 128-wide lanes; a T=415 encode pads to
    512 physically (1.23× wasted bandwidth on every attention/cross-KV
    read).  Choosing batch-bucket lengths with 128-aligned frame counts
    measured +10.5 % offline throughput at identical audio (docs/PERF.md
    shape-choice note) — this helper makes that the bucketing default.
    """
    f = frames_for_samples(cfg, n)
    target = max(-(-f // align) * align, align)
    hop = 1
    for s in cfg.conv_strides:
        hop *= s
    while frames_for_samples(cfg, n) < target:
        n += hop * max(target - frames_for_samples(cfg, n), 1)
    return n


def _encoder_layer_apply(cfg: MoonshineArchConfig, h, lp: Params, cos, sin, mask, eps,
                         frame_mask=None, attn_impl: str = "xla", mesh=None,
                         interpret: bool = False):
    x = layer_norm(lp["ln1"], h, eps)
    a = lp["attn"]
    # Rotary at full width BEFORE the head split: the swapped projection is
    # the same GEMM with output columns permuted (exact), and the rotation
    # is pure elementwise work on the lane-exact [B, S, D] layout instead
    # of the 4.9x-padded [B, S, H, hd] one (ops/rotary.py, measured
    # 10.3 -> ~1.5 ms/layer at B=512).
    hd = cfg.head_dim
    half = cos.shape[-1]
    q_perm = pair_swap_perm(hd, half, cfg.encoder_heads)
    k_perm = pair_swap_perm(hd, half, cfg.encoder_kv_heads)
    qf = dense(a["q"], x)
    kf = dense(a["k"], x)
    # Prefer permuted weights precomputed at load (prepare_rotary_params)
    # over the in-trace column gather — same arithmetic, but the gather
    # otherwise re-runs every step (ADVICE r3).
    qsf = dense(a["q_swapped"], x) if "q_swapped" in a else dense(
        swap_dense_params(a["q"], q_perm), x)
    ksf = dense(a["k_swapped"], x) if "k_swapped" in a else dense(
        swap_dense_params(a["k"], k_perm), x)
    q_full = apply_rotary_fullwidth(qf, qsf, cos, sin, hd, cfg.encoder_heads)
    k_full = apply_rotary_fullwidth(kf, ksf, cos, sin, hd, cfg.encoder_kv_heads)
    use_packed = (
        attn_impl in ("pallas", "pallas_shmap")
        and cfg.encoder_kv_heads == cfg.encoder_heads
    )
    if attn_impl in ("pallas", "pallas_shmap") and not use_packed:
        # GQA configs have no packed-kernel path: make the silent
        # degradation to the XLA attention visible (ADVICE r3).
        import warnings

        warnings.warn(
            f"attn_impl={attn_impl!r} requested but encoder_kv_heads "
            f"({cfg.encoder_kv_heads}) != encoder_heads "
            f"({cfg.encoder_heads}); falling back to the XLA attention "
            "path", stacklevel=2)
    if use_packed:
        # Packed-layout kernel: q/v stay [B, T, D] (the projections'
        # natural lane-exact layout), K transposes once to dim-major —
        # no head-split relayouts at all (ops/encoder_attention.py).
        v_full = dense(a["v"], x)
        kt = jnp.swapaxes(k_full, 1, 2)
        if attn_impl == "pallas":
            from ..ops.encoder_attention import encoder_attention_packed

            o_full = encoder_attention_packed(
                q_full, kt, v_full, frame_mask, heads=cfg.encoder_heads,
                interpret=interpret,
            )
        else:
            from ..ops.encoder_attention import (
                encoder_attention_packed_sharded,
            )

            o_full = encoder_attention_packed_sharded(
                q_full, kt, v_full, frame_mask, cfg.encoder_heads, mesh,
                interpret=interpret,
            )
        return _encoder_layer_tail(cfg, h, lp, o_full, eps)
    q = _split_heads(q_full, cfg.encoder_heads)
    k = _split_heads(k_full, cfg.encoder_kv_heads)
    v = _split_heads(dense(a["v"], x), cfg.encoder_kv_heads)
    o = _attention(q, k, v, mask)
    return _encoder_layer_tail(
        cfg, h, lp, o.reshape(o.shape[0], o.shape[1], -1), eps
    )


def _encoder_layer_tail(cfg: MoonshineArchConfig, h, lp: Params,
                        o_full: jnp.ndarray, eps: float):
    """Attention output projection + residual + MLP (shared by both
    attention layouts; o_full is [B, T, D])."""
    h = h + dense(lp["attn"]["o"], o_full)
    x = layer_norm(lp["ln2"], h, eps)
    act = ACTIVATIONS[cfg.encoder_hidden_act]
    return h + dense(lp["mlp"]["fc2"], act(dense(lp["mlp"]["fc1"], x)))


def _resolve_attn_impl(attn_impl: str) -> str:
    """"auto" -> the Pallas VMEM-logits kernel on a single TPU backend
    (measured 1.33x on the bench encode, docs/PERF.md), XLA elsewhere.
    Sharded (pjit/GSPMD) callers should stay on "xla": a pallas_call is an
    opaque custom call that GSPMD cannot repartition across a mesh."""
    if attn_impl != "auto":
        return attn_impl
    try:
        return "pallas" if jax.default_backend() == "tpu" else "xla"
    except Exception:
        return "xla"


def prepare_rotary_params(params: Params, cfg: MoonshineArchConfig) -> Params:
    """Precompute the rotary pair-swap weight permutations ONCE at
    parameter-load time (ADVICE r3): adds ``q_swapped``/``k_swapped``
    leaves beside the encoder attention projections, which
    ``_encoder_layer_apply`` prefers over the per-step in-trace column
    gather.  Exact — a static permutation of output columns.  Idempotent.
    """
    import numpy as np

    enc = params.get("encoder")
    if not enc or "layers" not in enc or "attn" not in enc["layers"]:
        return params
    a = enc["layers"]["attn"]
    if "q_swapped" in a:
        return params
    hd = cfg.head_dim
    half = cfg.rotary_dim // 2  # partial-rotary aware (rotary_tables)
    q_perm = np.asarray(pair_swap_perm(hd, half, cfg.encoder_heads))
    k_perm = np.asarray(pair_swap_perm(hd, half, cfg.encoder_kv_heads))

    def permute(p: dict, perm) -> dict:
        out = dict(p)
        # stacked [L, in, out] leaves: permute the OUTPUT (last) axis
        if "w" in out:
            out["w"] = out["w"][..., perm]
        if "w_q" in out:
            out["w_q"] = out["w_q"][..., perm]
        if "w_scale" in out:
            out["w_scale"] = out["w_scale"][..., perm]
        if "b" in out:
            out["b"] = out["b"][..., perm]
        return out

    new_a = dict(a, q_swapped=permute(a["q"], q_perm),
                 k_swapped=permute(a["k"], k_perm))
    new_layers = dict(enc["layers"], attn=new_a)
    return dict(params, encoder=dict(enc, layers=new_layers))


def encoder_apply(
    p: Params,
    cfg: MoonshineArchConfig,
    features: jnp.ndarray,  # [B, T, D]
    frame_mask: jnp.ndarray | None = None,  # [B, T]
    attn_impl: str = "xla",  # "pallas": VMEM-resident logits kernel; "auto";
                              # "pallas_shmap": kernel under shard_map (mesh=)
    mesh=None,
    interpret: bool = False,
) -> jnp.ndarray:
    """Rotary transformer encoder -> [B, T, D] hidden states."""
    attn_impl = _resolve_attn_impl(attn_impl)
    b, t, _ = features.shape
    positions = jnp.arange(t)
    cos, sin = rotary_tables(positions, cfg.rotary_dim, cfg.rope_theta)
    if frame_mask is not None:
        mask = frame_mask[:, None, None, :]  # [B,1,1,T] keys
    else:
        mask = None
    eps = cfg.layer_norm_eps

    def body(h, lp):
        return _encoder_layer_apply(
            cfg, h, lp, cos, sin, mask, eps, frame_mask=frame_mask,
            attn_impl=attn_impl, mesh=mesh, interpret=interpret,
        ), None

    h, _ = jax.lax.scan(body, features, p["layers"])
    return layer_norm(p["norm"], h, eps)


def encode(
    params: Params,
    cfg: MoonshineArchConfig,
    audio: jnp.ndarray,
    lengths: jnp.ndarray | None = None,
    attn_impl: str = "xla",
    mesh=None,
    interpret: bool = False,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """audio [B, N] -> (memory [B, T, D], frame_mask [B, T])."""
    feats, mask = frontend_apply(params["frontend"], cfg, audio, lengths)
    memory = encoder_apply(
        params["encoder"], cfg, feats, mask if lengths is not None else None,
        attn_impl=attn_impl, mesh=mesh, interpret=interpret,
    )
    return memory, mask


# =========================================================================
# Decoder with KV cache
# =========================================================================

class DecoderCache(NamedTuple):
    """On-HBM decoder state threaded through jitted decode steps.

    Mirrors the reference's streaming-state KV arrangement
    (reference: core/moonshine-streaming-model.h:54-67) as fixed-capacity
    device arrays: self-KV is a ring-capacity buffer indexed by ``cur_len``;
    cross-KV is precomputed once per memory update.

    Layout is DIM-MAJOR [L, B, H, hd, T]: TPU bf16 arrays tile (16, 128)
    on the last two dims, so a trailing head_dim (40/52/64) pads every
    lane row to 128 — up to ~5x physical HBM traffic on the
    bandwidth-bound decode steps.  Dim-major puts the long time axis on
    lanes; measured 2.6x faster attention streaming on-chip (see
    models/streaming_batch.py for the batched-service twin).
    """

    k_self: jnp.ndarray  # [L, B, H, hd, S_max]
    v_self: jnp.ndarray  # [L, B, H, hd, S_max]
    cur_len: jnp.ndarray  # scalar int32
    k_cross: jnp.ndarray  # [L, B, H, hd, T]
    v_cross: jnp.ndarray  # [L, B, H, hd, T]
    memory_mask: jnp.ndarray  # [B, T] bool
    # Optional int8 mode (ops/int8_kv.py): when the scale fields are set the
    # K/V arrays above hold int8 values with per-key-column scales, and the
    # decode attention dequantizes in-einsum — half the HBM bytes on the
    # bandwidth-bound decode steps.
    k_self_scale: jnp.ndarray | None = None  # [L, B, H, S_max] f32
    v_self_scale: jnp.ndarray | None = None  # [L, B, H, S_max] f32
    k_cross_scale: jnp.ndarray | None = None  # [L, B, H, T] f32
    v_cross_scale: jnp.ndarray | None = None  # [L, B, H, T] f32


def init_cache(
    cfg: MoonshineArchConfig,
    batch: int,
    max_len: int,
    k_cross: jnp.ndarray,
    v_cross: jnp.ndarray,
    memory_mask: jnp.ndarray,
    dtype=jnp.float32,
    kv_int8: bool = False,
) -> DecoderCache:
    # [L, B, H, hd, S]: dim-major — the 128-aligned time axis on lanes
    # (see DecoderCache docstring).
    shape = (cfg.decoder_layers, batch, cfg.decoder_kv_heads, cfg.head_dim, max_len)
    if not kv_int8:
        return DecoderCache(
            k_self=jnp.zeros(shape, dtype),
            v_self=jnp.zeros(shape, dtype),
            cur_len=jnp.zeros((), jnp.int32),
            k_cross=k_cross,
            v_cross=v_cross,
            memory_mask=memory_mask,
        )
    sshape = shape[:3] + shape[4:]  # [L, B, H, S]
    kc_q, kc_s = quantize_kv(k_cross)
    vc_q, vc_s = quantize_kv(v_cross)
    return DecoderCache(
        k_self=jnp.zeros(shape, jnp.int8),
        v_self=jnp.zeros(shape, jnp.int8),
        cur_len=jnp.zeros((), jnp.int32),
        k_cross=kc_q,
        v_cross=vc_q,
        memory_mask=memory_mask,
        k_self_scale=jnp.zeros(sshape, jnp.float32),
        v_self_scale=jnp.zeros(sshape, jnp.float32),
        k_cross_scale=kc_s,
        v_cross_scale=vc_s,
    )


def compute_cross_kv(
    p: Params, cfg: MoonshineArchConfig, memory: jnp.ndarray
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Precompute cross-attention K/V for all layers from encoder memory.

    Counterpart of the reference's ``cross_kv.ort`` session (reference:
    core/moonshine-streaming-model.cpp:744-806).  Returns [L, B, H, hd, T]
    (dim-major, matching the decode attention's native layout).
    """

    h = cfg.decoder_kv_heads
    hd = cfg.hidden_size // cfg.decoder_heads

    def body(_, lp):
        a = lp["cross_attn"]
        # Contract straight into the dim-major layout instead of dense() +
        # transpose: folding the head/dim split into the einsum measures
        # 1.22x faster than projecting [B,T,H*hd] and relayouting
        # (50.8 -> 41.5 ms at B=256, bit-identical; docs/PERF.md).
        # weight_of: also accepts exec-quantized w_q/w_scale trees (the
        # dequant folds into this einsum — the cross-KV precompute is one
        # pass over memory, not a per-step cost worth an int8 dot).
        wk = weight_of(a["k"], memory.dtype).reshape(cfg.hidden_size, h, hd)
        wv = weight_of(a["v"], memory.dtype).reshape(cfg.hidden_size, h, hd)
        k = jnp.einsum("btd,dhk->bhkt", memory, wk, preferred_element_type=memory.dtype)
        v = jnp.einsum("btd,dhk->bhkt", memory, wv, preferred_element_type=memory.dtype)
        if "b" in a["k"]:
            k = k + a["k"]["b"].astype(memory.dtype).reshape(1, h, hd, 1)
        if "b" in a["v"]:
            v = v + a["v"]["b"].astype(memory.dtype).reshape(1, h, hd, 1)
        return None, (k, v)

    _, (ks, vs) = jax.lax.scan(body, None, p["layers"])
    return ks, vs


def _attention_dm(q, k, v, mask):
    """Attention over dim-major K/V [B, H, hd, T] (see DecoderCache)."""
    scale = q.shape[-1] ** -0.5
    logits = jnp.einsum("bshd,bhdt->bhst", q, k, preferred_element_type=jnp.float32) * scale
    if mask is not None:
        logits = jnp.where(mask, logits, NEG_INF)
    weights = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(q.dtype)
    return jnp.einsum("bhst,bhdt->bshd", weights, v, preferred_element_type=q.dtype)


def _attention_dm_with_weights(q, k, v, mask):
    """_attention_dm returning the softmax weights [B, H, s, T] too."""
    scale = q.shape[-1] ** -0.5
    logits = jnp.einsum("bshd,bhdt->bhst", q, k, preferred_element_type=jnp.float32) * scale
    if mask is not None:
        logits = jnp.where(mask, logits, NEG_INF)
    weights = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
    out = jnp.einsum(
        "bhst,bhdt->bshd", weights.astype(q.dtype), v, preferred_element_type=q.dtype
    )
    return out, weights


def _decoder_layer_apply(
    cfg, h, lp, k_l, v_l, cos, sin, self_mask, cross_mask, cur_len, eps,
    k_s_l=None, v_s_l=None,
):
    """One decoder layer over s new tokens with cache update.

    k_l/v_l: [B, H, hd, S_max] dim-major self-KV cache slices for this
    layer.  When k_s_l/v_s_l ([B, H, S_max] per-column scales) are given
    the caches are int8 and dequantization fuses into the attention
    einsums (ops/int8_kv.py).  Returns (h, k_l, v_l, k_s_l, v_s_l).
    """
    b, s, _ = h.shape
    heads = cfg.decoder_heads
    # Self-attention (rotary, causal over cache + new tokens)
    x = layer_norm(lp["ln1"], h, eps)
    a = lp["self_attn"]
    q = _split_heads(dense(a["q"], x), heads)
    k_new = _split_heads(dense(a["k"], x), cfg.decoder_kv_heads)
    v_new = _split_heads(dense(a["v"], x), cfg.decoder_kv_heads)
    q = apply_rotary(q, cos, sin)
    k_new = apply_rotary(k_new, cos, sin)
    k_new_dm = k_new.transpose(0, 2, 3, 1)  # [B, H, hd, s]
    v_new_dm = v_new.transpose(0, 2, 3, 1)
    if k_s_l is not None:
        kq, ks = quantize_kv(k_new_dm)
        vq, vs = quantize_kv(v_new_dm)
        k_l = jax.lax.dynamic_update_slice(k_l, kq, (0, 0, 0, cur_len))
        v_l = jax.lax.dynamic_update_slice(v_l, vq, (0, 0, 0, cur_len))
        k_s_l = jax.lax.dynamic_update_slice(k_s_l, ks, (0, 0, cur_len))
        v_s_l = jax.lax.dynamic_update_slice(v_s_l, vs, (0, 0, cur_len))
        o = attention_dm_q8(q, k_l, k_s_l, v_l, v_s_l, self_mask)
    else:
        # Write new K/V into the cache at [cur_len, cur_len + s).
        k_l = jax.lax.dynamic_update_slice(
            k_l, k_new_dm.astype(k_l.dtype), (0, 0, 0, cur_len)
        )
        v_l = jax.lax.dynamic_update_slice(
            v_l, v_new_dm.astype(v_l.dtype), (0, 0, 0, cur_len)
        )
        o = _attention_dm(q, k_l.astype(q.dtype), v_l.astype(q.dtype), self_mask)
    h = h + dense(a["o"], o.reshape(b, s, -1))
    return h, k_l, v_l, k_s_l, v_s_l


def _decoder_cross_mlp_apply(
    cfg, h, lp, kc_l, vc_l, cross_mask, eps, collect_weights=False,
    kc_s_l=None, vc_s_l=None, beam_k=1,
):
    b, s, _ = h.shape
    heads = cfg.decoder_heads
    x = layer_norm(lp["ln2"], h, eps)
    a = lp["cross_attn"]
    q = _split_heads(dense(a["q"], x), heads)
    if beam_k > 1:
        # Beam-deduplicated cross attention: the K beams of one utterance
        # share its memory, so the cross caches arrive UNEXPANDED
        # ([B, H, hd, T] instead of [B*K, ...]) and the beams fold into
        # the query-token axis — exact, because cross attention has no
        # causal structure and every query row attends the whole memory.
        # This removes the K-fold redundant cross-KV streaming that
        # dominated beam decode (docs/PERF.md beam section).
        q = q.reshape(b // beam_k, beam_k * s, heads, -1)
    if kc_s_l is not None:  # int8 cross-KV with in-einsum dequant
        if collect_weights:
            o, w = attention_dm_q8_with_weights(q, kc_l, kc_s_l, vc_l, vc_s_l, cross_mask)
        else:
            o = attention_dm_q8(q, kc_l, kc_s_l, vc_l, vc_s_l, cross_mask)
            w = None
    elif collect_weights:
        o, w = _attention_dm_with_weights(q, kc_l.astype(q.dtype), vc_l.astype(q.dtype), cross_mask)
    else:
        o = _attention_dm(q, kc_l.astype(q.dtype), vc_l.astype(q.dtype), cross_mask)
        w = None
    if beam_k > 1:
        o = o.reshape(b, s, heads, -1)
    h = h + dense(a["o"], o.reshape(b, s, -1))
    # SwiGLU MLP: fc1 -> (h, gate) -> silu(gate) * h -> fc2
    x = layer_norm(lp["ln3"], h, eps)
    up = dense(lp["mlp"]["fc1"], x)
    hh, gate = jnp.split(up, 2, axis=-1)
    act = ACTIVATIONS[cfg.decoder_hidden_act]
    h = h + dense(lp["mlp"]["fc2"], act(gate) * hh)
    return h, w


def decoder_apply(
    p: Params,
    cfg: MoonshineArchConfig,
    tokens: jnp.ndarray,  # [B, s] int32 new tokens
    cache: DecoderCache,
    token_mask: jnp.ndarray | None = None,  # [B, s] True for real tokens
    collect_cross_attention: bool = False,
    beam_k: int = 1,  # >1: tokens carry B*K beam rows while the cache's
    # CROSS arrays stay unexpanded at B rows (beams of one utterance share
    # its memory) — the K beams fold into the cross-attention query axis.
    # Self caches remain per-beam ([L, B*K, ...]).
) -> tuple[jnp.ndarray, DecoderCache, jnp.ndarray | None]:
    """Run the decoder over ``s`` new tokens, updating the cache.

    This one function covers the reference's ``decode_step`` (s=1),
    ``decode_tokens`` (batched speculative verify) and the prefill of
    ``decode_full`` (reference: core/moonshine-streaming-model.h:152-169) —
    the token count is just a static dimension.

    Returns (logits [B, s, V], updated cache, cross_attention or None
    [L, B, H, s, T]).
    """
    b, s = tokens.shape
    max_len = cache.k_self.shape[4]  # [L, B, H, hd, S]
    eps = cfg.layer_norm_eps
    embed = p["embed"]
    h = embed[tokens]  # compute dtype follows the param dtype (fp32 or bf16)

    positions = cache.cur_len + jnp.arange(s)
    cos, sin = rotary_tables(positions, cfg.rotary_dim, cfg.rope_theta)

    # Self-attention mask over cache keys: key j visible to query i iff
    # j < cur_len + i + 1 (past + causal new tokens).
    key_pos = jnp.arange(max_len)[None, None, None, :]
    query_abs = positions[None, None, :, None]
    self_mask = key_pos <= query_abs  # [1, 1, s, S_max]
    if token_mask is not None:
        # Query rows of padded tokens are masked AND their K/V entries are
        # hidden from every query: key positions inside the current block
        # carry the block's token validity, so interior padding cannot leak
        # into attention.  (Cache rows below cur_len from *previous* calls
        # are assumed valid — pad only within a single call.)
        self_mask = jnp.logical_and(self_mask, token_mask[:, None, :, None])
        rel = jnp.arange(max_len) - cache.cur_len  # [S_max]
        in_block = (rel >= 0) & (rel < s)
        blk_valid = jnp.take_along_axis(
            token_mask, jnp.clip(rel, 0, s - 1)[None, :].repeat(b, 0), axis=1
        )  # [B, S_max]
        key_valid = jnp.where(in_block[None, :], blk_valid, True)
        self_mask = jnp.logical_and(self_mask, key_valid[:, None, None, :])

    if beam_k > 1 and collect_cross_attention:
        raise ValueError("collect_cross_attention is not supported with beam_k > 1")
    # cross mask broadcasts over query rows, so folding beams into the
    # query axis (beam_k > 1) needs no mask change beyond the B rows
    # matching the UNEXPANDED memory_mask.
    cross_mask = cache.memory_mask[:, None, None, :]  # [B, 1, 1, T]

    quant = cache.k_self_scale is not None

    def body(carry, xs):
        h = carry
        if quant:
            lp, k_l, v_l, kc_l, vc_l, k_s_l, v_s_l, kc_s_l, vc_s_l = xs
        else:
            lp, k_l, v_l, kc_l, vc_l = xs
            k_s_l = v_s_l = kc_s_l = vc_s_l = None
        h, k_l, v_l, k_s_l, v_s_l = _decoder_layer_apply(
            cfg, h, lp, k_l, v_l, cos, sin, self_mask, cross_mask,
            cache.cur_len, eps, k_s_l=k_s_l, v_s_l=v_s_l,
        )
        h, w = _decoder_cross_mlp_apply(
            cfg, h, lp, kc_l, vc_l, cross_mask, eps,
            collect_weights=collect_cross_attention, kc_s_l=kc_s_l, vc_s_l=vc_s_l,
            beam_k=beam_k,
        )
        if quant:
            return h, (k_l, v_l, k_s_l, v_s_l, w)
        return h, (k_l, v_l, w)

    if quant:
        xs = (
            p["layers"], cache.k_self, cache.v_self, cache.k_cross, cache.v_cross,
            cache.k_self_scale, cache.v_self_scale,
            cache.k_cross_scale, cache.v_cross_scale,
        )
        h, (k_self, v_self, k_self_s, v_self_s, cross_w) = jax.lax.scan(body, h, xs)
        new_cache = cache._replace(
            k_self=k_self, v_self=v_self, cur_len=cache.cur_len + s,
            k_self_scale=k_self_s, v_self_scale=v_self_s,
        )
    else:
        h, (k_self, v_self, cross_w) = jax.lax.scan(
            body, h, (p["layers"], cache.k_self, cache.v_self, cache.k_cross, cache.v_cross)
        )
        new_cache = cache._replace(k_self=k_self, v_self=v_self, cur_len=cache.cur_len + s)
    h = layer_norm(p["norm"], h, eps)
    logits = jnp.dot(h, embed.T.astype(h.dtype), preferred_element_type=jnp.float32)
    return logits, new_cache, (cross_w if collect_cross_attention else None)
