"""Per-channel int8 quantization tests (reference:
scripts/quantize-streaming-model.sh, README.md quantization section)."""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from moonshine_tpu.quant import (
    _dequantize_array,
    _quantize_array,
    dequantize_tree,
    fake_quantize_tree,
    quantize_tree,
    tree_nbytes,
)


def test_quantize_array_roundtrip_bound():
    rng = np.random.RandomState(0)
    w = rng.randn(64, 32).astype(np.float32)
    q, s = _quantize_array(w, axis=-1)
    assert q.dtype == np.int8 and s.shape == (32,)
    back = _dequantize_array(q, s, axis=-1)
    # Max error is half a quantization step per channel.
    err = np.abs(back - w)
    step = s[None, :]
    assert np.all(err <= 0.5 * step + 1e-7)


def test_per_channel_beats_per_tensor_on_weight_norm_range():
    """The reference's motivating case: output channels spanning ~17x in
    magnitude (weight-norm frontend).  Per-channel error is ~17x smaller
    on the small channels."""
    rng = np.random.RandomState(1)
    w = rng.randn(128, 16).astype(np.float32)
    w *= np.geomspace(1.0, 17.0, 16)[None, :]  # channel magnitudes 1..17x

    q, s = _quantize_array(w, axis=-1)
    pc = _dequantize_array(q, s, -1)
    amax = np.abs(w).max()
    pt = np.round(w / (amax / 127.0)).clip(-127, 127) * (amax / 127.0)

    small = w[:, 0]  # smallest-magnitude channel
    err_pc = np.abs(pc[:, 0] - small).mean()
    err_pt = np.abs(pt[:, 0] - small).mean()
    assert err_pc * 8 < err_pt  # order-of-magnitude win


def test_tree_roundtrip_and_size():
    from moonshine_tpu.core.config import StreamingConfig
    from moonshine_tpu.models import streaming as ms

    cfg = StreamingConfig(
        encoder_dim=64, decoder_dim=64, depth=2, nheads=4, head_dim=16,
        vocab_size=128, d_model_frontend=32, c1=48, c2=64, max_seq_len=64,
        encoder_depth=2,
    )
    params = ms.init_params(cfg, jax.random.PRNGKey(0))
    packed = quantize_tree(params)
    # Frontend kept float (reference policy).
    assert "w" in packed["frontend"]["conv1"]
    assert "w_q" in packed["encoder"]["in_proj"]
    assert "embed_q" in packed["decoder"]
    # Size shrinks substantially (norms/biases/frontend stay float).
    assert tree_nbytes(packed) < 0.45 * tree_nbytes(params)

    back = dequantize_tree(packed)
    # Same structure as the original.
    assert jax.tree_util.tree_structure(back) == jax.tree_util.tree_structure(params)
    # Values within per-channel quantization error.
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(back)):
        a, b = np.asarray(a), np.asarray(b)
        assert np.max(np.abs(a - b)) <= max(0.02 * np.abs(a).max(), 1e-6)


def test_fake_quant_decode_mechanics():
    """Quantized params run the full encode+decode; most tokens agree with
    fp32 on random weights (the WER-delta harness mechanics)."""
    from moonshine_tpu.eval.quant_eval import compare_decodes

    out = compare_decodes(arch="tiny", n_clips=2, seconds=1.5)
    assert out["size_ratio"] < 0.45
    assert 0.0 <= out["token_agreement"] <= 1.0


def test_streaming_decode_with_quantized_params():
    from moonshine_tpu.core.config import StreamingConfig
    from moonshine_tpu.models import streaming as ms

    cfg = StreamingConfig(
        encoder_dim=64, decoder_dim=64, depth=2, nheads=4, head_dim=16,
        vocab_size=128, d_model_frontend=32, c1=48, c2=64, max_seq_len=64,
        encoder_depth=2,
    )
    params = ms.init_params(cfg, jax.random.PRNGKey(1))
    pq = fake_quantize_tree(params)
    state = ms.init_state(cfg)
    rng = np.random.RandomState(0)
    chunk = jnp.asarray(rng.randn(20 * 80).astype(np.float32) * 0.1)
    state = ms.frontend_step(pq, cfg, chunk, state)
    state, n = ms.encode(pq, cfg, state, is_final=True)
    assert n == 20
    tokens, state = ms.decode_full(pq, cfg, state, max_tokens=8)
    assert len(tokens) <= 8
