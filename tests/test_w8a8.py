"""w8a8 execution path: int8 MXU matmuls with dynamic activation quant.

quant.quantize_tree_exec + layers.dense's w_q branch reproduce the
arithmetic of the reference's ORT dynamic quantization (MatMulInteger:
per-row activation scales at runtime, per-output-channel weight scales —
scripts/quantize-streaming-model.sh quantizes with exactly this scheme).
"""

from __future__ import annotations

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from moonshine_tpu.models.layers import dense
from moonshine_tpu.quant import quantize_tree_exec, weight_of


def test_dense_w8a8_exact_on_grid():
    """If activations/weights already sit on their int8 grids, the int32
    accumulation is exact and w8a8 == float matmul."""
    rng = np.random.RandomState(0)
    s_x = 0.25
    x = (rng.randint(-127, 128, (5, 64)) * s_x).astype(np.float32)
    # Per-channel weight grid: column j has scale (j+1)/1024.
    scale = ((np.arange(32) + 1) / 1024.0).astype(np.float32)
    w_int = rng.randint(-127, 128, (64, 32)).astype(np.float32)
    w_int[0, :] = 127  # pin each column's abs-max so scales recover exactly
    w = w_int * scale
    # Make each row's abs-max exactly 127*s_x so the dynamic scale is s_x.
    x[:, 0] = 127 * s_x
    p = quantize_tree_exec({"lin": {"w": jnp.asarray(w)}})["lin"]
    y = dense(p, jnp.asarray(x))
    ref = x @ w
    np.testing.assert_allclose(np.asarray(y), ref, rtol=1e-5, atol=1e-5)


def test_dense_w8a8_error_bounded():
    """Off-grid activations: error bounded by the activation rounding
    (half an activation LSB per product term)."""
    rng = np.random.RandomState(1)
    x = rng.randn(8, 128).astype(np.float32)
    w = rng.randn(128, 64).astype(np.float32) * 0.05
    p = quantize_tree_exec({"lin": {"w": jnp.asarray(w)}})["lin"]
    y = np.asarray(dense(p, jnp.asarray(x)))
    ref = x @ w
    # Bound: per-row activation LSB * sum_k |w_kj| / 2 + weight LSB term.
    s_row = np.max(np.abs(x), axis=1, keepdims=True) / 127.0
    bound = 0.5 * s_row * np.sum(np.abs(w), axis=0) + 0.5 * (
        np.max(np.abs(w), axis=0) / 127.0
    ) * np.sum(np.abs(x), axis=1, keepdims=True)
    assert np.all(np.abs(y - ref) <= bound + 1e-6)
    # And it is a tight approximation in practice.
    rel = np.abs(y - ref).max() / np.abs(ref).max()
    assert rel < 0.02


def test_quantize_tree_exec_stacked_layers_per_layer_scales():
    """Stacked [L, in, out] weights get per-(layer, out) scales — layer 1's
    magnitudes must not leak into layer 0's scale (unlike the storage
    quantizer, which reduces across the stack)."""
    w = np.ones((2, 16, 8), np.float32)
    w[1] *= 100.0
    q = quantize_tree_exec({"layers": {"fc": {"w": jnp.asarray(w)}}})
    fc = q["layers"]["fc"]
    assert fc["w_q"].shape == (2, 16, 8) and fc["w_q"].dtype == jnp.int8
    assert fc["w_scale"].shape == (2, 8)
    np.testing.assert_allclose(np.asarray(fc["w_scale"][0]), 1 / 127.0, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(fc["w_scale"][1]), 100 / 127.0, rtol=1e-6)
    # weight_of reconstructs both layers exactly (grid values).
    np.testing.assert_allclose(np.asarray(weight_of(fc)), w, rtol=1e-5)


def test_quantize_tree_exec_skips_frontend_and_embed():
    from moonshine_tpu.core.config import ARCHS
    from moonshine_tpu.models import moonshine as mm

    cfg = ARCHS["tiny"]
    params = mm.init_params(cfg, jax.random.PRNGKey(0))
    q = quantize_tree_exec(params)
    assert "w" in q["frontend"]["conv1"]  # untouched
    assert q["decoder"]["embed"].dtype == jnp.float32  # untouched
    lay = q["encoder"]["layers"]["mlp"]["fc1"]
    assert lay["w_q"].dtype == jnp.int8
    assert lay["w_scale"].shape == (cfg.encoder_layers, cfg.intermediate_size)


def test_w8a8_greedy_decode_end_to_end():
    """The full offline pipeline runs on an exec-quantized tree and its
    logits track the fake-quant float reference closely."""
    from moonshine_tpu.core.config import ARCHS
    from moonshine_tpu.decoding.greedy import greedy_decode
    from moonshine_tpu.models import moonshine as mm

    cfg = ARCHS["tiny"]
    params = mm.init_params(cfg, jax.random.PRNGKey(0))
    qparams = quantize_tree_exec(params)
    audio = jax.random.normal(jax.random.PRNGKey(1), (2, 16000)) * 0.1

    mem_f, mask = mm.encode(params, cfg, audio)
    mem_q, _ = mm.encode(qparams, cfg, audio)
    # Encoder outputs stay close under w8a8 (unit-std activations).
    err = float(jnp.max(jnp.abs(mem_f - mem_q)))
    ref = float(jnp.max(jnp.abs(mem_f)))
    assert err < 0.05 * ref

    out = greedy_decode(qparams, cfg, mem_q, mask, max_tokens=8)
    assert out.tokens.shape == (2, 8)
    assert np.asarray(out.tokens).dtype == np.int32
