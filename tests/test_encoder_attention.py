"""Encoder VMEM-attention kernel parity (interpreter mode on CPU; the
compiled-mode perf comparison runs on the real chip, see docs/PERF.md)."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from moonshine_tpu.models.moonshine import _attention
from moonshine_tpu.ops.encoder_attention import encoder_attention


def _rand(rng, *shape):
    return jnp.asarray(rng.standard_normal(shape).astype(np.float32))


def test_kernel_matches_xla_attention_unmasked():
    rng = np.random.default_rng(0)
    B, T, H, hd = 2, 37, 4, 20  # deliberately unaligned T/hd
    q, k, v = (_rand(rng, B, T, H, hd) for _ in range(3))
    ref = _attention(q, k, v, None)
    out = encoder_attention(q, k, v, None, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=1e-4)


def test_kernel_matches_xla_attention_masked():
    rng = np.random.default_rng(1)
    B, T, H, hd = 3, 29, 2, 16
    q, k, v = (_rand(rng, B, T, H, hd) for _ in range(3))
    lengths = np.array([29, 11, 1])
    fm = jnp.asarray(np.arange(T)[None, :] < lengths[:, None])
    ref = _attention(q, k, v, fm[:, None, None, :])
    out = encoder_attention(q, k, v, fm, interpret=True)
    # Compare only valid query rows (invalid rows are garbage in both paths
    # and dropped downstream by the frame mask).
    for b, n in enumerate(lengths):
        np.testing.assert_allclose(
            np.asarray(out)[b, :n], np.asarray(ref)[b, :n], atol=2e-5, rtol=1e-4
        )


def test_kernel_bf16_io_f32_accumulate():
    rng = np.random.default_rng(2)
    B, T, H, hd = 2, 33, 2, 24
    q, k, v = (_rand(rng, B, T, H, hd).astype(jnp.bfloat16) for _ in range(3))
    ref = _attention(q, k, v, None)  # fp32 logits policy inside
    out = encoder_attention(q, k, v, None, interpret=True)
    assert out.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32), atol=0.02, rtol=0.02
    )


def test_encoder_apply_pallas_path():
    """encoder_apply(attn_impl='pallas') wires the kernel through the layer
    scan (interpret mode via monkeypatched default is unavailable, so this
    exercises shapes/plumbing only on CPU interpret)."""
    from moonshine_tpu.core.config import MoonshineArchConfig
    from moonshine_tpu.models import moonshine as mm
    from moonshine_tpu.ops import encoder_attention as ea

    cfg = MoonshineArchConfig(
        name="enc-attn-test", vocab_size=64, hidden_size=64, intermediate_size=96,
        encoder_layers=2, decoder_layers=1, encoder_heads=4, decoder_heads=4,
        encoder_kv_heads=4, decoder_kv_heads=4,
    )
    params = mm.init_params(cfg, jax.random.PRNGKey(0))
    rng = np.random.default_rng(3)
    audio = jnp.asarray(rng.standard_normal((2, 4000)).astype(np.float32) * 0.1)

    orig = ea.encoder_attention
    try:
        # Route the in-scan calls through interpreter mode on CPU.
        ea_interp = lambda q, k, v, m, interpret=True: orig(q, k, v, m, interpret=True)
        ea.encoder_attention = ea_interp
        feats, mask = mm.frontend_apply(params["frontend"], cfg, audio)
        out_k = mm.encoder_apply(params["encoder"], cfg, feats, None, attn_impl="pallas")
    finally:
        ea.encoder_attention = orig
    out_x = mm.encoder_apply(params["encoder"], cfg, feats, None, attn_impl="xla")
    np.testing.assert_allclose(np.asarray(out_k), np.asarray(out_x), atol=1e-4, rtol=1e-4)
