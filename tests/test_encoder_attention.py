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

    orig = ea.encoder_attention_packed
    try:
        # Route the in-scan calls through interpreter mode on CPU.
        def ea_interp(q, kt, v, m, heads, interpret=True):
            return orig(q, kt, v, m, heads=heads, interpret=True)

        ea.encoder_attention_packed = ea_interp
        feats, mask = mm.frontend_apply(params["frontend"], cfg, audio)
        out_k = mm.encoder_apply(params["encoder"], cfg, feats, None, attn_impl="pallas")
    finally:
        ea.encoder_attention_packed = orig
    out_x = mm.encoder_apply(params["encoder"], cfg, feats, None, attn_impl="xla")
    np.testing.assert_allclose(np.asarray(out_k), np.asarray(out_x), atol=1e-4, rtol=1e-4)


def test_packed_kernel_matches_xla_attention():
    """The packed-layout kernel (ops/encoder_attention.py second
    generation: [B,T,H*hd] blocks, in-VMEM head slices, K dim-major)
    equals the split-head XLA attention, masked and unmasked."""
    from moonshine_tpu.ops.encoder_attention import encoder_attention_packed

    rng = np.random.default_rng(4)
    B, T, H, hd = 3, 31, 4, 20
    q, k, v = (_rand(rng, B, T, H, hd) for _ in range(3))
    qp = q.reshape(B, T, H * hd)
    ktp = jnp.swapaxes(k.reshape(B, T, H * hd), 1, 2)
    vp = v.reshape(B, T, H * hd)

    ref = _attention(q, k, v, None).reshape(B, T, H * hd)
    out = encoder_attention_packed(qp, ktp, vp, None, heads=H, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=1e-4)

    lengths = np.array([31, 12, 1])
    fm = jnp.asarray(np.arange(T)[None, :] < lengths[:, None])
    ref_m = _attention(q, k, v, fm[:, None, None, :]).reshape(B, T, H * hd)
    out_m = encoder_attention_packed(qp, ktp, vp, fm, heads=H, interpret=True)
    for b, n in enumerate(lengths):
        np.testing.assert_allclose(
            np.asarray(out_m)[b, :n], np.asarray(ref_m)[b, :n],
            atol=2e-5, rtol=1e-4,
        )


def test_packed_sharded_matches_xla_on_mesh():
    """Packed kernel under shard_map: whole-head lane blocks over the
    model axis, batch over data."""
    import pytest

    from moonshine_tpu.ops.encoder_attention import (
        encoder_attention_packed_sharded,
    )
    from moonshine_tpu.parallel.mesh import make_mesh

    if len(jax.devices()) < 8:
        pytest.skip("needs the virtual 8-device mesh")
    mesh = make_mesh(data=4, model=2)
    b, t, h, hd = 8, 64, 4, 16
    rng = np.random.default_rng(5)
    q, k, v = (_rand(rng, b, t, h, hd) for _ in range(3))
    mask = jnp.asarray(rng.random((b, t)) > 0.2)

    qp = q.reshape(b, t, h * hd)
    ktp = jnp.swapaxes(k.reshape(b, t, h * hd), 1, 2)
    vp = v.reshape(b, t, h * hd)
    out = encoder_attention_packed_sharded(
        qp, ktp, vp, mask, h, mesh, interpret=True)
    ref = _attention(q, k, v, mask[:, None, None, :]).reshape(b, t, h * hd)
    got = np.asarray(out)
    refn = np.asarray(ref)
    valid = np.asarray(mask)
    np.testing.assert_allclose(got[valid], refn[valid], atol=2e-5, rtol=1e-4)


def test_sharded_kernel_matches_xla_on_mesh():
    """encoder_attention under shard_map (batch over data, heads over
    model) equals the XLA path — the GSPMD-kept-kernel contract
    (round-2 SCALING.md caveat closed)."""
    import jax
    import numpy as np
    import jax.numpy as jnp

    from moonshine_tpu.ops.encoder_attention import encoder_attention_sharded
    from moonshine_tpu.parallel.mesh import make_mesh

    if len(jax.devices()) < 8:
        import pytest

        pytest.skip("needs the virtual 8-device mesh")
    mesh = make_mesh(data=4, model=2)
    b, t, h, hd = 8, 96, 4, 16
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((b, t, h, hd)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, t, h, hd)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, t, h, hd)), jnp.float32)
    mask = jnp.asarray(rng.random((b, t)) > 0.2)

    out = encoder_attention_sharded(q, k, v, mask, mesh, interpret=True)

    # XLA oracle with identical masking semantics.
    scale = hd ** -0.5
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k) * scale
    logits = jnp.where(mask[:, None, None, :], logits, -1e9)
    w = jax.nn.softmax(logits, axis=-1)
    ref = jnp.einsum("bhqk,bkhd->bqhd", w, v)

    got = np.asarray(out)
    refn = np.asarray(ref)
    valid = np.asarray(mask)
    np.testing.assert_allclose(
        got[valid], refn[valid], atol=2e-5, rtol=1e-4
    )


def test_encode_with_shmap_attention_matches_xla_encode():
    """Full encode() with attn_impl='pallas_shmap' on a DPxTP mesh equals
    the plain XLA encode."""
    import jax
    import numpy as np
    import jax.numpy as jnp
    import pytest

    from moonshine_tpu.core.config import MoonshineArchConfig
    from moonshine_tpu.models import moonshine as mm
    from moonshine_tpu.parallel.mesh import make_mesh

    if len(jax.devices()) < 8:
        pytest.skip("needs the virtual 8-device mesh")
    mesh = make_mesh(data=4, model=2)
    cfg = MoonshineArchConfig(
        name="t", vocab_size=128, hidden_size=64, intermediate_size=128,
        encoder_layers=2, decoder_layers=2, encoder_heads=4, decoder_heads=4,
        encoder_kv_heads=4, decoder_kv_heads=4,
    )
    params = mm.init_params(cfg, jax.random.PRNGKey(0))
    audio = jnp.asarray(
        np.random.default_rng(1).standard_normal((8, 8000)) * 0.1, jnp.float32
    )
    ref, _ = mm.encode(params, cfg, audio)
    got, _ = mm.encode(
        params, cfg, audio, attn_impl="pallas_shmap", mesh=mesh, interpret=True
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=5e-5, rtol=1e-4)
