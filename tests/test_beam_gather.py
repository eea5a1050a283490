"""Pallas beam-reorder gather correctness (interpret mode on CPU)."""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from moonshine_tpu.ops.beam_gather import gather_kv_rows


def test_gather_matches_take():
    rng = np.random.RandomState(0)
    l, b, h, hd, s = 3, 8, 4, 16, 24
    k = jnp.asarray(rng.randn(l, b, h, hd, s).astype(np.float32))
    v = jnp.asarray(rng.randn(l, b, h, hd, s).astype(np.float32))
    # Realistic beam parenting: duplicates and drops, block-local per group.
    idx = jnp.asarray(rng.randint(0, b, size=b).astype(np.int32))
    ko, vo = gather_kv_rows(k, v, idx, interpret=True)
    np.testing.assert_array_equal(np.asarray(ko), np.asarray(jnp.take(k, idx, axis=1)))
    np.testing.assert_array_equal(np.asarray(vo), np.asarray(jnp.take(v, idx, axis=1)))


def test_gather_identity_and_reverse():
    rng = np.random.RandomState(1)
    l, b, h, hd, s = 2, 4, 2, 8, 16
    k = jnp.asarray(rng.randn(l, b, h, hd, s).astype(np.float32))
    v = jnp.asarray(rng.randn(l, b, h, hd, s).astype(np.float32))
    ident = jnp.arange(b, dtype=jnp.int32)
    ko, vo = gather_kv_rows(k, v, ident, interpret=True)
    np.testing.assert_array_equal(np.asarray(ko), np.asarray(k))
    rev = ident[::-1]
    ko, _ = gather_kv_rows(k, v, rev, interpret=True)
    np.testing.assert_array_equal(np.asarray(ko), np.asarray(k[:, ::-1]))


def test_gather_bf16():
    rng = np.random.RandomState(2)
    l, b, h, hd, s = 2, 6, 2, 8, 16
    k = jnp.asarray(rng.randn(l, b, h, hd, s), jnp.bfloat16)
    v = jnp.asarray(rng.randn(l, b, h, hd, s), jnp.bfloat16)
    idx = jnp.asarray(rng.randint(0, b, size=b).astype(np.int32))
    ko, vo = gather_kv_rows(k, v, idx, interpret=True)
    np.testing.assert_array_equal(
        np.asarray(ko, np.float32), np.asarray(jnp.take(k, idx, axis=1), np.float32)
    )


def test_scale_gather_matches_take():
    from moonshine_tpu.ops.beam_gather import gather_scale_rows

    rng = np.random.RandomState(3)
    l, b, h, s = 2, 6, 4, 16
    ks = jnp.asarray(rng.rand(l, b, h, s).astype(np.float32))
    vs = jnp.asarray(rng.rand(l, b, h, s).astype(np.float32))
    idx = jnp.asarray(rng.randint(0, b, size=b).astype(np.int32))
    ko, vo = gather_scale_rows(ks, vs, idx, interpret=True)
    np.testing.assert_array_equal(np.asarray(ko), np.asarray(jnp.take(ks, idx, axis=1)))
    np.testing.assert_array_equal(np.asarray(vo), np.asarray(jnp.take(vs, idx, axis=1)))
