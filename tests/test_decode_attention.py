"""Flash-decode attention kernel: interpreter-mode correctness vs oracle.

The compiled kernel runs on TPU in production; these tests pin semantics
on CPU via the Pallas interpreter.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from moonshine_tpu.ops.decode_attention import (
    flash_decode_attention,
    reference_decode_attention,
)


@pytest.mark.parametrize("t", [7, 256, 417, 512, 600])
def test_matches_oracle_lengths(t):
    key = jax.random.PRNGKey(0)
    b, h, hd = 3, 8, 52
    q = jax.random.normal(key, (b, h, hd), jnp.float32)
    k = jax.random.normal(jax.random.PRNGKey(1), (b, t, h, hd), jnp.float32)
    v = jax.random.normal(jax.random.PRNGKey(2), (b, t, h, hd), jnp.float32)
    lengths = jnp.asarray([t, max(t // 2, 1), 1], jnp.int32)
    ref = np.asarray(reference_decode_attention(q, k, v, lengths))
    out = np.asarray(flash_decode_attention(q, k, v, lengths, interpret=True))
    np.testing.assert_allclose(out, ref, atol=2e-5, rtol=1e-4)


def test_bfloat16_inputs():
    key = jax.random.PRNGKey(3)
    b, t, h, hd = 2, 300, 4, 64
    q = jax.random.normal(key, (b, h, hd), jnp.bfloat16)
    k = jax.random.normal(key, (b, t, h, hd), jnp.bfloat16)
    v = jax.random.normal(key, (b, t, h, hd), jnp.bfloat16)
    lengths = jnp.asarray([t, 10], jnp.int32)
    ref = np.asarray(reference_decode_attention(q, k, v, lengths)).astype(np.float32)
    out = np.asarray(flash_decode_attention(q, k, v, lengths, interpret=True)).astype(np.float32)
    np.testing.assert_allclose(out, ref, atol=3e-2, rtol=3e-2)
