

def test_prepare_rotary_params_bit_exact():
    """Folding the pair-swap permutation into the weights at load
    (prepare_rotary_params) must be bit-identical to the in-trace
    column gather, at a partial-rotary arch (Base, factor 0.9)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from moonshine_tpu.core.config import BASE
    from moonshine_tpu.models import moonshine as mm

    p = mm.init_params(BASE, jax.random.PRNGKey(0))
    audio = jax.random.normal(jax.random.PRNGKey(1), (2, 16000),
                              jnp.float32) * 0.1
    m1, _ = mm.encode(p, BASE, audio)
    p2 = mm.prepare_rotary_params(p, BASE)
    assert "q_swapped" in p2["encoder"]["layers"]["attn"]
    m2, _ = mm.encode(p2, BASE, audio)
    np.testing.assert_array_equal(np.asarray(m1), np.asarray(m2))
    # idempotent
    assert mm.prepare_rotary_params(p2, BASE) is p2 or \
        "q_swapped" in mm.prepare_rotary_params(p2, BASE)["encoder"]["layers"]["attn"]
