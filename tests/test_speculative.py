"""Cross-model speculative decoding tests.

Core invariant: output is bit-identical to the verifier's own greedy
decode, regardless of what the draft model proposes (reference analog:
core/speculative-decode-bench.cpp compares greedy vs speculative time —
correctness there is implicit; here it's asserted).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from moonshine_tpu.core.config import MoonshineArchConfig
from moonshine_tpu.decoding.greedy import greedy_decode
from moonshine_tpu.decoding.speculative import speculative_decode
from moonshine_tpu.models import moonshine as mm

VERIFY_CFG = MoonshineArchConfig(
    name="verify",
    vocab_size=128,
    hidden_size=64,
    intermediate_size=128,
    encoder_layers=2,
    decoder_layers=2,
    encoder_heads=4,
    decoder_heads=4,
    encoder_kv_heads=4,
    decoder_kv_heads=4,
)
DRAFT_CFG = MoonshineArchConfig(
    name="draft",
    vocab_size=128,
    hidden_size=32,
    intermediate_size=64,
    encoder_layers=1,
    decoder_layers=1,
    encoder_heads=4,
    decoder_heads=4,
    encoder_kv_heads=4,
    decoder_kv_heads=4,
)


@pytest.fixture(scope="module")
def setup():
    vparams = mm.init_params(VERIFY_CFG, jax.random.PRNGKey(0))
    dparams = mm.init_params(DRAFT_CFG, jax.random.PRNGKey(1))
    rng = np.random.default_rng(0)
    audio = jnp.asarray(rng.standard_normal((1, 4000)).astype(np.float32) * 0.1)
    v_mem, v_mask = mm.encode(vparams, VERIFY_CFG, audio)
    d_mem, d_mask = mm.encode(dparams, DRAFT_CFG, audio)
    return vparams, dparams, v_mem, v_mask, d_mem, d_mask


@pytest.mark.parametrize("gamma", [1, 2, 4, 7])
def test_matches_verifier_greedy(setup, gamma):
    vparams, dparams, v_mem, v_mask, d_mem, d_mask = setup
    g = greedy_decode(vparams, VERIFY_CFG, v_mem, v_mask, max_tokens=16)
    s = speculative_decode(
        dparams, DRAFT_CFG, vparams, VERIFY_CFG,
        d_mem, d_mask, v_mem, v_mask, gamma=gamma, max_tokens=16,
    )
    np.testing.assert_array_equal(np.asarray(s.tokens), np.asarray(g.tokens[0]))
    assert int(s.length) == int(g.lengths[0])


def test_self_draft_accepts_everything(setup):
    """Draft == verifier: every proposal must be accepted (one verify call
    per gamma tokens)."""
    vparams, _, v_mem, v_mask, _, _ = setup
    s = speculative_decode(
        vparams, VERIFY_CFG, vparams, VERIFY_CFG,
        v_mem, v_mask, v_mem, v_mask, gamma=4, max_tokens=16,
    )
    g = greedy_decode(vparams, VERIFY_CFG, v_mem, v_mask, max_tokens=16)
    np.testing.assert_array_equal(np.asarray(s.tokens), np.asarray(g.tokens[0]))
    n = int(s.length)
    calls = int(s.verify_calls)
    # Perfect acceptance: ceil(n / (gamma+1)) verify calls suffice.
    assert calls <= -(-n // 4) + 1
    assert int(s.accepted_draft_tokens) >= n - calls


@pytest.mark.parametrize("gamma", [2, 4])
def test_batched_matches_per_lane_greedy(gamma):
    """B=3 lanes with different audio lengths: every lane's output is
    bit-identical to the verifier's own greedy decode of that lane."""
    from moonshine_tpu.decoding.speculative import speculative_decode_batched

    vparams = mm.init_params(VERIFY_CFG, jax.random.PRNGKey(0))
    dparams = mm.init_params(DRAFT_CFG, jax.random.PRNGKey(1))
    rng = np.random.default_rng(2)
    audio = jnp.asarray(rng.standard_normal((3, 6000)).astype(np.float32) * 0.1)
    lengths = jnp.asarray([6000, 4000, 2500], jnp.int32)
    v_mem, v_mask = mm.encode(vparams, VERIFY_CFG, audio, lengths)
    d_mem, d_mask = mm.encode(dparams, DRAFT_CFG, audio, lengths)

    g = greedy_decode(vparams, VERIFY_CFG, v_mem, v_mask, max_tokens=16)
    s = speculative_decode_batched(
        dparams, DRAFT_CFG, vparams, VERIFY_CFG,
        d_mem, d_mask, v_mem, v_mask, gamma=gamma, max_tokens=16,
    )
    np.testing.assert_array_equal(np.asarray(s.tokens), np.asarray(g.tokens))
    np.testing.assert_array_equal(np.asarray(s.lengths), np.asarray(g.lengths))


def test_batched_int8_cross_kv_close_to_float():
    """kv_int8=True (int8 cross caches, fused dequant) decodes the same
    sequences as the float path for a well-separated self-draft pair —
    the bench's trained-pair phase runs this configuration."""
    from moonshine_tpu.decoding.speculative import speculative_decode_batched

    vparams = mm.init_params(VERIFY_CFG, jax.random.PRNGKey(0))
    dparams = mm.init_params(DRAFT_CFG, jax.random.PRNGKey(1))
    rng = np.random.default_rng(5)
    audio = jnp.asarray(rng.standard_normal((2, 4000)).astype(np.float32) * 0.1)
    v_mem, v_mask = mm.encode(vparams, VERIFY_CFG, audio)
    d_mem, d_mask = mm.encode(dparams, DRAFT_CFG, audio)
    s8 = speculative_decode_batched(
        dparams, DRAFT_CFG, vparams, VERIFY_CFG,
        d_mem, d_mask, v_mem, v_mask, gamma=4, max_tokens=16, kv_int8=True,
    )
    # int8 greedy is the reference's quantized-decode arithmetic; its
    # output must match the verifier's own int8-cache greedy decode.
    g8 = greedy_decode(vparams, VERIFY_CFG, v_mem, v_mask, max_tokens=16,
                       kv_int8=True)
    np.testing.assert_array_equal(np.asarray(s8.tokens), np.asarray(g8.tokens))


def test_batched_self_draft_accepts_everything():
    """Draft == verifier at B=2: near-perfect acceptance, few rounds."""
    from moonshine_tpu.decoding.speculative import speculative_decode_batched

    vparams = mm.init_params(VERIFY_CFG, jax.random.PRNGKey(0))
    rng = np.random.default_rng(3)
    audio = jnp.asarray(rng.standard_normal((2, 4000)).astype(np.float32) * 0.1)
    v_mem, v_mask = mm.encode(vparams, VERIFY_CFG, audio)
    s = speculative_decode_batched(
        vparams, VERIFY_CFG, vparams, VERIFY_CFG,
        v_mem, v_mask, v_mem, v_mask, gamma=4, max_tokens=16,
    )
    g = greedy_decode(vparams, VERIFY_CFG, v_mem, v_mask, max_tokens=16)
    np.testing.assert_array_equal(np.asarray(s.tokens), np.asarray(g.tokens))
    n_max = int(np.max(np.asarray(s.lengths)))
    # Perfect acceptance: ceil(n / (gamma+1)) lockstep rounds suffice.
    assert int(s.rounds) <= -(-n_max // 4) + 1


def test_batched_respects_token_caps():
    from moonshine_tpu.decoding.speculative import speculative_decode_batched

    vparams = mm.init_params(VERIFY_CFG, jax.random.PRNGKey(0))
    dparams = mm.init_params(DRAFT_CFG, jax.random.PRNGKey(1))
    rng = np.random.default_rng(4)
    audio = jnp.asarray(rng.standard_normal((2, 4000)).astype(np.float32) * 0.1)
    v_mem, v_mask = mm.encode(vparams, VERIFY_CFG, audio)
    d_mem, d_mask = mm.encode(dparams, DRAFT_CFG, audio)
    caps = jnp.asarray([3, 9], jnp.int32)
    s = speculative_decode_batched(
        dparams, DRAFT_CFG, vparams, VERIFY_CFG,
        d_mem, d_mask, v_mem, v_mask, gamma=4, max_tokens=16, token_caps=caps,
    )
    g = greedy_decode(vparams, VERIFY_CFG, v_mem, v_mask, max_tokens=16, token_caps=caps)
    np.testing.assert_array_equal(np.asarray(s.tokens), np.asarray(g.tokens))
    assert np.all(np.asarray(s.lengths) <= np.asarray(caps))


def test_telemetry_consistent(setup):
    vparams, dparams, v_mem, v_mask, d_mem, d_mask = setup
    s = speculative_decode(
        dparams, DRAFT_CFG, vparams, VERIFY_CFG,
        d_mem, d_mask, v_mem, v_mask, gamma=3, max_tokens=16,
    )
    # Every emitted token is either an accepted draft token or a correction
    # (one correction max per verify call).
    assert int(s.length) <= int(s.accepted_draft_tokens) + int(s.verify_calls)
