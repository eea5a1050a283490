"""Beam search tests (new capability over the greedy-only reference)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from moonshine_tpu.core.config import MoonshineArchConfig
from moonshine_tpu.decoding.beam import beam_decode
from moonshine_tpu.decoding.greedy import greedy_decode
from moonshine_tpu.models import moonshine as mm

CFG = MoonshineArchConfig(
    name="beamtest",
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


@pytest.fixture(scope="module")
def setup():
    params = mm.init_params(CFG, jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    audio = jnp.asarray(rng.standard_normal((2, 4000)).astype(np.float32) * 0.1)
    memory, mask = mm.encode(params, CFG, audio)
    return params, memory, mask


def seq_logprob(params, memory, mask, tokens):
    """Rescore a token sequence: sum log P(t_i | t_<i, memory)."""
    dec = params["decoder"]
    k_cross, v_cross = mm.compute_cross_kv(dec, CFG, memory)
    cache = mm.init_cache(CFG, memory.shape[0], len(tokens) + 1, k_cross, v_cross, mask)
    seq = jnp.asarray([CFG.decoder_start_token_id] + list(tokens), jnp.int32)[None]
    logits, _, _ = mm.decoder_apply(dec, CFG, seq, cache)
    logp = jax.nn.log_softmax(logits[0, :-1].astype(jnp.float32), axis=-1)
    return float(sum(logp[i, t] for i, t in enumerate(tokens)))


def test_beam1_matches_greedy(setup):
    params, memory, mask = setup
    g = greedy_decode(params, CFG, memory, mask, max_tokens=12)
    b = beam_decode(params, CFG, memory, mask, beam_size=1, max_tokens=12, length_penalty=0.0)
    np.testing.assert_array_equal(np.asarray(g.tokens), np.asarray(b.tokens))
    np.testing.assert_array_equal(np.asarray(g.lengths), np.asarray(b.lengths))


def test_beam_score_at_least_greedy(setup):
    params, memory, mask = setup
    g = greedy_decode(params, CFG, memory, mask, max_tokens=10)
    b = beam_decode(params, CFG, memory, mask, beam_size=4, max_tokens=10, length_penalty=0.0)
    for i in range(memory.shape[0]):
        mem_i, mask_i = memory[i : i + 1], mask[i : i + 1]
        g_tokens = [int(t) for t in g.tokens[i, : int(g.lengths[i])]]
        b_tokens = [int(t) for t in b.tokens[i, : int(b.lengths[i])]]
        if not b_tokens and not g_tokens:
            continue
        sg = seq_logprob(params, mem_i, mask_i, g_tokens + [CFG.eos_token_id])
        sb = seq_logprob(params, mem_i, mask_i, b_tokens + [CFG.eos_token_id])
        assert sb >= sg - 1e-4


def test_beam_scores_internally_consistent(setup):
    """The reported (unnormalized-at-alpha-0) score must equal a rescore of
    the returned sequence."""
    params, memory, mask = setup
    b = beam_decode(params, CFG, memory, mask, beam_size=3, max_tokens=8, length_penalty=0.0)
    for i in range(memory.shape[0]):
        n = int(b.lengths[i])
        tokens = [int(t) for t in b.tokens[i, :n]]
        if n == 8:
            # Unterminated hypothesis: score covers only emitted tokens.
            expected = seq_logprob(params, memory[i : i + 1], mask[i : i + 1], tokens)
        else:
            expected = seq_logprob(
                params, memory[i : i + 1], mask[i : i + 1], tokens + [CFG.eos_token_id]
            )
        assert abs(float(b.scores[i]) - expected) < 5e-3


def test_beam_token_caps(setup):
    params, memory, mask = setup
    caps = jnp.asarray([3, 5], jnp.int32)
    b = beam_decode(params, CFG, memory, mask, beam_size=3, max_tokens=10, token_caps=caps)
    assert int(b.lengths[0]) <= 3
    assert int(b.lengths[1]) <= 5


def test_beam_batch_independence(setup):
    params, memory, mask = setup
    b_both = beam_decode(params, CFG, memory, mask, beam_size=3, max_tokens=8)
    b_first = beam_decode(
        params, CFG, memory[:1], mask[:1], beam_size=3, max_tokens=8
    )
    np.testing.assert_array_equal(
        np.asarray(b_both.tokens[0]), np.asarray(b_first.tokens[0])
    )


def test_beam_k_fold_matches_expanded_cross(setup):
    """decoder_apply(beam_k=k) on UNEXPANDED cross caches must equal the
    plain path on per-beam-expanded caches — the exactness claim behind
    the beam cross-KV dedup (beams fold into the query-token axis)."""
    params, memory, mask = setup
    dec = params["decoder"]
    b, k = memory.shape[0], 3
    bk = b * k
    k_cross, v_cross = mm.compute_cross_kv(dec, CFG, memory)

    rng = np.random.default_rng(1)
    tokens = jnp.asarray(rng.integers(0, CFG.vocab_size, (bk, 4)), jnp.int32)

    # Reference: caches expanded to one row per beam, beam_k=1.
    kc_x = jnp.repeat(k_cross, k, axis=1)
    vc_x = jnp.repeat(v_cross, k, axis=1)
    mask_x = jnp.repeat(mask, k, axis=0)
    cache_x = mm.init_cache(CFG, bk, 8, kc_x, vc_x, mask_x)
    ref_logits, ref_cache, _ = mm.decoder_apply(dec, CFG, tokens, cache_x)

    # Dedup: unexpanded caches, beams folded via beam_k.
    cache_u = mm.init_cache(CFG, bk, 8, k_cross, v_cross, mask)
    got_logits, got_cache, _ = mm.decoder_apply(dec, CFG, tokens, cache_u, beam_k=k)

    np.testing.assert_allclose(
        np.asarray(got_logits), np.asarray(ref_logits), rtol=1e-5, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(got_cache.k_self), np.asarray(ref_cache.k_self), rtol=1e-6, atol=1e-6
    )


def test_beam_kv_int8_close_to_float(setup):
    """Beam with int8 KV (scales gathered alongside the caches in the
    parent reorder) tracks the float-KV beam closely: same top beams on
    most elements, and every returned sequence rescoreable."""
    params, memory, mask = setup
    b_f = beam_decode(params, CFG, memory, mask, beam_size=3, max_tokens=8,
                      length_penalty=0.0)
    b_q = beam_decode(params, CFG, memory, mask, beam_size=3, max_tokens=8,
                      length_penalty=0.0, kv_int8=True)
    # Scores of the quantized run must rescore within int8 noise.
    for i in range(memory.shape[0]):
        n = int(b_q.lengths[i])
        tokens = [int(t) for t in b_q.tokens[i, :n]]
        seq = tokens if n == 8 else tokens + [CFG.eos_token_id]
        expected = seq_logprob(params, memory[i : i + 1], mask[i : i + 1], seq)
        # float rescoring of the int8-searched sequence: near the float
        # beam's score (quantization may pick a near-tie neighbor).
        assert float(b_q.scores[i]) <= float(b_f.scores[i]) + 0.05
        assert abs(float(b_q.scores[i]) - expected) < 0.25
