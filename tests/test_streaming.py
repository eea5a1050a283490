"""Streaming model family tests.

Verifies the reference's streaming contracts (reference:
core/moonshine-streaming-model.cpp): exact chunking-invariance of the
stateful frontend, stable-frame emission arithmetic, incremental-vs-batch
decoder equivalence, and the speculative verify/rollback invariant
(speculative result == greedy result, always — reference: cpp:1244-1316).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from moonshine_tpu.core.config import StreamingConfig
from moonshine_tpu.models import streaming as ms

CFG = StreamingConfig(
    encoder_dim=64,
    decoder_dim=64,
    depth=2,
    nheads=4,
    head_dim=16,
    vocab_size=128,
    frame_len=80,
    total_lookahead=16,
    d_model_frontend=64,
    c1=128,
    c2=64,
    max_seq_len=64,
)


@pytest.fixture(scope="module")
def params():
    return ms.init_params(CFG, jax.random.PRNGKey(0))


def audio_frames(n_frames, seed=0):
    rng = np.random.default_rng(seed)
    return rng.standard_normal(n_frames * CFG.frame_len).astype(np.float32) * 0.1


# -- frontend --------------------------------------------------------------

def run_frontend(params, audio, chunk_frames):
    state = ms.init_state(CFG)
    n = len(audio) // CFG.frame_len
    i = 0
    while i < n:
        step = min(chunk_frames, n - i)
        chunk = jnp.asarray(audio[i * CFG.frame_len : (i + step) * CFG.frame_len])
        state = ms.frontend_step(params, CFG, chunk, state)
        i += step
    return state


def test_frontend_chunking_invariance(params):
    audio = audio_frames(20)
    s_big = run_frontend(params, audio, 20)
    s_small = run_frontend(params, audio, 3)
    s_one = run_frontend(params, audio, 1)
    assert int(s_big.feat_count) == 20
    f_big = np.asarray(s_big.feats[:20])
    np.testing.assert_allclose(np.asarray(s_small.feats[:20]), f_big, atol=1e-5)
    np.testing.assert_allclose(np.asarray(s_one.feats[:20]), f_big, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(s_one.sample_ctx), np.asarray(s_big.sample_ctx), atol=1e-6
    )


def test_frontend_causality(params):
    """Changing future samples must not change past features."""
    a1 = audio_frames(10, seed=1)
    a2 = a1.copy()
    a2[8 * CFG.frame_len :] = 0.5  # perturb last 2 frames
    s1 = run_frontend(params, a1, 10)
    s2 = run_frontend(params, a2, 10)
    np.testing.assert_allclose(
        np.asarray(s1.feats[:8]), np.asarray(s2.feats[:8]), atol=1e-6
    )
    assert not np.allclose(np.asarray(s1.feats[8:10]), np.asarray(s2.feats[8:10]))


# -- encoder emission ------------------------------------------------------

def test_lookahead_holdback(params):
    audio = audio_frames(30)
    state = run_frontend(params, audio, 30)
    state, n = ms.encode(params, CFG, state, is_final=False)
    assert n == 30 - CFG.total_lookahead
    assert int(state.mem_len) == n
    # Finalizing releases the lookahead frames.
    state, n2 = ms.encode(params, CFG, state, is_final=True)
    assert n2 == CFG.total_lookahead
    assert int(state.mem_len) == 30


def test_encode_no_new_frames_noop(params):
    audio = audio_frames(20)
    state = run_frontend(params, audio, 20)
    state, n = ms.encode(params, CFG, state, is_final=False)
    state, n2 = ms.encode(params, CFG, state, is_final=False)
    assert n2 == 0


def test_encode_deterministic_and_emission_counts(params):
    """Same schedule twice -> bit-identical memory; incremental schedules
    emit the same frame counts as one-shot.  (Cross-schedule numerical
    equivalence is a property of *trained* models — the windowed re-encode
    sees different right context per schedule, exactly as the reference's
    does, reference: cpp:596-615.)"""
    audio = audio_frames(64, seed=3)

    def run_oneshot():
        s = run_frontend(params, audio, 64)
        s, _ = ms.encode(params, CFG, s, is_final=True)
        return s

    s1a, s1b = run_oneshot(), run_oneshot()
    np.testing.assert_array_equal(np.asarray(s1a.memory), np.asarray(s1b.memory))

    s2 = ms.init_state(CFG)
    emitted = 0
    for i in range(0, 64, 8):
        chunk = jnp.asarray(audio[i * CFG.frame_len : (i + 8) * CFG.frame_len])
        s2 = ms.frontend_step(params, CFG, chunk, s2)
        s2, n = ms.encode(params, CFG, s2, is_final=False)
        emitted += n
    s2, n = ms.encode(params, CFG, s2, is_final=True)
    emitted += n
    assert emitted == 64
    assert int(s2.mem_len) == int(s1a.mem_len) == 64
    # Cross-KV rows track memory rows 1:1 (layout [L, T, H, hd]).
    k = np.asarray(s2.k_cross)
    assert not np.allclose(k[:, 63], 0)
    assert np.allclose(k[:, 64:], 0)


# -- decoder ---------------------------------------------------------------

def encoded_state(params, n_frames=32, seed=5):
    state = run_frontend(params, audio_frames(n_frames, seed), n_frames)
    state, _ = ms.encode(params, CFG, state, is_final=True)
    return state


def test_decode_incremental_matches_batch(params):
    state = encoded_state(params)
    tokens = jnp.asarray([CFG.bos_id, 5, 9, 17], jnp.int32)

    s_batch = ms.decoder_reset(state)
    logits_batch, _, _ = ms.decode_tokens(params, CFG, tokens, s_batch)

    s_inc = ms.decoder_reset(state)
    outs = []
    for i in range(4):
        lg, s_inc, _ = ms.decode_tokens(params, CFG, tokens[i : i + 1], s_inc)
        outs.append(np.asarray(lg)[0])
    np.testing.assert_allclose(
        np.asarray(logits_batch), np.stack(outs), atol=1e-4, rtol=1e-3
    )


def test_decode_full_greedy(params):
    state = encoded_state(params)
    tokens, _ = ms.decode_full(params, CFG, state, max_tokens=16)
    assert len(tokens) <= 16
    assert CFG.eos_id not in tokens


def test_speculative_matches_greedy_correct_draft(params):
    """Verify-accept with the true previous hypothesis must reproduce the
    greedy result exactly."""
    state = encoded_state(params)
    greedy, _ = ms.decode_full(params, CFG, state, max_tokens=12)
    spec, _ = ms.decode_full(
        params, CFG, state, speculative_tokens=greedy, max_tokens=12
    )
    assert spec == greedy


def test_speculative_matches_greedy_wrong_draft(params):
    """A corrupted draft must diverge-rollback to the exact greedy result."""
    state = encoded_state(params)
    greedy, _ = ms.decode_full(params, CFG, state, max_tokens=12)
    for corrupt_at in (0, 1, len(greedy) // 2, max(len(greedy) - 1, 0)):
        draft = list(greedy)
        if draft:
            draft[corrupt_at] = (draft[corrupt_at] + 7) % CFG.vocab_size
        spec, _ = ms.decode_full(
            params, CFG, state, speculative_tokens=draft, max_tokens=12
        )
        assert spec == greedy, f"divergence at {corrupt_at}"


def test_speculative_partial_draft(params):
    state = encoded_state(params)
    greedy, _ = ms.decode_full(params, CFG, state, max_tokens=12)
    if len(greedy) > 2:
        spec, _ = ms.decode_full(
            params, CFG, state, speculative_tokens=greedy[:2], max_tokens=12
        )
        assert spec == greedy


def test_decoder_reset_preserves_cross_kv(params):
    state = encoded_state(params)
    t1, state = ms.decode_full(params, CFG, state, max_tokens=8)
    state = ms.decoder_reset(state)
    assert int(state.cache_len) == 0
    assert int(state.mem_len) > 0
    t2, _ = ms.decode_full(params, CFG, state, max_tokens=8)
    assert t1 == t2


# -- end-to-end through the Transcriber ------------------------------------

def test_streaming_backend_in_pipeline(params):
    from moonshine_tpu.core.config import TranscriberOptions, VadOptions
    from moonshine_tpu.core.tokenizer import BinTokenizer
    from moonshine_tpu.pipeline.backends import StreamingBackend
    from moonshine_tpu.pipeline.transcriber import Transcriber

    # Tiny byte tokenizer covering the test vocab.
    tokens = [b""] * CFG.vocab_size
    tokens[CFG.bos_id] = b"<s>"
    tokens[CFG.eos_id] = b"</s>"
    for i in range(3, CFG.vocab_size):
        tokens[i] = bytes([97 + (i % 26)])
    tok = BinTokenizer(tokens)

    backend = StreamingBackend(params, CFG, tok)
    options = TranscriberOptions(
        transcription_interval=0.1, vad=VadOptions(threshold=0.0)
    )
    t = Transcriber(backend, options)
    stream = t.create_stream(update_interval=0.2)
    stream.start()
    audio = audio_frames(100, seed=9)  # 0.5 s
    for i in range(0, len(audio), 1600):
        stream.add_audio(audio[i : i + 1600])
    transcript = stream.stop()
    assert len(transcript.lines) == 1
    line = transcript.lines[0]
    assert line.is_complete
    assert line.text is not None


def test_decode_full_fused_matches_host(params):
    """The single-program fused decode must reproduce host decode_full
    exactly: greedy from scratch, correct draft, corrupted draft."""
    state = encoded_state(params, n_frames=32, seed=11)
    greedy, _ = ms.decode_full(params, CFG, state, max_tokens=12)

    def run_fused(draft_list, budget=12):
        draft = np.full(CFG.max_seq_len, CFG.eos_id, np.int32)
        draft[: len(draft_list)] = draft_list
        tokens, count, _ = ms.decode_full_fused(
            params, CFG, state,
            jnp.asarray(draft), jnp.asarray(len(draft_list), jnp.int32),
            jnp.asarray(budget, jnp.int32),
            mem_bucket=ms.mem_bucket_for(int(state.mem_len)),
        )
        return [int(t) for t in np.asarray(tokens)[: int(count)]]

    assert run_fused([]) == greedy
    assert run_fused(greedy) == greedy
    for corrupt_at in (0, len(greedy) // 2, max(len(greedy) - 1, 0)):
        bad = list(greedy)
        if bad:
            bad[corrupt_at] = (bad[corrupt_at] + 7) % CFG.vocab_size
        assert run_fused(bad) == greedy, f"corrupt at {corrupt_at}"
    # Budget respected.
    assert len(run_fused(greedy, budget=3)) <= 3
