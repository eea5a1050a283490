"""Trained STREAMING model through the serving stack to exact transcripts.

The flagship family end-to-end with weights that know the audio: train the
streaming parameterization (train/streaming_step.py — gradients flow
through the real stateful frontend / windowed encoder / incremental
cross-KV path), then require that
  (a) the api.Transcriber StreamingBackend (speculative verify + greedy
      continue, chunked ingest) and
  (b) the batched multi-stream StreamingService (the twin implementation
      one chip serves hundreds of streams with)
both reproduce the trained transcripts verbatim on real speech.  Any
divergence between the training-time forward, the single-stream serving
path, and the batched service twin breaks the text equality.
"""

from __future__ import annotations

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # training-heavy (fast/slow split, conftest)

import jax
import jax.numpy as jnp
import optax

import moonshine_tpu as mt
from moonshine_tpu.audio.wav import load_wav
from moonshine_tpu.core.config import StreamingConfig
from moonshine_tpu.core.tokenizer import BinTokenizer
from moonshine_tpu.models import streaming as ms
from moonshine_tpu.train.streaming_step import make_overfit_step

CFG = StreamingConfig(
    encoder_dim=64, decoder_dim=64, depth=2, nheads=4, head_dim=16,
    vocab_size=32768, d_model_frontend=32, c1=48, c2=64, max_seq_len=64,
    encoder_depth=2,
)

CLIP_SECONDS = 2.56  # 512 frames at 200 frames/s
LABELS = [
    "It was the best of times,",
    "it was the worst of times,",
]


@pytest.fixture(scope="module")
def trained(tokenizer_bin_path, two_cities_path):
    tok = BinTokenizer.from_file(tokenizer_bin_path)
    audio, _sr = load_wav(two_cities_path)
    n = int(CLIP_SECONDS * 16000) // CFG.frame_len * CFG.frame_len
    clips = [audio[:n], audio[n : 2 * n]]

    budget = int(CLIP_SECONDS * 6.5) - 2
    examples = []
    labels = []
    for clip, phrase in zip(clips, LABELS):
        toks = tok.text_to_tokens(phrase)
        while len(toks) > budget:
            phrase = phrase.rsplit(" ", 1)[0]
            toks = tok.text_to_tokens(phrase)
        labels.append(tok.tokens_to_text(np.asarray(toks)))
        s = len(toks) + 1
        examples.append((
            jnp.asarray(clip, jnp.float32),
            jnp.asarray([CFG.bos_id] + list(toks), jnp.int32),
            jnp.asarray(list(toks) + [CFG.eos_id], jnp.int32),
            jnp.ones((s,), bool),
        ))

    opt = optax.adam(2e-3)
    params = ms.init_params(CFG, jax.random.PRNGKey(0))
    opt_state = opt.init(params)
    step = make_overfit_step(CFG, opt, examples)
    loss = float("inf")
    for i in range(600):
        params, opt_state, loss = step(params, opt_state)
        if (i + 1) % 25 == 0 and float(loss) < 0.02:
            break
    assert float(loss) < 0.05, f"failed to overfit streaming model: {loss}"
    return params, labels, clips


def test_streaming_backend_pipeline_exact(trained, tokenizer_bin_path):
    """api.Transcriber with the streaming backend: chunked live ingest of
    real speech -> trained text on the completed line."""
    params, labels, clips = trained
    t = mt.Transcriber(
        model=CFG, tokenizer_path=tokenizer_bin_path,
        options=mt.TranscriberOptions(
            vad=mt.VadOptions(threshold=0.0, max_segment_duration=CLIP_SECONDS + 0.01)
        ),
    ).with_params(params).load()

    stream = t.create_stream(update_interval=0.0)
    stream.start()
    both = np.concatenate(clips)
    for i in range(0, len(both), 8000):  # 0.5 s live chunks
        stream.add_audio(both[i : i + 8000])
        stream.update_transcription()
    transcript = stream.stop()
    got = [l.text.strip() for l in transcript.lines[: len(labels)]]
    assert got == [lab.strip() for lab in labels]


def test_streaming_service_batched_exact(trained, tokenizer_bin_path):
    """Batched StreamingService (multi-stream twin): both clips in parallel
    slots -> each final event carries its trained text."""
    from moonshine_tpu.serving import StreamingService

    params, labels, clips = trained
    tok = BinTokenizer.from_file(tokenizer_bin_path)
    svc = StreamingService(
        params, CFG, tokenizer=tok, n_streams=2,
        update_frames=64, mem_bucket=512, draft_cap=32,
        max_segment_seconds=CLIP_SECONDS + 0.01,
    )
    finals: dict[int, str] = {}
    for slot, clip in enumerate(clips):
        svc.open_slot(slot)
        svc.add_audio(slot, clip)
        svc.close_slot(slot)
    for _ in range(40):
        for ev in svc.update():
            if ev.is_final:
                finals[ev.slot] = ev.text
        if len(finals) == 2:
            break
    assert [finals[0].strip(), finals[1].strip()] == [l.strip() for l in labels]


def test_streaming_service_int8_kv_exact(trained, tokenizer_bin_path):
    """The batched service with int8 KV caches (fused dequant) must still
    reproduce the trained transcripts — quantized-cache accuracy evidence
    on the flagship family with weights that know the audio."""
    from moonshine_tpu.serving import StreamingService

    params, labels, clips = trained
    tok = BinTokenizer.from_file(tokenizer_bin_path)
    svc = StreamingService(
        params, CFG, tokenizer=tok, n_streams=2,
        update_frames=64, mem_bucket=512, draft_cap=32,
        max_segment_seconds=CLIP_SECONDS + 0.01, kv_int8=True,
    )
    finals: dict[int, str] = {}
    for slot, clip in enumerate(clips):
        svc.open_slot(slot)
        svc.add_audio(slot, clip)
        svc.close_slot(slot)
    for _ in range(40):
        for ev in svc.update():
            if ev.is_final:
                finals[ev.slot] = ev.text
        if len(finals) == 2:
            break
    assert [finals[0].strip(), finals[1].strip()] == [l.strip() for l in labels]
