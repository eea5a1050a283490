"""End-to-end realism: real speech -> trained model -> exact transcripts.

The reference's transcriber tests run real models over
``two_cities_16k.wav`` and assert transcript structure (reference:
core/transcriber-test.cpp:31-1120).  With zero egress there are no
pretrained ASR weights here, so this suite goes one step further than
structure: it TRAINS a micro Moonshine on the exact per-line audio the
pipeline produces (real speech, real TinyVadCNN segmentation) and then
asserts the full Transcriber pipeline — VAD, segmenter, backend, line
lifecycle, events — reproduces the trained transcripts **verbatim**, both
offline and through the streaming event path.

This exercises every layer with a model that actually knows the audio:
any frame-math/feature/caching bug between training and serving breaks
the text equality.
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
from moonshine_tpu.core.config import MoonshineArchConfig
from moonshine_tpu.core.tokenizer import BinTokenizer
from moonshine_tpu.train import step as ts

TINYVAD_ONNX = "/root/reference/micro/models/tinyvad_cnn_speech_mel.onnx"

MICRO = MoonshineArchConfig(
    name="micro",
    vocab_size=32768,
    hidden_size=64,
    intermediate_size=256,
    encoder_layers=2,
    decoder_layers=2,
    encoder_heads=4,
    decoder_heads=4,
    encoder_kv_heads=4,
    decoder_kv_heads=4,
)

# Reading-order labels from the book the clip reads (A Tale of Two Cities,
# ch. 1).  The pool is longer than any plausible segmentation; each probe
# segment takes the next phrase, truncated to its token budget.
PHRASES = [
    "It was the best of times, it was the worst of times,",
    "it was the age of wisdom, it was the age of foolishness,",
    "it was the epoch of belief, it was the epoch of incredulity,",
    "it was the season of Light, it was the season of Darkness,",
    "it was the spring of hope, it was the winter of despair,",
    "we had everything before us, we had nothing before us,",
]


@pytest.fixture(scope="module")
def trained(tokenizer_bin_path, two_cities_path):
    """Probe-segment real speech, then overfit the micro model on it."""
    import pathlib

    if not pathlib.Path(TINYVAD_ONNX).exists():
        pytest.skip("reference TinyVadCNN onnx not available")

    tok = BinTokenizer.from_file(tokenizer_bin_path)
    audio, sr = load_wav(two_cities_path)
    clip = audio[: 16000 * 12]

    probe = mt.Transcriber(
        model=MICRO, tokenizer_path=tokenizer_bin_path,
        vad_weights=TINYVAD_ONNX,
    ).load()
    transcript = probe.transcribe(clip)
    lines = [l for l in transcript.lines if l.audio_data is not None and l.is_complete]
    assert len(lines) >= 2, "expected >=2 VAD segments in the first 12 s"
    lines = lines[:3]  # cap training cost

    # Label each segment with the next phrase, trimmed to its token budget
    # (the pipeline caps decoding at duration * max_tokens_per_second).
    examples = []
    for line, phrase in zip(lines, PHRASES):
        budget = max(int(line.duration * MICRO.max_tokens_per_second) - 2, 4)
        toks = tok.text_to_tokens(phrase)
        while len(toks) > budget:
            phrase = phrase.rsplit(" ", 1)[0]
            toks = tok.text_to_tokens(phrase)
        label = tok.tokens_to_text(np.asarray(toks))  # round-trip normalized
        examples.append((np.asarray(line.audio_data, np.float32), toks, label))

    # Teacher-forced batch: pad audio and tokens.
    n_max = max(len(a) for a, _, _ in examples)
    s_max = max(len(t) for _, t, _ in examples) + 1
    B = len(examples)
    batch = ts.Batch(
        audio=jnp.asarray(np.stack([
            np.pad(a, (0, n_max - len(a))) for a, _, _ in examples
        ])),
        audio_lengths=jnp.asarray([len(a) for a, _, _ in examples], jnp.int32),
        tokens_in=jnp.asarray(np.stack([
            np.pad([MICRO.decoder_start_token_id] + list(t), (0, s_max - len(t) - 1))
            for _, t, _ in examples
        ]), jnp.int32),
        tokens_out=jnp.asarray(np.stack([
            np.pad(list(t) + [MICRO.eos_token_id], (0, s_max - len(t) - 1))
            for _, t, _ in examples
        ]), jnp.int32),
        token_mask=jnp.asarray(np.stack([
            np.arange(s_max) <= len(t) for _, t, _ in examples
        ])),
    )

    opt = optax.adam(2e-3)
    state = ts.init_train_state(MICRO, opt, jax.random.PRNGKey(0))
    train_step = ts.make_train_step(MICRO, opt)
    loss = float("inf")
    for i in range(800):
        state, metrics = train_step(state, batch)
        if (i + 1) % 25 == 0:
            loss = float(metrics["loss"])
            if loss < 0.02:
                break
    assert loss < 0.05, f"failed to overfit: loss={loss}"
    labels = [label for _, _, label in examples]
    return state.params, labels, clip, batch


def test_offline_pipeline_exact_transcripts(trained, tokenizer_bin_path):
    params, labels, clip, _ = trained
    t = mt.Transcriber(
        model=MICRO, tokenizer_path=tokenizer_bin_path,
        vad_weights=TINYVAD_ONNX,
    ).with_params(params).load()
    transcript = t.transcribe(clip)
    got = [l.text.strip() for l in transcript.lines[: len(labels)]]
    assert got == [lab.strip() for lab in labels]
    for line in transcript.lines:
        assert line.is_complete
        assert line.audio_data is not None and len(line.audio_data) > 0
        assert line.duration > 0.0


def test_streaming_events_exact_transcripts(trained, tokenizer_bin_path):
    """Feed 0.5 s chunks through a live stream; completed lines must carry
    the trained text and the event contract must hold (LineCompleted
    exactly once per line, with the final text)."""
    params, labels, clip, _ = trained
    t = mt.Transcriber(
        model=MICRO, tokenizer_path=tokenizer_bin_path,
        vad_weights=TINYVAD_ONNX,
    ).with_params(params).load()

    from moonshine_tpu.pipeline.transcriber import TranscriptEventListener

    completed: dict[int, str] = {}

    class Listener(TranscriptEventListener):
        def on_line_completed(self, event):
            assert event.line.id not in completed, "LineCompleted fired twice"
            completed[event.line.id] = event.line.text

    stream = t.create_stream(update_interval=0.0)
    stream.add_listener(Listener())
    stream.start()
    for i in range(0, len(clip), 8000):
        stream.add_audio(clip[i : i + 8000])
        stream.update_transcription()
    transcript = stream.stop()

    finals = [l for l in transcript.lines if l.id in completed]
    assert len(finals) >= len(labels)
    for line in transcript.lines:
        assert completed.get(line.id) == line.text  # event text == snapshot
    got = [completed[l.id].strip() for l in transcript.lines[: len(labels)]]
    assert got == [lab.strip() for lab in labels]


def test_voice_driven_agent_flow(trained, tokenizer_bin_path, tmp_path):
    """The flagship demo loop with real audio: WAV -> VAD -> trained ASR ->
    completed line -> AgentFlow trigger fires (reference: AgentFlow voice
    command recognition, README.md:1516)."""
    from moonshine_tpu.agent.flow import AgentFlow
    from moonshine_tpu.audio.wav import save_wav
    from moonshine_tpu.mic import MicTranscriber, WavSource

    params, labels, clip, _ = trained
    trigger = labels[0].strip().rstrip(",.").lower()

    fired = []

    def on_trigger(d):
        fired.append(d.trigger_phrase)
        yield d.say("heard you")

    said = []
    agent = (
        AgentFlow()
        .use_embeddings(False)  # substring match on the trained transcript
        .speak_with(said.append)
        .listen_for(trigger, on_trigger)
        .load()
    )

    t = mt.Transcriber(
        model=MICRO, tokenizer_path=tokenizer_bin_path,
        vad_weights=TINYVAD_ONNX,
    ).with_params(params).load()

    path = str(tmp_path / "cmd.wav")
    save_wav(path, clip, 16000)
    texts: list[str] = []
    mic = (
        MicTranscriber()
        .use_transcriber(t)
        .update_interval(0.25)
        .audio_source(WavSource(path, pace=False))
        .on_text(lambda text: (texts.append(text), agent.handle_utterance(text)))
    )
    mic.load()
    mic.start()
    mic._thread.join(timeout=300.0)
    mic.stop()

    assert texts, "no completed lines from audio"
    assert fired, f"agent never triggered; heard {texts!r}"
    # The clip's lines share the "it was the ..." prefix, so the substring
    # matcher may fire on several completed lines — each must have spoken.
    assert said == ["heard you"] * len(fired)


def test_int8_weights_preserve_trained_transcripts(trained, tokenizer_bin_path):
    """Per-channel int8 weights on a TRAINED model: the deployed-int8
    arithmetic (fake_quantize_tree) must reproduce the trained transcripts
    verbatim — the reference's accuracy-neutrality claim (README quant
    section, Tiny 4.83% with per-channel) validated on real speech with
    weights that actually know it."""
    from moonshine_tpu.quant import fake_quantize_tree, quantize_tree, tree_nbytes

    params, labels, clip, _ = trained
    params_q = fake_quantize_tree(params)
    t = mt.Transcriber(
        model=MICRO, tokenizer_path=tokenizer_bin_path,
        vad_weights=TINYVAD_ONNX,
    ).with_params(params_q).load()
    transcript = t.transcribe(clip)
    got = [l.text.strip() for l in transcript.lines[: len(labels)]]
    assert got == [lab.strip() for lab in labels]

    # And the storage form really is ~4x smaller.
    stored = quantize_tree(params)
    assert tree_nbytes(stored) < 0.45 * tree_nbytes(params)


def test_int8_kv_preserves_trained_transcripts(trained, tokenizer_bin_path):
    """kv_int8 through the PRODUCT pipeline (TranscriberOptions.kv_int8)
    on the trained model: transcripts verbatim."""
    params, labels, clip, _ = trained
    t = mt.Transcriber(
        model=MICRO, tokenizer_path=tokenizer_bin_path,
        vad_weights=TINYVAD_ONNX,
        options=mt.TranscriberOptions(kv_int8=True),
    ).with_params(params).load()
    transcript = t.transcribe(clip)
    got = [l.text.strip() for l in transcript.lines[: len(labels)]]
    assert got == [lab.strip() for lab in labels]


def test_w8a8_execution_preserves_trained_transcripts(trained, tokenizer_bin_path):
    """TRUE int8 execution (quantize_tree_exec: dynamic int8 activations ×
    int8 weights -> int32 on the MXU path — the reference's MatMulInteger
    arithmetic, not a float simulation) on the trained model: transcripts
    verbatim.  Stronger than the fake-quant test above: the activation
    rounding is real here."""
    from moonshine_tpu.quant import quantize_tree_exec

    params, labels, clip, _ = trained
    t = mt.Transcriber(
        model=MICRO, tokenizer_path=tokenizer_bin_path,
        vad_weights=TINYVAD_ONNX,
    ).with_params(quantize_tree_exec(params)).load()
    transcript = t.transcribe(clip)
    got = [l.text.strip() for l in transcript.lines[: len(labels)]]
    assert got == [lab.strip() for lab in labels]


def test_speculative_cross_model_trained_pair(trained, tokenizer_bin_path):
    """Cross-model speculative decoding with a REAL trained draft/verify
    pair (BASELINE config 4 beyond the random-weight floor/ceiling): a
    half-size draft trained on the same audio proposes, the micro verify
    model accepts — outputs must equal the verify model's own greedy
    decode exactly, and the draft must actually help (accepted draft
    tokens per lane well above the random-pair floor of ~0)."""
    from moonshine_tpu.decoding.greedy import greedy_decode
    from moonshine_tpu.decoding.speculative import speculative_decode_batched
    from moonshine_tpu.models import moonshine as mm

    verify_params, labels, clip, batch = trained

    DRAFT = MoonshineArchConfig(
        name="microdraft",
        vocab_size=MICRO.vocab_size,
        hidden_size=32,
        intermediate_size=128,
        encoder_layers=1,
        decoder_layers=1,
        encoder_heads=4,
        decoder_heads=4,
        encoder_kv_heads=4,
        decoder_kv_heads=4,
    )
    opt = optax.adam(2e-3)
    dstate = ts.init_train_state(DRAFT, opt, jax.random.PRNGKey(1))
    dstep = ts.make_train_step(DRAFT, opt)
    for i in range(800):
        dstate, metrics = dstep(dstate, batch)
        if (i + 1) % 25 == 0 and float(metrics["loss"]) < 0.02:
            break
    draft_params = dstate.params

    audio = batch.audio
    vmem, vmask = mm.encode(verify_params, MICRO, audio, batch.audio_lengths)
    dmem, dmask = mm.encode(draft_params, DRAFT, audio, batch.audio_lengths)

    max_tokens = int(batch.tokens_out.shape[1]) + 4
    ref = greedy_decode(verify_params, MICRO, vmem, vmask, max_tokens=max_tokens)
    spec = speculative_decode_batched(
        draft_params, DRAFT, verify_params, MICRO,
        dmem, dmask, vmem, vmask, gamma=4, max_tokens=max_tokens,
    )
    np.testing.assert_array_equal(np.asarray(spec.tokens), np.asarray(ref.tokens))
    np.testing.assert_array_equal(np.asarray(spec.lengths), np.asarray(ref.lengths))

    accepted = np.asarray(spec.accepted_draft_tokens)
    lengths = np.asarray(spec.lengths)
    # The trained draft must carry real weight: over the whole batch most
    # emitted tokens come from accepted draft proposals (a random-weight
    # pair accepts ~0 — the bench's measured floor).
    assert accepted.sum() >= 0.5 * lengths.sum(), (accepted, lengths)
    # And speculation saved verify passes vs one-token-per-pass greedy.
    assert int(spec.rounds) < int(lengths.max())
