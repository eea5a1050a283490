"""ONNX reader/executor + real-weight model tests.

These are the repo's first REAL-DATA accuracy tests: the reference ships
runnable fp32 ONNX weights in-tree (reference: micro/models/README.md),
and labeled audio in test-assets/ — so exactness is measured, not assumed.

The headline assertion: SpellingCNN top-1 on the 220-clip captured set
equals the reference's published 90.91% (micro/models/README.md
"Held-out `captured` (220 real clips): 90.91% top-1").
"""

from __future__ import annotations

import glob
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

REF = "/root/reference"
SPELLING_ONNX = f"{REF}/micro/models/spelling_cnn_mel.onnx"
TINYVAD_ONNX = f"{REF}/micro/models/tinyvad_cnn_speech_mel.onnx"
ALPHA_DIR = f"{REF}/test-assets/alphanumeric"

needs_ref = pytest.mark.skipif(
    not os.path.exists(SPELLING_ONNX), reason="reference assets not mounted"
)


def test_onnx_roundtrip(tmp_path):
    from moonshine_tpu.core.onnx_io import load_onnx, save_onnx

    tensors = {
        "w": np.random.RandomState(0).randn(3, 4, 5).astype(np.float32),
        "b": np.arange(7, dtype=np.int64),
        "s": np.float16([1.5, -2.25]),
    }
    path = str(tmp_path / "t.onnx")
    save_onnx(path, tensors)
    g = load_onnx(path)
    assert set(g.initializers) == set(tensors)
    for k, v in tensors.items():
        np.testing.assert_array_equal(g.initializers[k], v)


@needs_ref
def test_parse_real_models():
    from moonshine_tpu.core.onnx_io import load_onnx

    g = load_onnx(SPELLING_ONNX)
    assert g.inputs == [("log_mel", ["batch", 1, 64, 128])]
    assert g.outputs == [("logits", ["batch", 51])]
    g2 = load_onnx(TINYVAD_ONNX)
    assert g2.inputs == [("log_mel", ["batch", 1, 32, 16])]


def test_stft_matches_torch():
    """Framing/padding/windowing of the Slaney mel frontend is exact."""
    torch = pytest.importorskip("torch")
    from moonshine_tpu.ops.mel import _dft_basis_periodic

    rng = np.random.RandomState(1)
    audio = rng.randn(6000).astype(np.float32)
    n_fft, hop = 512, 125
    ref = torch.stft(
        torch.from_numpy(audio), n_fft=n_fft, hop_length=hop,
        window=torch.hann_window(n_fft, periodic=True), center=True,
        pad_mode="reflect", return_complex=True,
    )
    ref_power = (ref.abs() ** 2).numpy()  # [bins, T]
    pad = n_fft // 2
    padded = np.pad(audio, (pad, pad), mode="reflect")
    n_frames = 1 + (len(padded) - n_fft) // hop
    idx = np.arange(n_frames)[:, None] * hop + np.arange(n_fft)[None, :]
    spec = padded[idx] @ _dft_basis_periodic(n_fft)
    nb = n_fft // 2 + 1
    power = spec[:, :nb] ** 2 + spec[:, nb:] ** 2
    np.testing.assert_allclose(power.T, ref_power[:, :n_frames], rtol=1e-4, atol=1e-4)


@needs_ref
def test_spelling_cnn_real_accuracy():
    """Top-1 on the captured set == the reference's published 200/220."""
    from moonshine_tpu.audio.wav import load_wav
    from moonshine_tpu.models.spelling import CLASSES_51, SpellingOnnx

    m = SpellingOnnx.from_onnx(SPELLING_ONNX)
    files = sorted(glob.glob(f"{ALPHA_DIR}/*/*.wav"))
    assert len(files) == 220
    labels, clips = [], []
    for f in files:
        labels.append(f.split("/")[-2])
        audio, sr = load_wav(f)
        assert sr == 16000 and len(audio) == 16000
        clips.append(audio)
    batch = jnp.asarray(np.stack(clips))
    logits = np.concatenate(
        [np.asarray(m.logits(batch[i : i + 55])) for i in range(0, 220, 55)]
    )
    preds = [CLASSES_51[i] for i in logits.argmax(-1)]
    correct = sum(p == l for p, l in zip(preds, labels))
    assert correct == 200, f"expected exactly 200/220, got {correct}"


@needs_ref
def test_tinyvad_real_speech():
    from moonshine_tpu.audio.wav import load_wav
    from moonshine_tpu.models.vad import TinyVad

    vad = TinyVad.from_onnx(TINYVAD_ONNX)
    audio, sr = load_wav(f"{REF}/test-assets/two_cities_16k.wav")
    n = (len(audio) // 512) * 512
    hops = jnp.asarray(audio[:n].reshape(1, -1, 512))
    probs, _ = vad.predict_hops(hops, vad.init_state(1))
    p = np.asarray(probs[0])
    # Continuously-read speech: mostly voiced, but with real pauses.
    assert 0.55 < (p > 0.5).mean() < 0.9
    # Chunked processing is state-exact vs one shot.
    st = vad.init_state(1)
    outs = []
    for i in range(0, 100, 7):
        pr, st = vad.predict_hops(hops[:, i : i + 7], st)
        outs.append(np.asarray(pr))
    chunked = np.concatenate(outs, axis=1)
    np.testing.assert_allclose(p[: chunked.shape[1]], chunked[0], atol=1e-5)


@needs_ref
def test_tinyvad_segmenter_real_speech():
    """Real speech through TinyVad + the hysteresis segmenter yields sane
    segment boundaries (replaces synthetic-only oracles; reference:
    core/transcriber-test.cpp asserts real two_cities transcripts)."""
    from moonshine_tpu.audio.wav import load_wav
    from moonshine_tpu.models.vad import TinyVad
    from moonshine_tpu.pipeline.vad_segmenter import VadSegmenter

    vad = TinyVad.from_onnx(TINYVAD_ONNX)
    audio, _ = load_wav(f"{REF}/test-assets/two_cities_16k.wav")
    seg = VadSegmenter(vad.hop_prob_fn())
    seg.start()
    # Feed in ~0.5 s updates like a live stream.
    for i in range(0, len(audio), 8000):
        seg.process_audio(audio[i : i + 8000])
    seg.stop()
    segs = seg.segments
    assert 1 <= len(segs) <= 12
    total_speech = sum(s.end_time - s.start_time for s in segs)
    dur = len(audio) / 16000.0
    assert 0.4 * dur < total_speech <= dur + 0.5
    assert all(s.is_complete for s in segs)


@needs_ref
def test_spelling_cnn_int8_deploy_artifact_accuracy_neutral():
    """The int8-deploy 'shrunk' export scores the same 200/220.

    The reference publishes that its int8 export is accuracy-neutral vs
    fp32 on the captured set (reference: micro/models/README.md:63-65,
    spelling_cnn_mel.shrunk.onnx — the compact int8-weight desktop
    artifact).  Loading it through the same ONNX->XLA interpreter (the
    int8 weights dequantize via the graph's own Cast/Mul pattern) must
    reproduce that claim exactly.
    """
    from moonshine_tpu.eval.alphanumeric import evaluate_cnn

    out = evaluate_cnn(ALPHA_DIR, f"{REF}/micro/models/spelling_cnn_mel.shrunk.onnx")
    assert out["total"] == 220
    assert out["correct"] == 200, out["correct"]
