"""Voice cloning tests (reference: zipvoice-tts-test.cpp intent)."""

import numpy as np
import pytest

from moonshine_tpu.models.voice_clone import (
    SAMPLE_RATE,
    CloneConfig,
    VoiceCloner,
    compress_long_pauses,
    compute_mel,
)

SMALL = CloneConfig(dim=64, text_layers=1, fm_layers=1, heads=4)


@pytest.fixture(scope="module")
def cloner():
    import jax

    from moonshine_tpu.models import voice_clone as vc

    params = vc.init_params(SMALL, jax.random.PRNGKey(0))
    return VoiceCloner(params, SMALL)


def make_reference(seconds=2.0):
    t = np.arange(int(SAMPLE_RATE * seconds)) / SAMPLE_RATE
    return (0.2 * np.sin(2 * np.pi * 220 * t)).astype(np.float32)


def test_requires_reference(cloner):
    with pytest.raises(RuntimeError):
        cloner.synthesize("hello")


def test_mel_contract():
    import jax.numpy as jnp

    audio = jnp.asarray(make_reference(1.0))[None]
    mel = np.asarray(compute_mel(audio))
    # 24 kHz / hop 256 -> ~93.75 fps; 100 mel bins.
    assert mel.shape[2] == 100
    assert abs(mel.shape[1] - 24000 // 256) <= 2


def test_clone_synthesis_runs_and_is_deterministic(cloner):
    cloner.set_reference(make_reference(), "testing one two")
    w1 = cloner.synthesize("hello world")
    w2 = cloner.synthesize("hello world")
    assert w1.size > 0
    assert np.isfinite(w1).all()
    assert np.max(np.abs(w1)) <= 1.0
    np.testing.assert_array_equal(w1, w2)  # seeded ODE latent


def test_different_seed_changes_output(cloner):
    cloner.set_reference(make_reference(), "testing one two")
    w1 = cloner.synthesize("hello world")
    cloner.seed = 123
    try:
        w3 = cloner.synthesize("hello world")
    finally:
        cloner.seed = 666
    assert w1.shape == w3.shape
    assert not np.array_equal(w1, w3)


def test_longer_text_longer_audio(cloner):
    cloner.set_reference(make_reference(), "testing one two")
    short = cloner.synthesize("hi")
    long = cloner.synthesize("this is a much longer sentence with many words in it")
    assert long.size > short.size


def test_compress_long_pauses():
    sr = 24000
    speech = 0.3 * np.sin(2 * np.pi * 300 * np.arange(sr // 2) / sr).astype(np.float32)
    silence = np.zeros(sr, np.float32)  # 1 s >> 350 ms cap
    wav = np.concatenate([speech, silence, speech])
    out = compress_long_pauses(wav, sr)
    assert out.size < wav.size
    # Kept silence is about keep_silence_ms.
    assert out.size >= speech.size * 2
    # No pause to trim -> unchanged length.
    out2 = compress_long_pauses(np.concatenate([speech, speech]), sr)
    assert out2.size == speech.size * 2


def test_compress_pauses_edges():
    assert compress_long_pauses(np.zeros(0, np.float32), 24000).size == 0
    tiny = np.ones(100, np.float32) * 0.1
    np.testing.assert_array_equal(compress_long_pauses(tiny, 24000), tiny)
