"""Klatt formant TTS engine: unit tests + oracle goldens.

The golden tests compile the UNMODIFIED reference engine in place
(scripts/klatt_oracle, the g2p_oracle pattern) and require waveform-level
agreement: sample counts exact, RMS error a tiny fraction of signal RMS.
The stochastic source (xorshift32 noise, per-cycle jitter/shimmer) is
replayed in draw order, so even the DEFAULT voice matches at the
waveform level (reference: micro/klatt-tts/src/klatt.cc,
synth_internal.cc, synth_stream.cc).
"""

from __future__ import annotations

import pathlib
import subprocess

import numpy as np
import pytest

from moonshine_tpu.tts.klatt import (
    STOP,
    KlattTTS,
    KlattVoice,
    build_segments,
    deterministic_voice,
    tokenize_ipa,
)

ORACLE_DIR = pathlib.Path(__file__).resolve().parents[1] / "scripts" / "klatt_oracle"
REF = pathlib.Path("/root/reference/micro/klatt-tts")


def _oracle():
    if not REF.exists():
        pytest.skip("reference klatt-tts not available")
    exe = ORACLE_DIR / "klatt_oracle"
    if not exe.exists():
        subprocess.run(["bash", str(ORACLE_DIR / "build.sh")], check=True,
                       capture_output=True)
    return exe


def _oracle_render(exe, ipa: str, tmp_path, config: str | None = None,
                   question: bool = False, speed: float | None = None):
    out = tmp_path / "o.f32"
    cmd = [str(exe), "--ipa", ipa, str(out)]
    if config is not None:
        cfg = tmp_path / "v.cfg"
        cfg.write_text(config)
        cmd += ["--config", str(cfg)]
    if question:
        cmd.append("--question")
    if speed is not None:
        cmd += ["--speed", str(speed)]
    subprocess.run(cmd, check=True, capture_output=True)
    return np.fromfile(out, np.float32)


# ---------------------------------------------------------------- units --

def test_tokenize_ipa_expansions():
    # diphthongs + affricates expand; length marks drop; alternates fold
    assert tokenize_ipa("aɪ") == ["ɑ", "ɪ"]
    assert tokenize_ipa("tʃiːz") == ["t", "ʃ", "i", "z"]
    assert tokenize_ipa("ɡɚ") == ["g", "ɝ"]
    assert tokenize_ipa("hɛlˈoʊ") == ["h", "ɛ", "l", "ˈ", "o", "ʊ"]
    assert tokenize_ipa("a b") == ["ɑ", " ", "b"]


def test_build_segments_stop_expansion():
    vp = KlattVoice()
    # voiceless stop -> closure + burst + aspiration (3 segments) between
    # the lead and tail silences
    segs = build_segments(["t"], vp)
    assert len(segs) == 2 + 3
    closure, burst, asp = segs[1:4]
    assert closure.av == 0.0 and closure.af == 0.0
    assert closure.f1 == vp.stop_closure_f1
    assert asp.ah > 0.0 and asp.av == 0.0
    # voiced stop -> closure + burst only, with a voice bar
    segs = build_segments(["d"], vp)
    assert len(segs) == 2 + 2
    assert segs[1].av == vp.stop_closure_av


def test_first_vowel_gets_accent_without_stress_marks():
    vp = KlattVoice()
    segs = build_segments(["h", "ɛ", "l", "ə"], vp)
    vowels = [s for s in segs if s.is_vowel]
    assert vowels[0].accent == 1.0
    assert vowels[1].accent == 0.0


def test_explicit_stress_marks_place_accent():
    vp = KlattVoice()
    segs = build_segments(["h", "ə", "l", "ˈ", "o"], vp)
    vowels = [s for s in segs if s.is_vowel]
    assert vowels[0].accent == 0.0
    assert vowels[1].accent == 1.0


def test_synthesize_basic_properties():
    t = KlattTTS(voice=deterministic_voice())
    pcm = t.synthesize_ipa("sˈɛvən")
    assert pcm.dtype == np.float32
    assert len(pcm) > 10000  # ~0.76 s at 22.05 kHz
    assert float(np.abs(pcm).max()) <= 1.0
    assert float(np.abs(pcm).max()) > 0.05  # actually audible
    # edge fades: first and last samples are silent
    assert abs(pcm[0]) < 1e-6 and abs(pcm[-1]) < 1e-6


def test_speed_scales_duration():
    t = KlattTTS(voice=deterministic_voice())
    slow = t.synthesize_ipa("sˈɛvən", speed=0.5)
    fast = t.synthesize_ipa("sˈɛvən", speed=2.0)
    assert len(slow) > 1.7 * len(fast)


def test_vowel_formant_peak():
    """/i/ must concentrate energy near its F1 (270 Hz) — an acoustic
    sanity check that the cascade actually shapes the spectrum."""
    t = KlattTTS(voice=deterministic_voice())
    pcm = t.synthesize_ipa("i")
    sr = 22050
    mid = pcm[len(pcm) // 4: 3 * len(pcm) // 4]
    spec = np.abs(np.fft.rfft(mid * np.hanning(len(mid))))
    freqs = np.fft.rfftfreq(len(mid), 1.0 / sr)
    band = lambda lo, hi: spec[(freqs >= lo) & (freqs < hi)].mean()
    # F1 band dominates the mid band between F1 and F2
    assert band(200, 380) > 3.0 * band(600, 1500)


def test_text_frontend_path():
    t = KlattTTS()
    pcm = t.synthesize("seven")
    assert len(pcm) > 8000
    assert float(np.abs(pcm).max()) <= 1.0


# -------------------------------------------------------------- goldens --
# Oracle-backed tests compile the reference engine (one-time ~5 s) and
# render several utterances; they live in the slow suite.

DETERMINISTIC_CFG = "jitter 0\nshimmer 0\n"


def _assert_waveform_close(ours: np.ndarray, ref: np.ndarray,
                           rel_rms: float) -> None:
    assert len(ours) == len(ref), (len(ours), len(ref))
    rms_ref = float(np.sqrt((ref.astype(np.float64) ** 2).mean()))
    rms_d = float(np.sqrt(((ours - ref).astype(np.float64) ** 2).mean()))
    assert rms_d < rel_rms * rms_ref, (rms_d, rms_ref)


@pytest.mark.parametrize("ipa", ["sˈɛvən", "hɛlˈoʊ wˈɝld", "mˈuːn ʃˈaɪn"])
@pytest.mark.slow
def test_golden_deterministic_voice(ipa, tmp_path):
    exe = _oracle()
    ref = _oracle_render(exe, ipa, tmp_path, config=DETERMINISTIC_CFG)
    ours = KlattTTS(voice=deterministic_voice()).synthesize_ipa(ipa)
    _assert_waveform_close(ours, ref, 2e-3)


@pytest.mark.slow
def test_golden_default_voice_with_stochastic_source(tmp_path):
    """jitter + shimmer on (the shipped defaults): the RNG replay keeps
    even the stochastic voice waveform-aligned with the oracle."""
    exe = _oracle()
    ipa = "hɛlˈoʊ wˈɝld sˈɛvən"
    ref = _oracle_render(exe, ipa, tmp_path)
    ours = KlattTTS().synthesize_ipa(ipa)
    _assert_waveform_close(ours, ref, 2e-2)


@pytest.mark.slow
def test_golden_question_and_speed(tmp_path):
    exe = _oracle()
    ref = _oracle_render(exe, "sˈɛvən", tmp_path, config=DETERMINISTIC_CFG,
                         question=True, speed=1.5)
    ours = KlattTTS(voice=deterministic_voice()).synthesize_ipa(
        "sˈɛvən", question=True, speed=1.5)
    _assert_waveform_close(ours, ref, 2e-3)


@pytest.mark.slow
def test_golden_nasal_and_fricative_branches(tmp_path):
    """Phones that exercise the gated nasal (m/n/ŋ) and frication (s/ʃ/z)
    branches — the state-freeze gating must match the reference's
    conditional Step() semantics."""
    exe = _oracle()
    ipa = "m ɑ n ʃ i ŋ z"
    ref = _oracle_render(exe, ipa, tmp_path, config=DETERMINISTIC_CFG)
    ours = KlattTTS(voice=deterministic_voice()).synthesize_ipa(ipa)
    _assert_waveform_close(ours, ref, 2e-3)
