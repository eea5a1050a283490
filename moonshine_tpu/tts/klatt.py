"""Klatt-style cascade formant TTS — the micro stack's code-only voice,
rebuilt TPU-native.

Capability mirror of the reference's formant engine (reference:
micro/klatt-tts/src/klatt.cc:181-294 RenderFrame, synth_internal.cc:75-337
segments/tracks/F0, synth_stream.cc:60-168 streaming loudness,
phonemes.cc:22-74 phone table, config.h:24-129 voice defaults,
micro/g2p/src/ipa_tokens.cc TokenizeIpa) — "robotic but understandable"
speech from pure code, no trained weights or CDN assets.

The design splits by hardware affinity instead of porting the per-sample
C++ loop:

* **Control plane (host, exact f32 numpy)** — phone lookup, stop
  expansion, stress/accent assignment, 5 ms frame rasterization, the
  one-pole track smoothers and the phrase-level F0 contour.  A few
  thousand frames; the arithmetic mirrors the reference op-for-op in
  float32 so segment boundaries, smoothing tails and the nasal/frication
  gating masks match the oracle exactly.

* **Stochastic source (host, exact)** — the reference's xorshift32 noise
  stream and per-glottal-cycle jitter/shimmer redraws are replayed in
  draw order (cycle-level loop, vectorized spans), yielding per-sample
  excitation/noise arrays identical to the C++ sequence.

* **Synthesis (TPU, jax)** — every 2-pole section (cascade formants
  F1..F6, nasal pole, frication biquad) is a linear time-varying
  recurrence  y_n = d_n + b_n·y_{n-1} + c_n·y_{n-2}  and is evaluated
  with ``jax.lax.associative_scan`` over per-sample companion matrices:
  O(log N) depth instead of a length-N serial loop, vmap-batched over
  utterances.  Branch gating (the reference only steps the nasal or
  frication filters when active, freezing their state) becomes an
  identity transition matrix on inactive samples — exact, and
  compile-friendly (static shapes, no compaction gathers).

Golden-tested against the reference engine compiled in place as an
oracle (scripts/klatt_oracle/, the g2p_oracle pattern): sample counts
exact, waveform/mel parity on the deterministic voice.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field, replace
from functools import partial
from typing import Sequence

import numpy as np

F32 = np.float32

FRAME_MS = 5.0
PHRASE_BREAK_MS = 120.0

# Phone classes (reference: phonemes.h PhoneClass/Source).
VOWEL, NASAL, STOP, FRICATIVE, APPROXIMANT, LATERAL, SILENCE = range(7)
SRC_VOICED, SRC_VOICELESS, SRC_MIXED, SRC_SILENCE = range(4)


@dataclass(frozen=True)
class Phone:
    ipa: str
    cls: int
    src: int
    f1: float
    f2: float
    f3: float
    b1: float
    b2: float
    b3: float
    dur_ms: float
    fnp: float
    fnz: float
    fric_cf: float
    av: float
    af: float
    ah: float


_BV = (60.0, 90.0, 150.0)   # vowel bandwidths
_BN1, _BN3 = 120.0, 300.0   # nasal b1/b3 (b2 per place)
_BC = (100.0, 150.0, 220.0)  # consonant bandwidths


def _p(ipa, cls, src, f1, f2, f3, b1, b2, b3, dur, fnp, fnz, fric, av, af, ah):
    return Phone(ipa, cls, src, f1, f2, f3, b1, b2, b3, dur, fnp, fnz, fric,
                 av, af, ah)


def default_phone_table() -> list[Phone]:
    """The adult-male phone inventory (reference: phonemes.cc:22-74 —
    Peterson–Barney vowel targets + Klatt locus values; config data)."""
    v, c = _BV, _BC
    return [
        # vowels
        _p("i", VOWEL, SRC_VOICED, 270, 2290, 3010, *v, 130, 0, 0, 0, 1.0, 0, 0),
        _p("ɪ", VOWEL, SRC_VOICED, 383, 2140, 2550, *v, 90, 0, 0, 0, 1.0, 0, 0),
        _p("e", VOWEL, SRC_VOICED, 460, 1990, 2530, *v, 120, 0, 0, 0, 1.0, 0, 0),
        _p("ɛ", VOWEL, SRC_VOICED, 528, 1784, 2480, *v, 110, 0, 0, 0, 1.0, 0, 0),
        _p("æ", VOWEL, SRC_VOICED, 722, 1822, 2410, *v, 150, 0, 0, 0, 1.0, 0, 0),
        _p("ɑ", VOWEL, SRC_VOICED, 747, 994, 2440, *v, 150, 0, 0, 0, 1.0, 0, 0),
        _p("ɔ", VOWEL, SRC_VOICED, 482, 834, 2410, *v, 140, 0, 0, 0, 1.0, 0, 0),
        _p("o", VOWEL, SRC_VOICED, 450, 900, 2300, *v, 120, 0, 0, 0, 1.0, 0, 0),
        _p("ʊ", VOWEL, SRC_VOICED, 440, 1020, 2240, *v, 90, 0, 0, 0, 1.0, 0, 0),
        _p("u", VOWEL, SRC_VOICED, 300, 870, 2240, *v, 130, 0, 0, 0, 1.0, 0, 0),
        _p("ʌ", VOWEL, SRC_VOICED, 582, 1247, 2390, *v, 110, 0, 0, 0, 1.0, 0, 0),
        _p("ɝ", VOWEL, SRC_VOICED, 490, 1350, 1690, *v, 150, 0, 0, 0, 1.0, 0, 0),
        _p("ə", VOWEL, SRC_VOICED, 426, 1498, 2500, *v, 70, 0, 0, 0, 1.0, 0, 0),
        # stops (locus + burst centre)
        _p("p", STOP, SRC_VOICELESS, 300, 720, 2200, *c, 90, 0, 0, 1200, 0.0, 0.5, 0.4),
        _p("b", STOP, SRC_VOICED, 300, 720, 2200, *c, 80, 0, 0, 1200, 0.4, 0.4, 0.0),
        _p("t", STOP, SRC_VOICELESS, 300, 1750, 2600, *c, 90, 0, 0, 3800, 0.0, 0.6, 0.4),
        _p("d", STOP, SRC_VOICED, 300, 1750, 2600, *c, 80, 0, 0, 3800, 0.4, 0.5, 0.0),
        _p("k", STOP, SRC_VOICELESS, 300, 1900, 2400, *c, 90, 0, 0, 2200, 0.0, 0.5, 0.5),
        _p("g", STOP, SRC_VOICED, 300, 1900, 2400, *c, 80, 0, 0, 2200, 0.4, 0.45, 0.0),
        # nasals (fnz = place-dependent oral anti-resonance)
        _p("m", NASAL, SRC_VOICED, 220, 1000, 2200, _BN1, 330, _BN3, 80, 250, 1033, 0, 1.0, 0, 0),
        _p("n", NASAL, SRC_VOICED, 220, 1600, 2700, _BN1, 197, _BN3, 80, 250, 1308, 0, 1.0, 0, 0),
        _p("ŋ", NASAL, SRC_VOICED, 220, 2000, 2600, _BN1, 259, _BN3, 80, 250, 2415, 0, 1.0, 0, 0),
        # fricatives
        _p("f", FRICATIVE, SRC_VOICELESS, 300, 1100, 2200, *c, 110, 0, 0, 1827, 0.0, 0.18, 0),
        _p("v", FRICATIVE, SRC_MIXED, 300, 1100, 2200, *c, 80, 0, 0, 1827, 0.25, 0.16, 0),
        _p("θ", FRICATIVE, SRC_VOICELESS, 300, 1400, 2400, *c, 100, 0, 0, 2770, 0.0, 0.16, 0),
        _p("ð", FRICATIVE, SRC_MIXED, 300, 1400, 2400, *c, 70, 0, 0, 2770, 0.25, 0.14, 0),
        _p("s", FRICATIVE, SRC_VOICELESS, 300, 1700, 2600, *c, 120, 0, 0, 5344, 0.0, 0.7, 0),
        _p("z", FRICATIVE, SRC_MIXED, 300, 1700, 2600, *c, 90, 0, 0, 5344, 0.3, 0.5, 0),
        _p("ʃ", FRICATIVE, SRC_VOICELESS, 300, 1800, 2500, *c, 120, 0, 0, 2939, 0.0, 0.75, 0),
        _p("ʒ", FRICATIVE, SRC_MIXED, 300, 1800, 2500, *c, 90, 0, 0, 2939, 0.3, 0.55, 0),
        _p("h", FRICATIVE, SRC_VOICELESS, 500, 1500, 2500, *c, 70, 0, 0, 0, 0.0, 0.0, 0.5),
        # approximants + lateral
        _p("ɹ", APPROXIMANT, SRC_VOICED, 330, 1100, 1600, *_BV, 80, 0, 0, 0, 1.0, 0, 0),
        _p("j", APPROXIMANT, SRC_VOICED, 250, 2300, 3000, *_BV, 70, 0, 0, 0, 1.0, 0, 0),
        _p("w", APPROXIMANT, SRC_VOICED, 290, 610, 2150, *_BV, 80, 0, 0, 0, 1.0, 0, 0),
        _p("l", LATERAL, SRC_VOICED, 360, 1300, 2700, *_BV, 80, 0, 0, 0, 1.0, 0, 0),
        # silences
        _p(" ", SILENCE, SRC_SILENCE, 500, 1500, 2500, *_BV, 60, 0, 0, 0, 0.0, 0, 0),
        _p(".", SILENCE, SRC_SILENCE, 500, 1500, 2500, *_BV, 220, 0, 0, 0, 0.0, 0, 0),
    ]


@dataclass
class KlattVoice:
    """Voice parameters (reference: config.h VoiceParams defaults — the
    shipped tuned voice)."""

    voice_gain: float = 23.49
    fric_gain: float = 0.578
    asp_gain: float = 0.295
    fric_q: float = 1.269
    lf_rd: float = -1.0          # <=0 selects the Rosenberg pulse (default)
    source_tilt_db: float = 0.0
    breath: float = 0.0
    glottal_open: float = 0.40
    glottal_close: float = 0.16
    f4: float = 3500.0
    b4: float = 250.0
    f5: float = 4500.0
    b5: float = 300.0
    f6: float = -1.0             # higher-pole correction; <=0 off
    b6: float = 500.0
    bw_f0_coef: float = 0.0
    formant_scale: float = 1.0
    f0_scale: float = 1.0
    output_gain: float = 0.27
    formant_smooth_ms: float = 21.72
    av_smooth_ms: float = 6.0
    af_attack_ms: float = 16.77
    af_release_ms: float = 8.0
    ah_smooth_ms: float = 5.0
    nasal_smooth_ms: float = 10.0
    f0_start: float = 95.33
    f0_end: float = 92.0
    final_fall_hz: float = 10.0
    f0_flutter_hz: float = 1.82
    jitter: float = 0.0022
    shimmer: float = 0.036
    f0_accent_hz: float = 9.28
    f0_question_rise_hz: float = 25.0
    f0_declination_hz: float = 0.0
    f0_downstep: float = 1.0
    stress_len_scale: float = 1.0
    unstressed_len_scale: float = 1.0
    prepausal_len_scale: float = 1.0
    duration_scale: float = 1.336
    lead_ms: float = 40.0
    tail_ms: float = 70.0
    stop_closure_voiced_ms: float = 61.96
    stop_closure_voiceless_ms: float = 55.0
    stop_burst_ms: float = 14.50
    stop_asp_ms: float = 35.17
    stop_closure_av: float = 0.15
    stop_burst_av: float = 0.20
    stop_closure_f1: float = 220.0
    phones: list[Phone] = field(default_factory=default_phone_table)

    def lookup(self, ipa: str) -> Phone | None:
        for p in self.phones:
            if p.ipa == ipa:
                return p
        return None


def deterministic_voice() -> KlattVoice:
    """The default voice with the stochastic per-cycle perturbations off
    (jitter/shimmer = 0) — the waveform-level golden configuration."""
    return replace(KlattVoice(), jitter=0.0, shimmer=0.0)


# =========================================================================
# IPA tokenizer (reference: micro/g2p/src/ipa_tokens.cc)
# =========================================================================

STRESS_PRIMARY = "ˈ"
STRESS_SECONDARY = "ˌ"

_IPA_RULES: list[tuple[str, tuple[str, ...]]] = [
    ("eɪ", ("e", "ɪ")), ("ɑɪ", ("ɑ", "ɪ")),
    ("aɪ", ("ɑ", "ɪ")), ("ɑʊ", ("ɑ", "ʊ")),
    ("aʊ", ("ɑ", "ʊ")), ("ɔɪ", ("ɔ", "ɪ")),
    ("oʊ", ("o", "ʊ")), ("əʊ", ("o", "ʊ")),
    ("tʃ", ("t", "ʃ")), ("dʒ", ("d", "ʒ")),
    ("ː", ()),  # length mark dropped
    (STRESS_PRIMARY, (STRESS_PRIMARY,)), (STRESS_SECONDARY, (STRESS_SECONDARY,)),
    ("ɡ", ("g",)), ("ɚ", ("ɝ",)), ("ɘ", ("ə",)),
    ("ɐ", ("ʌ",)), ("ɜ", ("ɝ",)), ("ɒ", ("ɔ",)),
    ("ɾ", ("d",)),
    ("ɪ", ("ɪ",)), ("ɛ", ("ɛ",)), ("æ", ("æ",)),
    ("ɑ", ("ɑ",)), ("ɔ", ("ɔ",)), ("ʊ", ("ʊ",)),
    ("ʌ", ("ʌ",)), ("ɝ", ("ɝ",)), ("ə", ("ə",)),
    ("ŋ", ("ŋ",)), ("θ", ("θ",)), ("ð", ("ð",)),
    ("ʃ", ("ʃ",)), ("ʒ", ("ʒ",)), ("ɹ", ("ɹ",)),
    ("a", ("ɑ",)), ("r", ("ɹ",)), ("y", ("j",)), ("g", ("g",)),
    (" ", (" ",)), ("\t", (" ",)), ("\n", (" ",)),
]
_DIRECT_ASCII = set("ieoupbtdkmnfvszhwjl")


def tokenize_ipa(ipa: str) -> list[str]:
    """IPA string -> base phone tokens: diphthongs/affricates expand to
    pairs, alternates fold, stress marks pass through, unknowns drop."""
    out: list[str] = []
    i, n = 0, len(ipa)
    while i < n:
        matched = False
        for pat, emit in _IPA_RULES:
            if ipa.startswith(pat, i):
                out.extend(emit)
                i += len(pat)
                matched = True
                break
        if matched:
            continue
        c = ipa[i]
        if c in _DIRECT_ASCII:
            out.append(c)
        elif c == ".":
            out.append(".")
        i += 1
    return out


# =========================================================================
# Segments + parameter tracks (reference: synth_internal.cc)
# =========================================================================

@dataclass
class Segment:
    dur_ms: float = 0.0
    f1: float = 0.0
    f2: float = 0.0
    f3: float = 0.0
    b1: float = 0.0
    b2: float = 0.0
    b3: float = 0.0
    av: float = 0.0
    af: float = 0.0
    ah: float = 0.0
    nasal: float = 0.0
    fnp: float = 0.0
    fnz: float = 0.0
    fric_cf: float = 0.0
    is_vowel: bool = False
    is_silence: bool = False
    major_pause: bool = False
    accent: float = 0.0


def _seg_from_phone(p: Phone) -> Segment:
    return Segment(
        dur_ms=p.dur_ms, f1=p.f1, f2=p.f2, f3=p.f3, b1=p.b1, b2=p.b2,
        b3=p.b3, av=p.av, af=p.af, ah=p.ah,
        nasal=1.0 if p.cls == NASAL else 0.0, fnp=p.fnp, fnz=p.fnz,
        fric_cf=p.fric_cf, is_vowel=p.cls == VOWEL,
        is_silence=p.cls == SILENCE,
    )


def build_segments(phones: Sequence[str], vp: KlattVoice) -> list[Segment]:
    """Phone tokens -> target segments: stop closure/burst/VOT expansion,
    lead/tail silence, stress/accent with phrase downstep, contextual
    duration (reference: synth_internal.cc:75-174)."""
    sil = vp.lookup(" ")
    if sil is None:
        return []
    out: list[Segment] = []
    lead = _seg_from_phone(sil)
    lead.dur_ms = vp.lead_ms
    out.append(lead)

    has_stress = any(t in (STRESS_PRIMARY, STRESS_SECONDARY) for t in phones)
    pending = 0.0
    word_needs_accent = True
    accents_in_phrase = 0
    for tok in phones:
        if tok == STRESS_PRIMARY:
            pending = 1.0
            continue
        if tok == STRESS_SECONDARY:
            pending = 0.5
            continue
        p = vp.lookup(tok)
        if p is None:
            continue
        if p.cls == SILENCE:
            word_needs_accent = True
            s = _seg_from_phone(p)
            s.major_pause = p.dur_ms >= PHRASE_BREAK_MS
            if s.major_pause:
                accents_in_phrase = 0
            out.append(s)
            continue
        accent = 0.0
        if p.cls == VOWEL:
            if has_stress:
                accent = pending
            elif word_needs_accent:
                accent = 1.0
                word_needs_accent = False
            if accent > 0.0:
                accent *= vp.f0_downstep ** accents_in_phrase
                accents_in_phrase += 1
        pending = 0.0
        if p.cls == STOP:
            voiced = p.src == SRC_VOICED
            closure = _seg_from_phone(p)
            closure.dur_ms = (vp.stop_closure_voiced_ms if voiced
                              else vp.stop_closure_voiceless_ms)
            closure.af = 0.0
            closure.ah = 0.0
            closure.av = vp.stop_closure_av if voiced else 0.0
            closure.f1 = vp.stop_closure_f1
            out.append(closure)
            burst = _seg_from_phone(p)
            burst.dur_ms = vp.stop_burst_ms
            burst.av = vp.stop_burst_av if voiced else 0.0
            burst.ah = 0.0
            out.append(burst)
            if not voiced:
                asp = _seg_from_phone(p)
                asp.dur_ms = vp.stop_asp_ms
                asp.av = 0.0
                asp.af = 0.0
                asp.ah = p.ah
                out.append(asp)
        else:
            s = _seg_from_phone(p)
            s.accent = accent
            out.append(s)

    tail = _seg_from_phone(sil)
    tail.dur_ms = vp.tail_ms
    out.append(tail)

    for s in out:
        if s.is_vowel:
            s.dur_ms *= (vp.stress_len_scale if s.accent > 0.0
                         else vp.unstressed_len_scale)
    for i, s in enumerate(out):
        if s.is_silence:
            continue
        if i + 1 >= len(out) or out[i + 1].is_silence:
            s.dur_ms *= vp.prepausal_len_scale
    return out


def _lround(x: float) -> int:
    """C lround: round half away from zero (np.round is banker's)."""
    return int(math.floor(x + 0.5)) if x >= 0 else -int(math.floor(-x + 0.5))


def _seg_frames(s: Segment, dur_scale: float) -> int:
    return max(1, _lround(s.dur_ms * dur_scale / FRAME_MS))


def _smooth_bidir(v: np.ndarray, tau_ms: float) -> None:
    a = F32(np.exp(F32(-FRAME_MS) / F32(tau_ms)))
    one = F32(1.0)
    for i in range(1, len(v)):
        v[i] = a * v[i - 1] + (one - a) * v[i]
    for i in range(len(v) - 2, -1, -1):
        v[i] = a * v[i + 1] + (one - a) * v[i]


def _smooth_fwd(v: np.ndarray, tau_ms: float) -> None:
    a = F32(np.exp(F32(-FRAME_MS) / F32(tau_ms)))
    one = F32(1.0)
    for i in range(1, len(v)):
        v[i] = a * v[i - 1] + (one - a) * v[i]


def _smooth_asym(v: np.ndarray, attack_ms: float, release_ms: float) -> None:
    a_att = F32(np.exp(F32(-FRAME_MS) / F32(attack_ms)))
    a_rel = F32(np.exp(F32(-FRAME_MS) / F32(release_ms)))
    one = F32(1.0)
    y = v[0]
    for i in range(1, len(v)):
        a = a_att if v[i] > y else a_rel
        y = a * y + (one - a) * v[i]
        v[i] = y


_TRACK_KEYS = ("f1", "f2", "f3", "b1", "b2", "b3", "av", "af", "ah",
               "nasal", "fnp", "fnz", "fric_cf", "accent")


def fill_param_tracks(segs: list[Segment], vp: KlattVoice, dur_scale: float,
                      question: bool) -> dict[str, np.ndarray]:
    """Rasterize segments into 5 ms frames, smooth, and lay the F0 contour
    (reference: synth_internal.cc:232-337; exact f32 arithmetic)."""
    n = sum(_seg_frames(s, dur_scale) for s in segs)
    t = {k: np.zeros(n, F32) for k in _TRACK_KEYS}
    t["f0"] = np.zeros(n, F32)
    major = np.zeros(n, bool)
    k = 0
    for s in segs:
        nf = _seg_frames(s, dur_scale)
        for key in ("f1", "f2", "f3", "b1", "b2", "b3", "av", "af", "ah",
                    "nasal", "fnp", "fnz", "fric_cf"):
            t[key][k:k + nf] = F32(getattr(s, key))
        t["accent"][k:k + nf] = F32(s.accent)
        major[k:k + nf] = s.major_pause
        k += nf
    if n == 0:
        t["major"] = major
        return t

    _smooth_bidir(t["f1"], vp.formant_smooth_ms)
    _smooth_bidir(t["f2"], vp.formant_smooth_ms)
    _smooth_bidir(t["f3"], vp.formant_smooth_ms)
    _smooth_fwd(t["av"], vp.av_smooth_ms)
    _smooth_asym(t["af"], vp.af_attack_ms, vp.af_release_ms)
    _smooth_fwd(t["ah"], vp.ah_smooth_ms)
    _smooth_bidir(t["nasal"], vp.nasal_smooth_ms)
    _smooth_bidir(t["accent"], 45.0)

    f0 = t["f0"]
    f0[:] = F32(vp.f0_end)
    denom = F32(n - 1 if n > 1 else 1)

    def flutter_at(i: int) -> F32:
        if vp.f0_flutter_hz <= 0.0:
            return F32(0.0)
        ts = F32(i) * F32(FRAME_MS / 1000.0)
        fl = (F32(np.sin(F32(2.0 * 3.14159265 * 12.7) * ts))
              + F32(np.sin(F32(2.0 * 3.14159265 * 7.1) * ts))
              + F32(np.sin(F32(2.0 * 3.14159265 * 4.7) * ts)))
        return F32(vp.f0_flutter_hz) * (fl / F32(3.0))

    i = 0
    while i < n:
        if major[i]:
            f0[i] = F32(vp.f0_end) + flutter_at(i)
            i += 1
            continue
        start = i
        while i < n and not major[i]:
            i += 1
        end = i
        length = end - start
        is_last = True
        for m in range(end, n):
            if not major[m] and t["av"][m] > 0.0:
                is_last = False
                break
        for j in range(start, end):
            gfrac = F32(j) / denom
            lf = F32(j - start) / F32(length - 1) if length > 1 else F32(0.0)
            v = F32(vp.f0_start) + (F32(vp.f0_end) - F32(vp.f0_start)) * gfrac
            v = v - lf * F32(vp.f0_declination_hz)
            if lf > F32(0.8):
                e = (lf - F32(0.8)) / F32(0.2)
                if question and is_last:
                    v = v + e * F32(vp.f0_question_rise_hz)
                else:
                    v = v - e * F32(vp.final_fall_hz)
            v = v + flutter_at(j)
            v = v + F32(vp.f0_accent_hz) * t["accent"][j]
            f0[j] = v

    if vp.formant_scale != 1.0:
        fs = F32(vp.formant_scale)
        for key in ("f1", "f2", "f3", "fnp", "fnz", "fric_cf"):
            t[key] *= fs
    if vp.f0_scale != 1.0:
        t["f0"] *= F32(vp.f0_scale)
    t["major"] = major
    return t


# =========================================================================
# Source precompute (host) — glottal phase, xorshift32 stream, per-cycle
# jitter/shimmer (reference: klatt.cc:173-263)
# =========================================================================

def _xorshift_stream(n: int, seed: int = 0x1234567) -> np.ndarray:
    """First ``n`` values of the reference's xorshift32 noise in [-1, 1]."""
    vals = np.empty(n, np.uint32)
    s = seed & 0xFFFFFFFF
    for i in range(n):
        s ^= (s << 13) & 0xFFFFFFFF
        s ^= s >> 17
        s ^= (s << 5) & 0xFFFFFFFF
        vals[i] = s
    return (vals.astype(F32) / F32(2147483648.0)) - F32(1.0)


def _interp_tracks(tracks: dict[str, np.ndarray], spf: int) -> dict[str, np.ndarray]:
    """Per-sample linear interpolation cur->nxt across each frame (exact
    f32 mirror of RenderFrame's per-sample lerp)."""
    n = len(tracks["f0"])
    inv = F32(1.0) / F32(spf)
    tt = (np.arange(spf, dtype=F32) * inv)  # [spf]
    out = {}
    nxt_idx = np.minimum(np.arange(n) + 1, n - 1)
    for key in ("f0", "f1", "f2", "f3", "b1", "b2", "b3", "av", "af", "ah",
                "nasal", "fnp", "fnz", "fric_cf"):
        cur = tracks[key][:, None]  # [n, 1]
        nxt = tracks[key][nxt_idx][:, None]
        out[key] = (cur + (nxt - cur) * tt[None, :]).astype(F32).reshape(-1)
    return out


def _lf_shape(rd: float) -> dict[str, float]:
    """Fant Rd -> LF flow-derivative shape (reference: klatt.cc:94-162)."""
    rd = min(2.7, max(0.3, rd))
    ra = (-1.0 + 4.8 * rd) / 100.0
    rk = (22.4 + 11.8 * rd) / 100.0
    rg = 0.25 * rk / ((0.11 * rd) / (0.5 + 1.2 * rk) - ra)
    tp = 1.0 / (2.0 * rg)
    te = min(0.95, max(tp + 1e-3, tp * (1.0 + rk)))
    ta = max(1e-4, ra)
    tb = 1.0 - te
    wg = math.pi / tp
    eps = 1.0 / ta
    for _ in range(24):
        eps = (1.0 - math.exp(-eps * tb)) / ta
    sin_te, cos_te = math.sin(wg * te), math.cos(wg * te)
    exp_eps_tb = math.exp(-eps * tb)

    def f(a):
        ea = math.exp(a * te)
        aopen = (ea * (a * sin_te - wg * cos_te) + wg) / (a * a + wg * wg)
        ee = -ea * sin_te
        return aopen - (ee / (eps * ta)) * (ta - tb * exp_eps_tb)

    lo, hi = -300.0, 300.0
    flo, fhi = f(lo), f(hi)
    a = 0.0
    if flo * fhi <= 0.0:
        for _ in range(80):
            mid = 0.5 * (lo + hi)
            fm = f(mid)
            if flo * fm <= 0.0:
                hi, fhi = mid, fm
            else:
                lo, flo = mid, fm
        a = 0.5 * (lo + hi)
    ee = -math.exp(a * te) * sin_te
    if not ee > 1e-6:
        ee = 1.0
    return dict(a=a, wg=wg, te=te, eps=eps, ta=ta, tb=tb, ee=ee,
                exp_eps_tb=exp_eps_tb)


def _compute_source(vp: KlattVoice, s: dict[str, np.ndarray],
                    sample_rate: float) -> dict[str, np.ndarray]:
    """Per-sample phase + per-cycle factors + noise assignment, replaying
    the reference's single RNG stream in draw order."""
    n = len(s["f0"])
    voiced = (s["f0"] > F32(1.0)) & (s["av"] > F32(0.0))
    fric_on = s["af"] > F32(0.0)
    breath_on = voiced & (vp.breath > 0.0)

    # draws per sample excluding cycle-wrap draws: [breath?] asp [fric?]
    base = breath_on.astype(np.int64) + 1 + fric_on.astype(np.int64)
    base_cum = np.concatenate([[0], np.cumsum(base)])  # draws before sample i

    inc = np.where(voiced, s["f0"].astype(np.float64) / sample_rate, 0.0)
    inc_cum = np.concatenate([[0.0], np.cumsum(inc)])

    wrap_draws = (1 if vp.jitter > 0 else 0) + (1 if vp.shimmer > 0 else 0)
    # Upper bound on total draws: base + wrap draws per cycle.
    max_cycles = int(inc_cum[-1]) + 2
    stream = _xorshift_stream(int(base_cum[-1]) + wrap_draws * max_cycles + 4)

    phase = np.zeros(n, np.float64)
    shimmer = np.ones(n, F32)

    if wrap_draws == 0:
        # Deterministic voice: wraps consume nothing; phase is the running
        # fractional part of the voiced-increment cumsum.
        phase = np.mod(inc_cum[1:], 1.0)
        draw_off = np.zeros(n + 1, np.int64)
    else:
        draw_off = np.zeros(n + 1, np.int64)  # wrap draws before sample i+1
        cur_phase = 0.0
        jit = 1.0
        shim = 1.0
        k_extra = 0
        sidx = 0
        while sidx < n:
            # Next wrap: first m >= sidx with
            #   cur_phase + jit * (inc_cum[m+1] - inc_cum[sidx]) >= 1.
            need = (1.0 - cur_phase) / jit
            m = int(np.searchsorted(inc_cum, inc_cum[sidx] + need,
                                    side="left")) - 1
            m = max(m, sidx)
            # first m with inc_cum[m+1] - inc_cum[sidx] >= need
            while m < n and inc_cum[m + 1] - inc_cum[sidx] < need:
                m += 1
            end = min(m, n - 1)
            span = slice(sidx, end + 1)
            phase[span] = cur_phase + jit * (inc_cum[sidx + 1:end + 2]
                                             - inc_cum[sidx])
            shimmer[span] = F32(shim)
            if m >= n:
                break
            # Wrap occurs during sample m's advance: subtract 1, redraw.
            phase[m] -= 1.0
            if vp.jitter > 0:
                jit = 1.0 + vp.jitter * float(
                    stream[base_cum[m] + k_extra])
                k_extra += 1
            if vp.shimmer > 0:
                shim = 1.0 + vp.shimmer * float(
                    stream[base_cum[m] + k_extra])
                k_extra += 1
            shimmer[m] = F32(shim)  # redraw precedes sample m's use
            draw_off[m + 1:] = k_extra
            cur_phase = float(phase[m])
            sidx = m + 1

    # Per-sample draw indices into the stream.  draw_off[i] counts wrap
    # draws before sample i; wrap draws AT sample i are consumed before
    # that sample's base draws (klatt.cc: the redraw happens during the
    # phase advance, ahead of breath/asp/fric).
    wrap_at = np.diff(draw_off)
    start = base_cum[:-1] + draw_off[:-1] + wrap_at

    breath_noise = np.where(breath_on, stream[np.minimum(start, len(stream) - 1)], F32(0.0))
    asp_idx = start + breath_on.astype(np.int64)
    asp_noise = stream[np.minimum(asp_idx, len(stream) - 1)]
    fric_idx = asp_idx + 1
    fric_noise = np.where(fric_on, stream[np.minimum(fric_idx, len(stream) - 1)], F32(0.0))

    return dict(voiced=voiced, phase=phase.astype(F32), shimmer=shimmer,
                breath_noise=breath_noise.astype(F32),
                asp_noise=asp_noise.astype(F32),
                fric_noise=fric_noise.astype(F32))


# =========================================================================
# Filter chain (TPU) — associative-scan linear recurrences
# =========================================================================

def _resonator_coefs(freq, bw, sample_rate):
    """Klatt 2-pole resonator coefficients, unity DC gain
    (reference: klatt.cc:48-53).  Works on numpy or jax arrays."""
    import jax.numpy as jnp

    t = 1.0 / sample_rate
    c = -jnp.exp(-2.0 * jnp.pi * bw * t)
    b = 2.0 * jnp.exp(-jnp.pi * bw * t) * jnp.cos(2.0 * jnp.pi * freq * t)
    a = 1.0 - b - c
    return a, b, c


def _linrec2(d, b, c):
    """y_n = d_n + b_n y_{n-1} + c_n y_{n-2}, y_{-1}=y_{-2}=0 — exact
    parallel evaluation via associative_scan over companion matrices."""
    import jax
    import jax.numpy as jnp

    A = jnp.stack([
        jnp.stack([b, c], axis=-1),
        jnp.stack([jnp.ones_like(b), jnp.zeros_like(b)], axis=-1),
    ], axis=-2)  # [n, 2, 2]
    v = jnp.stack([d, jnp.zeros_like(d)], axis=-1)  # [n, 2]

    def comb(l, r):
        A1, v1 = l
        A2, v2 = r
        return (jnp.einsum("...ij,...jk->...ik", A2, A1),
                jnp.einsum("...ij,...j->...i", A2, v1) + v2)

    _, vs = jax.lax.associative_scan(comb, (A, v), axis=0)
    return vs[..., 0]


def _gated_shift2(x, active):
    """Gated 2-deep input history: returns (x1, x2) per sample, where the
    history only advances on active samples (frozen otherwise) — the
    reference's conditional Step() state semantics."""
    import jax
    import jax.numpy as jnp

    # state s = [x1, x2]; active: s' = [x, x1]; inactive: s' = s.
    a = active.astype(x.dtype)
    A = jnp.stack([
        jnp.stack([1 - a, jnp.zeros_like(a)], axis=-1),
        jnp.stack([a, 1 - a], axis=-1),
    ], axis=-2)  # [..., n(?), 2, 2] built below via moveaxis like _linrec2
    v = jnp.stack([a * x, jnp.zeros_like(x)], axis=-1)

    def comb(l, r):
        A1, v1 = l
        A2, v2 = r
        return (jnp.einsum("...ij,...jk->...ik", A2, A1),
                jnp.einsum("...ij,...j->...i", A2, v1) + v2)

    _, vs = jax.lax.associative_scan(comb, (A, v), axis=0)
    # vs[n] is the state AFTER sample n; the filter reads the state BEFORE.
    x1 = jnp.concatenate([jnp.zeros_like(vs[:1, 0]), vs[:-1, 0]], axis=0)
    x2 = jnp.concatenate([jnp.zeros_like(vs[:1, 1]), vs[:-1, 1]], axis=0)
    return x1, x2


def _gated_linrec2(d, b, c, active):
    """Like _linrec2 but the recurrence only advances on active samples
    (state frozen when inactive; d must be 0 there)."""
    import jax
    import jax.numpy as jnp

    a = active.astype(d.dtype)
    A = jnp.stack([
        jnp.stack([a * b + (1 - a), a * c], axis=-1),
        jnp.stack([a, 1 - a], axis=-1),
    ], axis=-2)
    v = jnp.stack([a * d, jnp.zeros_like(d)], axis=-1)

    def comb(l, r):
        A1, v1 = l
        A2, v2 = r
        return (jnp.einsum("...ij,...jk->...ik", A2, A1),
                jnp.einsum("...ij,...j->...i", A2, v1) + v2)

    _, vs = jax.lax.associative_scan(comb, (A, v), axis=0)
    return vs[..., 0]


def _render_jax(params: dict, vp_scalars: dict, sample_rate: float):
    """The per-sample synthesis math on device: sources are precomputed
    arrays; every IIR section is an associative-scan recurrence."""
    import jax.numpy as jnp

    p = {k: jnp.asarray(v) for k, v in params.items()}
    g = vp_scalars
    sr = sample_rate

    f0, av = p["f0"], p["av"]
    voiced = p["voiced"]
    phase = p["phase"]

    # --- voiced source ---------------------------------------------------
    if g["lf_rd"] > 0.0:
        sh = _lf_shape(g["lf_rd"])
        open_part = jnp.exp(sh["a"] * phase) * jnp.sin(sh["wg"] * phase) / sh["ee"]
        ret = -(1.0 / (sh["eps"] * sh["ta"])) * (
            jnp.exp(-sh["eps"] * (phase - sh["te"])) - sh["exp_eps_tb"])
        exc = jnp.where(phase < sh["te"], open_part, ret)
        open_frac = sh["te"]
        exc = jnp.where(voiced, exc, 0.0)
    else:
        op, cl = g["glottal_open"], g["glottal_close"]
        gp = jnp.where(
            phase < op,
            0.5 * (1.0 - jnp.cos(jnp.pi * phase / op)),
            jnp.where(phase < op + cl,
                      jnp.cos(jnp.pi * (phase - op) / (2.0 * cl)), 0.0))
        gp = jnp.where(voiced, gp, 0.0)
        prev = jnp.concatenate([jnp.zeros_like(gp[..., :1]), gp[..., :-1]], axis=-1)
        prev = jnp.where(
            jnp.concatenate([jnp.zeros_like(voiced[..., :1]), voiced[..., :-1]],
                            axis=-1), prev, 0.0)
        exc = jnp.where(voiced, gp - prev, 0.0)
        open_frac = op

    # source spectral tilt (one-pole, reset on unvoiced)
    if g["tilt_c"] > 0.0:
        tc = g["tilt_c"]
        a_t = jnp.where(voiced, tc, 0.0)
        d_t = jnp.where(voiced, (1.0 - tc) * exc, 0.0)
        # y = d + a*y1 — a first-order gated recurrence (c = 0)
        exc = _gated_linrec2(d_t, a_t, jnp.zeros_like(a_t), jnp.ones_like(voiced))
    voiced_sig = exc * av * g["voice_gain"] * p["shimmer"]
    breath_sig = 0.0
    if g["breath"] > 0.0:
        gate = jnp.where(phase < open_frac, 1.0, 0.25)
        breath_sig = (p["breath_noise"] * g["breath"] * av * gate
                      * g["voice_gain"] * 0.5)
        breath_sig = jnp.where(voiced, breath_sig, 0.0)

    asp = p["asp_noise"] * p["ah"] * g["asp_gain"]
    casc = voiced_sig + breath_sig + asp

    # --- nasal branch (state frozen while nasal == 0) --------------------
    nasal = p["nasal"]
    n_active = nasal > 0.0
    za, zb, zc = _antiresonator_coefs(p["fnz"], 100.0, sr)
    x1, x2 = _gated_shift2(casc, n_active)
    nz = za * casc + zb * x1 + zc * x2
    pa, pb, pc = _resonator_coefs(p["fnp"], 100.0, sr)
    d_np = jnp.where(n_active, pa * nz, 0.0)
    npole = _gated_linrec2(d_np, pb, pc, n_active)
    casc = jnp.where(n_active, casc + nasal * (npole - casc), casc)

    # --- cascade F1..F5 (+F6), per-sample coefficients -------------------
    bw_scale = 1.0
    if g["bw_f0_coef"] > 0.0:
        bw_scale = jnp.where(f0 > 100.0,
                             1.0 + g["bw_f0_coef"] * (f0 - 100.0) / 100.0, 1.0)
    x = casc
    for freq, bw in ((p["f1"], p["b1"] * bw_scale),
                     (p["f2"], p["b2"] * bw_scale),
                     (p["f3"], p["b3"] * bw_scale)):
        a, b, c = _resonator_coefs(freq, bw, sr)
        x = _linrec2(a * x, b, c)
    for freq, bw in ((g["f4"], g["b4"]), (g["f5"], g["b5"])):
        a, b, c = _resonator_coefs(jnp.full_like(f0, freq),
                                   jnp.full_like(f0, bw), sr)
        x = _linrec2(a * x, b, c)
    if g["f6"] > 0.0:
        a, b, c = _resonator_coefs(jnp.full_like(f0, g["f6"]),
                                   jnp.full_like(f0, g["b6"]), sr)
        x = _linrec2(a * x, b, c)

    # --- frication branch (RBJ band-pass, state frozen while af == 0) ----
    af = p["af"]
    f_active = af > 0.0
    b0, b2c, a1, a2 = _bandpass_coefs(p["fric_cf"], g["fric_q"], sr)
    fx1, fx2 = _gated_shift2(p["fric_noise"], f_active)
    d_f = jnp.where(f_active, b0 * p["fric_noise"] + b2c * fx2, 0.0)
    fric_y = _gated_linrec2(d_f, -a1, -a2, f_active)
    fric_out = jnp.where(f_active, fric_y * af * g["fric_gain"], 0.0)

    return x + fric_out


def _antiresonator_coefs(freq, bw, sample_rate):
    import jax.numpy as jnp

    t = 1.0 / sample_rate
    rc = -jnp.exp(-2.0 * jnp.pi * bw * t)
    rb = 2.0 * jnp.exp(-jnp.pi * bw * t) * jnp.cos(2.0 * jnp.pi * freq * t)
    ra = 1.0 - rb - rc
    return 1.0 / ra, -rb / ra, -rc / ra


def _bandpass_coefs(freq, q, sample_rate):
    import jax.numpy as jnp

    q = jnp.maximum(q, 0.1) if hasattr(q, "shape") else max(q, 0.1)
    w0 = 2.0 * jnp.pi * freq / sample_rate
    cw, sw = jnp.cos(w0), jnp.sin(w0)
    alpha = sw / (2.0 * q)
    a0 = 1.0 + alpha
    return alpha / a0, -alpha / a0, (-2.0 * cw) / a0, (1.0 - alpha) / a0


def _soft_clip(x: np.ndarray) -> np.ndarray:
    knee, rng = F32(0.8), F32(0.2)
    a = np.abs(x)
    shaped = np.sign(x) * (knee + rng * np.tanh((a - knee) / rng))
    return np.where(a <= knee, x, shaped).astype(F32)


class KlattTTS:
    """Formant TTS voice: IPA (or text via the package G2P) -> PCM.

    ``synthesize_ipa`` mirrors the reference's StreamSynth pipeline
    end-to-end (segments -> tracks -> Klatt core -> fixed gain + soft
    limiter + 5 ms edge fades); ``synthesize`` feeds it from
    tts.g2p.GraphemeToPhonemizer (pause/clause marks map to the
    engine's silence phones)."""

    def __init__(self, voice: KlattVoice | None = None,
                 sample_rate: float = 22050.0):
        self.voice = voice or KlattVoice()
        self.sample_rate = float(sample_rate)
        self._g2p = None

    # -- front ends -------------------------------------------------------
    def synthesize(self, text: str, speed: float = 1.0,
                   question: bool = False) -> np.ndarray:
        if self._g2p is None:
            from .g2p import GraphemeToPhonemizer

            self._g2p = GraphemeToPhonemizer()
        ipa = self._g2p.text_to_ipa(text)
        ipa = ipa.replace("‖", " . ").replace("|", " ")
        if question is False and text.rstrip().endswith("?"):
            question = True
        return self.synthesize_ipa(ipa, speed=speed, question=question)

    def synthesize_ipa(self, ipa: str, speed: float = 1.0,
                       question: bool = False) -> np.ndarray:
        phones = tokenize_ipa(ipa)
        return self.synthesize_phones(phones, speed=speed, question=question)

    def synthesize_phones(self, phones: Sequence[str], speed: float = 1.0,
                          question: bool = False) -> np.ndarray:
        vp = self.voice
        segs = build_segments(phones, vp)
        if not segs:
            return np.zeros(0, F32)
        dur_scale = vp.duration_scale * (1.0 / speed if speed > 0.01 else 1.0)
        tracks = fill_param_tracks(segs, vp, dur_scale, question)
        return self._render(tracks)

    # -- synthesis --------------------------------------------------------
    def _render(self, tracks: dict[str, np.ndarray]) -> np.ndarray:
        vp = self.voice
        sr = self.sample_rate
        spf = max(1, _lround(sr * FRAME_MS / 1000.0))
        s = _interp_tracks(tracks, spf)
        src = _compute_source(vp, s, sr)
        params = {**{k: v for k, v in s.items()}, **src}

        tilt_c = _tilt_coef(vp.source_tilt_db, sr)
        g = dict(
            voice_gain=vp.voice_gain, fric_gain=vp.fric_gain,
            asp_gain=vp.asp_gain, fric_q=vp.fric_q, lf_rd=vp.lf_rd,
            glottal_open=vp.glottal_open, glottal_close=vp.glottal_close,
            tilt_c=tilt_c, breath=vp.breath,
            f4=vp.f4 * vp.formant_scale, b4=vp.b4,
            f5=vp.f5 * vp.formant_scale, b5=vp.b5,
            f6=vp.f6 * vp.formant_scale if vp.f6 > 0 else vp.f6, b6=vp.b6,
            bw_f0_coef=vp.bw_f0_coef,
        )
        import jax

        pcm = np.asarray(jax.jit(
            partial(_render_jax, vp_scalars=g, sample_rate=sr))(params),
            F32)

        # Streaming loudness stage (reference: synth_stream.cc:60-168):
        # fixed gain -> soft limiter -> 5 ms edge fades.
        pcm = _soft_clip(pcm * F32(vp.output_gain))
        total = len(pcm)
        fade = min(total // 2, int(sr * 0.005))
        if fade > 0:
            gi = np.arange(total, dtype=F32)
            ramp_in = np.minimum(gi / F32(fade), F32(1.0))
            tail = (F32(total - 1) - gi) / F32(fade)
            ramp_out = np.where(gi + fade >= total, tail, F32(1.0))
            pcm = (pcm * ramp_in * ramp_out).astype(F32)
        return pcm

    def synthesize_batch(self, ipas: Sequence[str], speed: float = 1.0
                         ) -> list[np.ndarray]:
        """Convenience batch loop (per-utterance device programs; track
        lengths differ per utterance)."""
        outs = [self.synthesize_ipa(s, speed=speed) for s in ipas]
        return outs


def _tilt_coef(tilt_db: float, sample_rate: float) -> float:
    """One-pole low-pass coefficient for `tilt_db` down at 3 kHz
    (reference: klatt.cc:29-44)."""
    if tilt_db <= 0.01:
        return 0.0
    g = 10.0 ** (-tilt_db / 20.0)
    w = 2.0 * math.pi * 3000.0 / sample_rate
    cw = math.cos(w)
    A = 1.0 - g * g
    B = -2.0 + 2.0 * g * g * cw
    C = 1.0 - g * g
    if abs(A) < 1e-9:
        return 0.0
    disc = B * B - 4.0 * A * C
    if disc < 0.0:
        return 0.0
    root = (-B - math.sqrt(disc)) / (2.0 * A)
    return root if 0.0 < root < 1.0 else 0.0
