"""WORLD-lite vocoder, TPU-native: all pulses rendered as ONE batched FFT
program.

The reference renders 61-control WORLD-lite frames — f0 (Hz, 0 =
unvoiced), benv[48] (sqrt-power envelope at mel knots), bap[12]
(aperiodicity at mel band centers), 5 ms / 16 kHz — to PCM one pulse at
a time with kissfft on an M33 (reference: micro/neural-tts/src/
worldlite_synth.cc, itself a float port of WORLD Synthesis(),
mmorise/World BSD-3-Clause).  This is the same parameterization and
pulse math re-shaped for a vector machine:

- pulse locations come from the f0 contour alone, so the whole pulse
  plan (positions, fractional shifts, voicing, noise sizes) is computed
  up front in vectorized numpy (``pulse_plan``);
- the mel-knot→513-bin piecewise-linear expansion is a dense matrix
  multiply (``expand_matrices``);
- every pulse's minimum-phase periodic + shaped-noise aperiodic response
  is computed in one batched [P, 1024] rfft/irfft pipeline (``render``),
  then overlap-added with a scatter-add — no per-pulse host loop.

Deliberate divergence from the reference: the noise generator is JAX
PRNG instead of the reference's sequential xorshift32 (bit-exact noise
replication would serialize the batch; the noise is stochastic excitation
by construction).  Everything deterministic — pulse placement, spectra,
minimum phase, mixing — follows the reference math.
"""

from __future__ import annotations

from functools import lru_cache

import numpy as np


@lru_cache(maxsize=1)
def _render_pulses():
    """Lazily jitted batched-pulse renderer (jax imported on first use)."""
    import jax

    return jax.jit(_render_pulses_impl, static_argnames=("y_len",))

SAMPLE_RATE = 16000
FFT_SIZE = 1024
FRAME_SAMPLES = 80  # 5 ms
N_BENV = 48
N_BAP = 12
SPEC_BINS = FFT_SIZE // 2 + 1  # 513
F0_FLOOR = 32.0
UNVOICED_PULSE_HZ = 200.0
MAX_NOISE = FFT_SIZE // 2


def _hz_to_mel(hz):
    return 2595.0 * np.log10(1.0 + np.asarray(hz, np.float64) / 700.0)


def expand_matrices() -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(W_benv [513,48], W_bap [513,12], dc_remover [1024]).

    W maps knot values to FFT bins by mel piecewise-linear interpolation
    (reference: worldlite_synth.cc InitTables / build_map); dc_remover is
    WORLD's GetDCRemover window.
    """

    def build(n_knots):
        W = np.zeros((SPEC_BINS, n_knots), np.float32)
        mel_max = _hz_to_mel(SAMPLE_RATE / 2.0)
        for i in range(SPEC_BINS):
            hz = i * (SAMPLE_RATE / 2.0) / (SPEC_BINS - 1)
            pos = _hz_to_mel(hz) / mel_max * (n_knots - 1)
            idx = min(int(pos), n_knots - 2)
            frac = min(max(pos - idx, 0.0), 1.0)
            W[i, idx] = 1.0 - frac
            W[i, idx + 1] = frac
        return W

    half = np.arange(FFT_SIZE // 2)
    dc = 0.5 - 0.5 * np.cos(2.0 * np.pi * (half + 1.0) / (1.0 + FFT_SIZE))
    total = dc.sum() * 2.0
    dc = dc / total
    dc_remover = np.concatenate([dc, dc[::-1]]).astype(np.float32)
    return build(N_BENV), build(N_BAP), dc_remover


def pulse_plan(f0_frames: np.ndarray) -> dict:
    """Vectorized pulse plan from the frame-rate f0 contour.

    Mirrors the per-sample loop of worldlite_synth.cc Synthesize():
    per-sample f0 interpolation with the voiced/unvoiced selection rules,
    phase accumulation, pulses at 2π wraps, fractional shift from the
    linear crossing.  Returns arrays over pulses.
    """
    f0 = np.asarray(f0_frames, np.float32).copy()
    f0[f0 < F0_FLOOR] = 0.0
    T = len(f0)
    y_len = T * FRAME_SAMPLES
    s = np.arange(y_len)
    ft = s / FRAME_SAMPLES
    t0 = np.minimum(ft.astype(np.int64), T - 1)
    t1 = np.minimum(t0 + 1, T - 1)
    w = ft - t0
    f0_a = f0[t0]
    f0_b = f0[t1]
    va = f0_a > 0.0
    vb = f0_b > 0.0
    voiced_s = np.where(w < 0.5, va, vb)
    f0_s = np.where(
        va & vb,
        f0_a + w * (f0_b - f0_a),
        np.where(voiced_s, np.where(va, f0_a, f0_b), UNVOICED_PULSE_HZ),
    ).astype(np.float64)

    dphi = 2.0 * np.pi * f0_s / SAMPLE_RATE
    phase = np.cumsum(dphi)
    wrapped = np.mod(phase, 2.0 * np.pi)
    pulse = np.zeros(y_len, bool)
    pulse[1:] = np.abs(wrapped[1:] - wrapped[:-1]) > np.pi

    idx = np.nonzero(pulse)[0]  # wrap sample s; pulse sits at s-1
    prev_w = wrapped[idx - 1]
    py1 = prev_w - 2.0 * np.pi
    py2 = wrapped[idx]
    frac = np.where(py2 > py1, -py1 / np.maximum(py2 - py1, 1e-12), 0.0)

    pulse_index = idx - 1
    pt = pulse_index / FRAME_SAMPLES
    pt0 = np.minimum(pt.astype(np.int64), T - 1)
    pt1 = np.minimum(pt0 + 1, T - 1)
    pw = (pt - pt0).astype(np.float32)

    noise = np.minimum(
        (SAMPLE_RATE / f0_s[idx] + 0.5).astype(np.int64), MAX_NOISE
    )
    noise = np.maximum(noise, 1)

    return {
        "pulse_index": pulse_index.astype(np.int64),
        "frac_shift_s": (frac / SAMPLE_RATE).astype(np.float32),
        "voiced": voiced_s[idx],
        "pt0": pt0,
        "pt1": pt1,
        "pw": pw,
        "noise_size": noise,
        "y_len": y_len,
    }


_TABLES: tuple | None = None


def _tables():
    global _TABLES
    if _TABLES is None:
        _TABLES = expand_matrices()
    return _TABLES


def _min_phase(log_amp_half):
    """Batched minimum-phase spectrum from half log-amplitude [P, 513].

    cepstral folding exactly as worldlite_synth.cc MinimumPhase: an
    UNNORMALIZED inverse DFT of the hermitian-even log-amplitude (kissfft
    fftri ≡ N · numpy irfft), fold to causal, forward rfft, complex exp
    with the 1/N compensation.
    """
    import jax.numpy as jnp

    n = FFT_SIZE
    cep = jnp.fft.irfft(log_amp_half, n=n, axis=-1) * n  # kissfft unnormalized
    fold = jnp.concatenate(
        [
            cep[:, :1],
            cep[:, 1 : n // 2] * 2.0,
            cep[:, n // 2 : n // 2 + 1],
            jnp.zeros_like(cep[:, n // 2 + 1 :]),
        ],
        axis=-1,
    )
    spec = jnp.fft.rfft(fold, n=n, axis=-1)
    inv_n = 1.0 / n
    mag = jnp.exp(spec.real * inv_n)
    ph = spec.imag * inv_n
    return mag * jnp.exp(1j * ph)


def _render_pulses_impl(
    spec_pow,  # [T, 513] power envelope per frame
    ap,  # [T, 513] aperiodicity per frame (clipped)
    dc_remover,  # [1024]
    pt0, pt1, pw,  # [P] frame interpolation
    voiced,  # [P] bool
    frac_shift_s,  # [P]
    noise_size,  # [P] int
    pulse_index,  # [P]
    noise_key,
    y_len: int,
):
    import jax
    import jax.numpy as jnp

    eps = 1e-12
    n = FFT_SIZE
    P = pt0.shape[0]

    pow_i = spec_pow[pt0] + pw[:, None] * (spec_pow[pt1] - spec_pow[pt0])
    ap_i = ap[pt0] + pw[:, None] * (ap[pt1] - ap[pt0])
    ap2 = ap_i * ap_i

    # -- periodic component (voiced pulses only) ---------------------------
    log_per = 0.5 * jnp.log(pow_i * (1.0 - ap2) + eps)
    mp = _min_phase(log_per)  # [P, 513] complex
    # fractional time shift: linear phase ramp with the reference's
    # sqrt(1-cos^2) sine convention (theta folded into [0, pi]).
    coef = 2.0 * jnp.pi * frac_shift_s[:, None] * SAMPLE_RATE / n
    bins = jnp.arange(SPEC_BINS)[None, :]
    re2 = jnp.cos(coef * bins)
    im2 = jnp.sqrt(jnp.maximum(1.0 - re2 * re2, 0.0))
    shifted = (mp.real * re2 + mp.imag * im2) + 1j * (mp.imag * re2 - mp.real * im2)
    per = jnp.fft.irfft(shifted, n=n, axis=-1) * n  # kissfft unnormalized
    per = jnp.roll(per, n // 2, axis=-1)  # fftshift
    dc = per[:, n // 2 :].sum(axis=-1, keepdims=True)
    per = per - dc * dc_remover[None, :]
    per = jnp.where(voiced[:, None], per, 0.0)

    # -- aperiodic component ----------------------------------------------
    log_ap = jnp.where(
        voiced[:, None],
        0.5 * jnp.log(pow_i * ap2 + eps),
        0.5 * jnp.log(pow_i + eps),
    )
    mp_ap = _min_phase(log_ap)
    noise = jax.random.normal(noise_key, (P, MAX_NOISE))
    mask = jnp.arange(MAX_NOISE)[None, :] < noise_size[:, None]
    noise = jnp.where(mask, noise, 0.0)
    mean = noise.sum(axis=-1, keepdims=True) / noise_size[:, None]
    noise = jnp.where(mask, noise - mean, 0.0)
    nspec = jnp.fft.rfft(noise, n=n, axis=-1)
    aper = jnp.fft.irfft(mp_ap * nspec, n=n, axis=-1) * n
    aper = jnp.roll(aper, n // 2, axis=-1)

    # -- mix + overlap-add -------------------------------------------------
    resp = (per * jnp.sqrt(noise_size[:, None].astype(jnp.float32)) + aper) / n

    out = jnp.zeros(y_len + 2 * n, jnp.float32)
    # response j lands at sample pulse_index - n/2 + 1 + j; bias by n so
    # negative offsets stay in-range, then slice.
    offs = pulse_index[:, None] + (jnp.arange(n)[None, :] - n // 2 + 1) + n
    out = out.at[offs.reshape(-1)].add(resp.reshape(-1).astype(jnp.float32))
    return out[n : n + y_len]


def render(
    benv: np.ndarray,  # [T, 48] sqrt-power at mel knots
    bap: np.ndarray,  # [T, 12] aperiodicity
    f0_frames: np.ndarray,  # [T] Hz
    gain: float,
    seed: int = 0,
) -> np.ndarray:
    """Frames -> int16 PCM [T*80] at 16 kHz."""
    import jax
    import jax.numpy as jnp

    W_benv, W_bap, dc_remover = _tables()
    plan = pulse_plan(f0_frames)
    if len(plan["pulse_index"]) == 0:
        return np.zeros(plan["y_len"], np.int16)

    amp = np.asarray(benv, np.float32) @ W_benv.T  # [T, 513]
    spec_pow = np.maximum(amp * amp, 1e-12)
    ap = np.clip(np.asarray(bap, np.float32) @ W_bap.T, 0.001, 0.999)

    # Bucket the pulse count and output length so utterances of similar
    # size share one compiled program (padding pulses render into the
    # discarded scatter margin).
    y_len = plan["y_len"]
    y_bucket = -(-y_len // 16384) * 16384
    P = len(plan["pulse_index"])
    Pb = 1 << max(P - 1, 1).bit_length()

    def pad(a, value):
        return np.concatenate([a, np.full(Pb - P, value, a.dtype)])

    pcm = _render_pulses()(
        jnp.asarray(spec_pow), jnp.asarray(ap), jnp.asarray(dc_remover),
        jnp.asarray(pad(plan["pt0"], 0)), jnp.asarray(pad(plan["pt1"], 0)),
        jnp.asarray(pad(plan["pw"], 0.0)),
        jnp.asarray(pad(plan["voiced"], False)),
        jnp.asarray(pad(plan["frac_shift_s"], 0.0)),
        jnp.asarray(pad(plan["noise_size"], 1)),
        # pad pulses land at y_bucket+511: their whole 1024-sample response
        # falls in the discarded upper scatter margin.
        jnp.asarray(pad(plan["pulse_index"], y_bucket + 511)),
        jax.random.PRNGKey(seed), y_len=y_bucket,
    )
    pcm = np.asarray(pcm)[:y_len] * gain * 32767.0
    return np.clip(pcm, -32768, 32767).astype(np.int16)
