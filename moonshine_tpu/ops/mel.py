"""Log-mel spectrogram, shared by the spelling CNN, diarization fbank and
TTS mel frontends (reference analogs: kaldi-native-fbank in cpp-annote,
micro/feature-generation/log_mel.cc, zipvoice-mel.h).

Pure JAX: framing via gather, DFT as a matmul against a precomputed real
basis (MXU-friendly — no FFT primitive needed at these sizes), triangular
mel filterbank as a second matmul.
"""

from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np


def hz_to_mel(f: np.ndarray | float) -> np.ndarray:
    return 2595.0 * np.log10(1.0 + np.asarray(f) / 700.0)


def mel_to_hz(m: np.ndarray | float) -> np.ndarray:
    return 700.0 * (10.0 ** (np.asarray(m) / 2595.0) - 1.0)


@lru_cache(maxsize=16)
def mel_filterbank(
    n_mels: int, n_fft: int, sample_rate: int, fmin: float = 0.0, fmax: float | None = None
) -> np.ndarray:
    """[n_fft//2+1, n_mels] triangular (Slaney-style unnormalized) filters."""
    if fmax is None:
        fmax = sample_rate / 2.0
    n_bins = n_fft // 2 + 1
    mel_pts = np.linspace(hz_to_mel(fmin), hz_to_mel(fmax), n_mels + 2)
    hz_pts = mel_to_hz(mel_pts)
    bins = np.floor((n_fft + 1) * hz_pts / sample_rate).astype(int)
    fb = np.zeros((n_bins, n_mels), np.float32)
    for m in range(n_mels):
        lo, c, hi = bins[m], bins[m + 1], bins[m + 2]
        for k in range(lo, c):
            if c > lo:
                fb[k, m] = (k - lo) / (c - lo)
        for k in range(c, hi):
            if hi > c:
                fb[k, m] = (hi - k) / (hi - c)
    return fb


@lru_cache(maxsize=16)
def _dft_basis(n_fft: int) -> np.ndarray:
    """Real-DFT basis with Hann window: [n_fft, 2*(n_fft//2+1)]."""
    n_bins = n_fft // 2 + 1
    t = np.arange(n_fft)
    k = np.arange(n_bins)
    cos = np.cos(2 * np.pi * np.outer(t, k) / n_fft)
    sin = -np.sin(2 * np.pi * np.outer(t, k) / n_fft)
    window = np.hanning(n_fft)[:, None]
    return (np.concatenate([cos, sin], axis=1) * window).astype(np.float32)


# ---------------------------------------------------------------------------
# Slaney-scale variant — exact math of the reference micro frontend
# (reference: micro/feature-generation/src/log_mel.cc:54-160 and
# micro/stt-training/stt_training/features.py: torchaudio MelSpectrogram with
# norm="slaney", mel_scale="slaney", periodic Hann, center reflect padding).
# ---------------------------------------------------------------------------

_F_SP = 200.0 / 3.0
_MIN_LOG_HZ = 1000.0
_MIN_LOG_MEL = _MIN_LOG_HZ / _F_SP  # == 15.0
_LOG_STEP = np.log(6.4) / 27.0


def hz_to_mel_slaney(f):
    f = np.asarray(f, np.float64)
    return np.where(f >= _MIN_LOG_HZ, _MIN_LOG_MEL + np.log(f / _MIN_LOG_HZ) / _LOG_STEP, f / _F_SP)


def mel_to_hz_slaney(m):
    m = np.asarray(m, np.float64)
    return np.where(m >= _MIN_LOG_MEL, _MIN_LOG_HZ * np.exp(_LOG_STEP * (m - _MIN_LOG_MEL)), _F_SP * m)


@lru_cache(maxsize=16)
def mel_filterbank_slaney(
    n_mels: int, n_fft: int, sample_rate: int, fmin: float = 20.0, fmax: float | None = None
) -> np.ndarray:
    """[n_fft//2+1, n_mels] Slaney-scale triangles with Slaney area norm.

    Byte-for-byte mirror of MakeMelFilterbank (reference:
    micro/feature-generation/src/log_mel.cc:120-160): bin frequencies are
    sample_rate/2 * k/(n_freq-1); each triangle is scaled by
    2/(f_right-f_left).
    """
    if fmax is None:
        fmax = sample_rate / 2.0
    n_freq = n_fft // 2 + 1
    mel_pts = np.linspace(hz_to_mel_slaney(fmin), hz_to_mel_slaney(fmax), n_mels + 2)
    hz_pts = mel_to_hz_slaney(mel_pts)
    bin_hz = sample_rate * 0.5 * np.arange(n_freq) / (n_freq - 1)
    fb = np.zeros((n_freq, n_mels), np.float32)
    for m in range(n_mels):
        f_left, f_center, f_right = hz_pts[m], hz_pts[m + 1], hz_pts[m + 2]
        enorm = 2.0 / (f_right - f_left)
        up = (bin_hz - f_left) / (f_center - f_left)
        down = (f_right - bin_hz) / (f_right - f_center)
        w = np.where(bin_hz <= f_center, up, down)
        w = np.where((bin_hz <= f_left) | (bin_hz >= f_right), 0.0, w) * enorm
        fb[:, m] = w.astype(np.float32)
    return fb


@lru_cache(maxsize=16)
def _dft_basis_periodic(n_fft: int) -> np.ndarray:
    """Real-DFT basis with PERIODIC Hann window: [n_fft, 2*(n_fft//2+1)].

    torch.hann_window(periodic=True): w[i] = 0.5 - 0.5 cos(2*pi*i/n)
    (reference: micro/feature-generation/src/log_mel.cc:108-121).
    """
    n_bins = n_fft // 2 + 1
    t = np.arange(n_fft)
    k = np.arange(n_bins)
    cos = np.cos(2 * np.pi * np.outer(t, k) / n_fft)
    sin = -np.sin(2 * np.pi * np.outer(t, k) / n_fft)
    window = (0.5 - 0.5 * np.cos(2 * np.pi * t / n_fft))[:, None]
    return (np.concatenate([cos, sin], axis=1) * window).astype(np.float32)


def _standardize(mel: jnp.ndarray, axes: tuple[int, ...]) -> jnp.ndarray:
    """Per-clip/window mean/std normalisation: Bessel std clamped >= 1e-3
    (reference: micro/feature-generation/src/mel_streamer.cc:115-134)."""
    mean = jnp.mean(mel, axis=axes, keepdims=True)
    std = jnp.std(mel, axis=axes, keepdims=True, ddof=1)
    return (mel - mean) / jnp.maximum(std, 1e-3)


@partial(
    jax.jit,
    static_argnames=("n_fft", "hop", "n_mels", "sample_rate", "target_frames", "fmin", "fmax"),
)
def log_mel_clip(
    audio: jnp.ndarray,  # [B, N]
    n_fft: int = 512,
    hop: int = 125,
    n_mels: int = 64,
    sample_rate: int = 16000,
    target_frames: int = 128,
    fmin: float = 20.0,
    fmax: float | None = None,
    eps: float = 1e-6,
) -> jnp.ndarray:
    """[B, N] waveform -> [B, 1, n_mels, target_frames] normalised log-mel.

    Exact per-clip features the micro models were trained on (reference:
    micro/stt-training/stt_training/features.py): center reflect pad,
    periodic Hann, power spectrum, Slaney filterbank, crop/right-pad to
    target_frames with log(eps), per-clip standardisation.
    """
    pad = n_fft // 2
    padded = jnp.pad(audio, ((0, 0), (pad, pad)), mode="reflect")
    n = padded.shape[-1]
    n_frames = min(1 + (n - n_fft) // hop, target_frames)
    idx = jnp.arange(n_frames)[:, None] * hop + jnp.arange(n_fft)[None, :]
    frames = padded[:, idx]  # [B, T, n_fft]
    basis = jnp.asarray(_dft_basis_periodic(n_fft))
    spec = jnp.einsum("btn,nk->btk", frames, basis, preferred_element_type=jnp.float32)
    n_bins = n_fft // 2 + 1
    re, im = spec[..., :n_bins], spec[..., n_bins:]
    power = re * re + im * im
    fb = jnp.asarray(mel_filterbank_slaney(n_mels, n_fft, sample_rate, fmin, fmax))
    mel = jnp.einsum("btk,km->btm", power, fb, preferred_element_type=jnp.float32)
    mel = jnp.log(mel + eps)  # [B, T, M]
    mel = mel.transpose(0, 2, 1)  # [B, M, T]
    if n_frames < target_frames:
        mel = jnp.pad(
            mel, ((0, 0), (0, 0), (0, target_frames - n_frames)),
            constant_values=float(np.log(eps)),
        )
    mel = _standardize(mel, axes=(1, 2))
    return mel[:, None, :, :]


@partial(jax.jit, static_argnames=("n_fft", "n_mels", "sample_rate", "fmin", "fmax"))
def mel_columns(
    hops: jnp.ndarray,  # [B, H, n_fft] — non-overlapping hops (hop == n_fft)
    n_fft: int = 512,
    n_mels: int = 32,
    sample_rate: int = 16000,
    fmin: float = 20.0,
    fmax: float | None = 8000.0,
    eps: float = 1e-6,
) -> jnp.ndarray:
    """Per-hop log-mel columns [B, H, n_mels] for the streaming VAD frontend.

    Mirrors MelStreamer::PushHop (reference:
    micro/feature-generation/src/mel_streamer.cc:53-92): one windowed FFT per
    512-sample hop, no reflect padding (center=False, hop == n_fft).
    """
    basis = jnp.asarray(_dft_basis_periodic(n_fft))
    spec = jnp.einsum("bhn,nk->bhk", hops, basis, preferred_element_type=jnp.float32)
    n_bins = n_fft // 2 + 1
    re, im = spec[..., :n_bins], spec[..., n_bins:]
    power = re * re + im * im
    fb = jnp.asarray(mel_filterbank_slaney(n_mels, n_fft, sample_rate, fmin, fmax))
    mel = jnp.einsum("bhk,km->bhm", power, fb, preferred_element_type=jnp.float32)
    return jnp.log(mel + eps)


@partial(jax.jit, static_argnames=("n_fft", "hop", "n_mels", "sample_rate", "center"))
def log_mel(
    audio: jnp.ndarray,  # [B, N]
    n_fft: int = 400,
    hop: int = 160,
    n_mels: int = 80,
    sample_rate: int = 16000,
    center: bool = True,
    eps: float = 1e-6,
) -> jnp.ndarray:
    """[B, N] waveform -> [B, T, n_mels] log-mel energies."""
    if center:
        pad = n_fft // 2
        audio = jnp.pad(audio, ((0, 0), (pad, pad)), mode="reflect")
    n = audio.shape[-1]
    n_frames = 1 + (n - n_fft) // hop
    idx = jnp.arange(n_frames)[:, None] * hop + jnp.arange(n_fft)[None, :]
    frames = audio[:, idx]  # [B, T, n_fft]
    basis = jnp.asarray(_dft_basis(n_fft))
    spec = jnp.einsum("btn,nk->btk", frames, basis, preferred_element_type=jnp.float32)
    n_bins = n_fft // 2 + 1
    re, im = spec[..., :n_bins], spec[..., n_bins:]
    power = re * re + im * im
    fb = jnp.asarray(mel_filterbank(n_mels, n_fft, sample_rate))
    mel = jnp.einsum("btk,km->btm", power, fb, preferred_element_type=jnp.float32)
    return jnp.log(mel + eps)
