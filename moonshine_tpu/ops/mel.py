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
