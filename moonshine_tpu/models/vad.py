"""Silero-style streaming voice-activity model, TPU-native.

Capability mirror of the reference's ``SileroVad`` wrapper (reference:
core/silero-vad.h:22-89): 512-sample hops at 16 kHz with 64 samples of
leading context and a recurrent state of shape [2, 1, 128] (LSTM h/c),
emitting one speech probability per hop.

The reference runs one ONNX call per hop on the host (HOT LOOP 1,
reference: core/transcriber.cpp:736).  Here the whole new-audio span is
processed in ONE jitted call: hops are laid out as a batch axis, the conv
stack runs batched, and ``lax.scan`` carries the LSTM state across hops —
so cost per update is one device dispatch regardless of audio length, and
multiple streams batch on a leading axis.

Architecture (Silero v5-alike): STFT magnitude frontend (DFT-basis conv),
4 strided conv blocks, 128-wide LSTM cell, sigmoid head.  Weights are
trainable/importable; the published Silero weights are not redistributed
here.
"""

from __future__ import annotations

import math
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from .layers import Params, dense, dense_init

SAMPLE_RATE = 16000
HOP_SIZE = 512
CONTEXT_SAMPLES = 64
STATE_WIDTH = 128

_N_FFT = 256
_STFT_HOP = 128
_N_BINS = _N_FFT // 2 + 1


class VadState(NamedTuple):
    """Recurrent state: LSTM (h, c) plus the 64-sample audio context."""

    h: jnp.ndarray  # [B, 128]
    c: jnp.ndarray  # [B, 128]
    context: jnp.ndarray  # [B, 64] trailing samples of the previous hop


def init_state(batch: int = 1, dtype=jnp.float32) -> VadState:
    return VadState(
        h=jnp.zeros((batch, STATE_WIDTH), dtype),
        c=jnp.zeros((batch, STATE_WIDTH), dtype),
        context=jnp.zeros((batch, CONTEXT_SAMPLES), dtype),
    )


def _dft_basis() -> np.ndarray:
    """Real-DFT magnitude basis as a conv kernel [n_fft, 1, 2*n_bins]."""
    n = _N_FFT
    t = np.arange(n)
    k = np.arange(_N_BINS)
    cos = np.cos(2 * np.pi * np.outer(t, k) / n)
    sin = -np.sin(2 * np.pi * np.outer(t, k) / n)
    basis = np.concatenate([cos, sin], axis=1)  # [n, 2*bins]
    window = np.hanning(n)[:, None]
    return (basis * window)[:, None, :].astype(np.float32)  # [n, 1, 2*bins]


def init_params(rng: jax.Array) -> Params:
    r = jax.random.split(rng, 8)
    chans = [(_N_BINS, 128), (128, 64), (64, 64), (64, 128)]

    def conv_init(key, k, cin, cout):
        scale = (1.0 / (cin * k)) ** 0.5
        return {
            "w": jax.random.uniform(key, (k, cin, cout), jnp.float32, -scale, scale),
            "b": jnp.zeros((cout,), jnp.float32),
        }

    params: Params = {
        "stft": {"w": jnp.asarray(_dft_basis())},  # fixed analysis basis
        "enc": [conv_init(r[i], 3, cin, cout) for i, (cin, cout) in enumerate(chans)],
        "lstm": {
            "wi": dense_init(r[4], 128, 4 * STATE_WIDTH),
            "wh": dense_init(r[5], STATE_WIDTH, 4 * STATE_WIDTH, bias=False),
        },
        "head": dense_init(r[6], STATE_WIDTH, 1),
    }
    return params


def _features(p: Params, frames: jnp.ndarray) -> jnp.ndarray:
    """[B, 576] windowed hop -> [B, T', bins] log-magnitude STFT."""
    x = frames[..., None]  # [B, 576, 1]
    y = jax.lax.conv_general_dilated(
        x, p["stft"]["w"], window_strides=(_STFT_HOP,), padding="VALID",
        dimension_numbers=("NWC", "WIO", "NWC"),
    )  # [B, T', 2*bins]
    re, im = jnp.split(y, 2, axis=-1)
    mag = jnp.sqrt(re * re + im * im + 1e-9)
    return jnp.log1p(mag)


def _encoder(p: Params, feats: jnp.ndarray) -> jnp.ndarray:
    """Conv stack collapsing the frame axis -> [B, 128]."""
    h = feats
    for i, cp in enumerate(p["enc"]):
        stride = 2 if i < 2 else 1
        h = jax.lax.conv_general_dilated(
            h, cp["w"], window_strides=(stride,), padding="SAME",
            dimension_numbers=("NWC", "WIO", "NWC"),
        ) + cp["b"]
        h = jax.nn.relu(h)
    return jnp.mean(h, axis=1)  # [B, 128]


def _lstm_cell(p: Params, x: jnp.ndarray, h: jnp.ndarray, c: jnp.ndarray):
    gates = dense(p["wi"], x) + dense(p["wh"], h)
    i, f, g, o = jnp.split(gates, 4, axis=-1)
    c = jax.nn.sigmoid(f) * c + jax.nn.sigmoid(i) * jnp.tanh(g)
    h = jax.nn.sigmoid(o) * jnp.tanh(c)
    return h, c


def predict_hop(p: Params, hop: jnp.ndarray, state: VadState) -> tuple[jnp.ndarray, VadState]:
    """One 512-sample hop [B, 512] -> (probability [B], new state)."""
    frames = jnp.concatenate([state.context, hop], axis=-1)  # [B, 576]
    feats = _features(p, frames)
    enc = _encoder(p, feats)
    h, c = _lstm_cell(p["lstm"], enc, state.h, state.c)
    prob = jax.nn.sigmoid(dense(p["head"], h))[..., 0]
    new_state = VadState(h=h, c=c, context=hop[..., -CONTEXT_SAMPLES:])
    return prob, new_state


def predict_hops(p: Params, hops: jnp.ndarray, state: VadState) -> tuple[jnp.ndarray, VadState]:
    """All hops of an update in one call: [B, H, 512] -> ([B, H], state).

    The conv stack over every hop is batched; only the cheap LSTM recurrence
    scans sequentially.
    """
    b, n_hops, _ = hops.shape
    # Per-hop context comes from the previous hop's tail (first hop: state).
    prev_tails = jnp.concatenate(
        [state.context[:, None, :], hops[:, :-1, -CONTEXT_SAMPLES:]], axis=1
    )  # [B, H, 64]
    frames = jnp.concatenate([prev_tails, hops], axis=-1)  # [B, H, 576]
    feats = _features(p, frames.reshape(b * n_hops, -1))
    enc = _encoder(p, feats).reshape(b, n_hops, STATE_WIDTH)

    def step(carry, x):
        h, c = carry
        h, c = _lstm_cell(p["lstm"], x, h, c)
        prob = jax.nn.sigmoid(dense(p["head"], h))[..., 0]
        return (h, c), prob

    (h, c), probs = jax.lax.scan(step, (state.h, state.c), enc.transpose(1, 0, 2))
    new_state = VadState(h=h, c=c, context=hops[:, -1, -CONTEXT_SAMPLES:])
    return probs.transpose(1, 0), new_state


predict_hops_jit = jax.jit(predict_hops)


# ---------------------------------------------------------------------------
# Real-weight path: TinyVadCNN from the reference's in-tree ONNX export
# (reference: micro/models/tinyvad_cnn_speech_mel.onnx +
# tinyvad_cnn_speech_meta.json, micro/models/README.md — binary speech
# classifier over a (B, 1, 32, 16) streaming log-mel window, one 512-sample
# hop per frame; micro/vad/src runs it once per 32 ms hop).
# ---------------------------------------------------------------------------

TINYVAD_N_MELS = 32
TINYVAD_WINDOW_FRAMES = 16


class TinyVadState(NamedTuple):
    """Ring of the previous window_frames-1 log-mel columns.

    Initialised to log(eps) silence, matching MelStreamer::Reset
    (reference: micro/feature-generation/src/mel_streamer.cc:38-51).
    """

    cols: jnp.ndarray  # [B, 15, 32]


class TinyVad:
    """TinyVadCNN with real weights, batched over hops AND streams.

    Same call contract as predict_hops: all hops of an update in one jitted
    program — mel columns for every hop (one matmul), sliding 16-frame
    windows via gather, per-window standardisation, one batched CNN pass.
    """

    def __init__(self, graph):
        from ..ops.onnx_graph import execute

        self.graph = graph
        (self._input_name, _), = graph.inputs

        def run(hops: jnp.ndarray, cols_state: jnp.ndarray):
            from ..ops.mel import mel_columns

            b, n_hops, _ = hops.shape
            new_cols = mel_columns(hops)  # [B, H, 32]
            full = jnp.concatenate([cols_state, new_cols], axis=1)  # [B, 15+H, 32]
            win = TINYVAD_WINDOW_FRAMES
            idx = jnp.arange(n_hops)[:, None] + jnp.arange(win)[None, :]
            windows = full[:, idx, :]  # [B, H, 16, 32]
            x = windows.transpose(0, 1, 3, 2)  # [B, H, 32 mels, 16 frames]
            mean = jnp.mean(x, axis=(2, 3), keepdims=True)
            std = jnp.std(x, axis=(2, 3), keepdims=True, ddof=1)
            x = (x - mean) / jnp.maximum(std, 1e-3)
            x = x.reshape(b * n_hops, 1, TINYVAD_N_MELS, win)
            logit = execute(self.graph, {self._input_name: x})[0]  # [B*H, 1]
            probs = jax.nn.sigmoid(logit).reshape(b, n_hops)
            return probs, full[:, -(win - 1) :, :]

        self._run = jax.jit(run)

        def run_masked(hops: jnp.ndarray, n_valid: jnp.ndarray, cols_state: jnp.ndarray):
            """Like run, but each stream advances by only n_valid hops —
            padded hops produce garbage probs the caller ignores, and the
            ring rolls forward by the true count per stream."""
            b, n_hops, _ = hops.shape
            from ..ops.mel import mel_columns

            new_cols = mel_columns(hops)  # [B, H, 32]
            full = jnp.concatenate([cols_state, new_cols], axis=1)
            win = TINYVAD_WINDOW_FRAMES
            idx = jnp.arange(n_hops)[:, None] + jnp.arange(win)[None, :]
            windows = full[:, idx, :]
            x = windows.transpose(0, 1, 3, 2)
            mean = jnp.mean(x, axis=(2, 3), keepdims=True)
            std = jnp.std(x, axis=(2, 3), keepdims=True, ddof=1)
            x = (x - mean) / jnp.maximum(std, 1e-3)
            x = x.reshape(b * n_hops, 1, TINYVAD_N_MELS, win)
            logit = execute(self.graph, {self._input_name: x})[0]
            probs = jax.nn.sigmoid(logit).reshape(b, n_hops)
            new_ring = jax.vmap(
                lambda f, nv: jax.lax.dynamic_slice(
                    f, (nv, 0), (win - 1, TINYVAD_N_MELS)
                )
            )(full, n_valid)
            return probs, new_ring

        self._run_masked = jax.jit(run_masked)

    @classmethod
    def from_onnx(cls, path: str) -> "TinyVad":
        from ..core.onnx_io import load_onnx

        return cls(load_onnx(path))

    def init_state(self, batch: int = 1) -> TinyVadState:
        log_eps = float(np.log(1e-6))
        return TinyVadState(
            cols=jnp.full(
                (batch, TINYVAD_WINDOW_FRAMES - 1, TINYVAD_N_MELS), log_eps, jnp.float32
            )
        )

    def predict_hops(
        self, hops: jnp.ndarray, state: TinyVadState
    ) -> tuple[jnp.ndarray, TinyVadState]:
        """[B, H, 512] hops -> ([B, H] speech probabilities, new state)."""
        probs, cols = self._run(hops, state.cols)
        return probs, TinyVadState(cols=cols)

    def predict_hops_masked(
        self, hops: jnp.ndarray, n_valid: jnp.ndarray, state: TinyVadState
    ) -> tuple[jnp.ndarray, TinyVadState]:
        """[B, H, 512] padded hops with per-stream valid counts [B].

        probs[b, i] is meaningful for i < n_valid[b]; each stream's mel ring
        advances by exactly its valid count (service multiplexing path).
        """
        probs, cols = self._run_masked(hops, n_valid, state.cols)
        return probs, TinyVadState(cols=cols)

    def hop_prob_fn(self):
        """Stateful [H, 512] -> [H] closure for pipeline.VadSegmenter."""
        state = self.init_state(1)

        def fn(hops: np.ndarray) -> np.ndarray:
            nonlocal state
            probs, state = self.predict_hops(jnp.asarray(hops, jnp.float32)[None], state)
            return np.asarray(probs[0])

        return fn
