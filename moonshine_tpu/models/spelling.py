"""SpellingCNN: 36-way isolated letter/digit audio classifier.

Capability mirror of the reference spelling model (reference:
core/spelling-model.{h,cpp}; metadata contract in
test-assets/spelling_cnn_meta.json: 1.0 s 16 kHz waveform, 80 mels,
200 target frames, classes a-z + zero..nine) and of the micro stack's
SpellingCNN (reference: micro/stt/README.md:17-26, MobileNetV2-style).

JAX/TPU design: log-mel via the shared matmul frontend, a small
depthwise-separable conv stack, global average pooling, batched + jitted.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.mel import log_mel
from .layers import Params, dense, dense_init

CLASSES = [
    *"abcdefghijklmnopqrstuvwxyz",
    "zero", "one", "two", "three", "four",
    "five", "six", "seven", "eight", "nine",
]
CLASS_TO_CHAR = {c: (c if len(c) == 1 else str(i - 26)) for i, c in enumerate(CLASSES)}

SAMPLE_RATE = 16000
CLIP_SECONDS = 1.0
TARGET_SAMPLES = int(SAMPLE_RATE * CLIP_SECONDS)
N_MELS = 80
TARGET_FRAMES = 200  # hop 80 over 1 s
_HOP = 80
_N_FFT = 400


class SpellingPrediction(NamedTuple):
    """Top-1 prediction in canonical form (reference: spelling-fusion.h:47)."""

    character: str  # "a".."z" / "0".."9"
    probability: float
    raw_class: str  # e.g. "zero"


def init_params(rng: jax.Array) -> Params:
    r = jax.random.split(rng, 10)
    chans = [(1, 32), (32, 64), (64, 128), (128, 128)]
    params: Params = {"blocks": []}

    def conv2d_init(key, kh, kw, cin, cout):
        # He init: with the relu stack + global mean pool, uniform fan-in
        # init left gradients ~100x smaller at the first block and the
        # training recipe (train/spelling.py) could not move off the
        # chance floor on the real captured set.
        std = (2.0 / (cin * kh * kw)) ** 0.5
        return {
            "w": jax.random.normal(key, (kh, kw, cin, cout), jnp.float32) * std,
            "b": jnp.zeros((cout,), jnp.float32),
        }

    for i, (cin, cout) in enumerate(chans):
        params["blocks"].append(conv2d_init(r[i], 3, 3, cin, cout))
    params["head"] = dense_init(r[8], 128, len(CLASSES))
    return params


@jax.jit
def forward(params: Params, audio: jnp.ndarray) -> jnp.ndarray:
    """[B, 16000] waveform -> [B, 36] logits."""
    mel = log_mel(audio, n_fft=_N_FFT, hop=_HOP, n_mels=N_MELS, center=True)
    mel = mel[:, :TARGET_FRAMES, :]
    # Per-clip normalization (robust to level differences).
    mean = jnp.mean(mel, axis=(1, 2), keepdims=True)
    std = jnp.std(mel, axis=(1, 2), keepdims=True) + 1e-5
    x = ((mel - mean) / std)[..., None]  # [B, T, M, 1]
    for i, bp in enumerate(params["blocks"]):
        stride = 2 if i < 3 else 1
        x = jax.lax.conv_general_dilated(
            x, bp["w"], window_strides=(stride, stride), padding="SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ) + bp["b"]
        x = jax.nn.relu(x)
    pooled = jnp.mean(x, axis=(1, 2))  # [B, C]
    return dense(params["head"], pooled)


# ---------------------------------------------------------------------------
# Real-weight path: the reference's in-tree SpellingCNN ONNX export
# (reference: micro/models/spelling_cnn_mel.onnx + spelling_cnn_meta.json,
# micro/models/README.md — 51-way MobileNetV2-style classifier over
# (B, 1, 64, 128) normalised log-mel; 90.91% top-1 on the captured set).
# ---------------------------------------------------------------------------

# Class order from spelling_cnn_meta.json (data, not code).
CLASSES_51 = [
    *"abcdefghijklmnopqrstuvwxyz",
    "zero", "one", "two", "three", "four",
    "five", "six", "seven", "eight", "nine",
    "capital", "uppercase", "star", "dollar", "underscore",
    "exclamation", "percent", "dash", "delete", "finish",
    "cancel", "wifi", "ip", "yes", "no",
]
_WORD_TO_CHAR = {
    "zero": "0", "one": "1", "two": "2", "three": "3", "four": "4",
    "five": "5", "six": "6", "seven": "7", "eight": "8", "nine": "9",
    "star": "*", "dollar": "$", "underscore": "_", "exclamation": "!",
    "percent": "%", "dash": "-",
}


def class_to_char_51(raw: str) -> str:
    """Canonical single character for a class name (commands map to "")."""
    if len(raw) == 1:
        return raw
    return _WORD_TO_CHAR.get(raw, "")


class SpellingOnnx:
    """SpellingCNN with the reference's real exported weights.

    The ONNX graph is interpreted into one jitted XLA program
    (ops/onnx_graph.py); features come from the exact-match Slaney log-mel
    (ops/mel.log_mel_clip). Default clip prep mirrors the micro runtime's
    1 s segmenter clip (reference: micro/stt/README.md).
    """

    def __init__(self, graph, classes: list[str] | None = None):
        from ..ops.onnx_graph import compile_graph

        self.graph = graph
        self.classes = classes or CLASSES_51
        self._fn = compile_graph(graph)

    @classmethod
    def from_onnx(cls, path: str, classes: list[str] | None = None) -> "SpellingOnnx":
        from ..core.onnx_io import load_onnx

        return cls(load_onnx(path), classes)

    def logits(self, audio: jnp.ndarray) -> jnp.ndarray:
        """[B, <=16000] waveform batch -> [B, n_classes] logits."""
        from ..ops.mel import log_mel_clip

        feats = log_mel_clip(audio)  # [B, 1, 64, 128]
        return self._fn(feats)

    def predict(self, audio: np.ndarray) -> SpellingPrediction:
        """One clip (any length; cropped/frame-padded to 1 s) -> top-1."""
        audio = np.asarray(audio, np.float32)
        if len(audio) > TARGET_SAMPLES:
            off = (len(audio) - TARGET_SAMPLES) // 2
            audio = audio[off : off + TARGET_SAMPLES]
        logits = self.logits(jnp.asarray(audio)[None])
        probs = np.asarray(jax.nn.softmax(logits[0]))
        top = int(np.argmax(probs))
        raw = self.classes[top]
        return SpellingPrediction(
            character=class_to_char_51(raw) or raw,
            probability=float(probs[top]),
            raw_class=raw,
        )


def predict(params: Params, audio: np.ndarray) -> SpellingPrediction:
    """One clip (any length; center-cropped/padded to 1 s) -> top-1."""
    audio = np.asarray(audio, np.float32)
    clip = np.zeros(TARGET_SAMPLES, np.float32)
    if len(audio) >= TARGET_SAMPLES:
        # Center crop (the spoken character sits mid-segment).
        off = (len(audio) - TARGET_SAMPLES) // 2
        clip[:] = audio[off : off + TARGET_SAMPLES]
    else:
        off = (TARGET_SAMPLES - len(audio)) // 2
        clip[off : off + len(audio)] = audio
    logits = forward(params, jnp.asarray(clip)[None])
    probs = np.asarray(jax.nn.softmax(logits[0]))
    top = int(np.argmax(probs))
    raw = CLASSES[top]
    return SpellingPrediction(
        character=CLASS_TO_CHAR[raw], probability=float(probs[top]), raw_class=raw
    )
