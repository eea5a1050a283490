"""Published-voice ONNX artifacts on TPU via the ONNX->XLA interpreter.

The reference's TTS engines run published ONNX artifacts through ONNX
Runtime (reference: core/moonshine-tts/src/zipvoice-tts.h:21-108 —
text_encoder.ort / fm_decoder.ort / **vocoder.ort**; piper-tts.* — VITS
voices).  The TPU-native split: graphs whose shapes are static given the
input length — the vocoder (mel -> waveform), where nearly all the FLOPs
are — compile straight to XLA through ops/onnx_graph.py and run on the
chip; the *dynamic-shape* control parts (duration-dependent length
regulation inside full VITS graphs) are inherently jit-hostile and live in
our JAX models instead (models/tts.py, models/voice_clone.py), which own
bucketing explicitly.

``OnnxVocoder`` therefore accepts any HiFiGAN/Vocos-class vocoder export
(Conv/ConvTranspose/LeakyRelu/Tanh/norm graphs) and is the drop-in
real-weights replacement for the voice cloner's ``vocode`` stage (the
reference's vocoder.ort slot).
"""

from __future__ import annotations

from functools import partial

import jax
import numpy as np


class OnnxVocoder:
    """mel [B, n_mels, T] (or [n_mels, T]) -> waveform, jitted once.

    The graph is interpreted at trace time into one fused XLA program per
    input shape; callers should bucket T for compile reuse (the voice
    cloner's mel frames are already budget-padded).
    """

    def __init__(self, graph):
        from ..ops.onnx_graph import execute

        self.graph = graph
        (self._input_name, _), = graph.inputs

        @partial(jax.jit)
        def run(mel):
            return execute(graph, {self._input_name: mel})[0]

        self._run = run

    @classmethod
    def from_onnx(cls, path: str) -> "OnnxVocoder":
        from ..core.onnx_io import load_onnx

        return cls(load_onnx(path))

    def __call__(self, mel: np.ndarray) -> np.ndarray:
        mel = np.asarray(mel, np.float32)
        squeeze = mel.ndim == 2
        if squeeze:
            mel = mel[None]
        wav = np.asarray(self._run(mel))
        # Exports emit [B, N] or [B, 1, N]; hand back [N] for 2-D input.
        wav = wav.reshape(wav.shape[0], -1)
        return wav[0] if squeeze else wav
