"""Typed configuration for the moonshine_tpu framework.

The reference stack configures everything through string-string option pairs
parsed into typed structs (reference: core/transcriber.h:112-190,
core/moonshine-c-api.h:146-149).  Here the typed dataclasses are the single
source of truth and a string-option compatibility parser is layered on top
(see ``TranscriberOptions.from_options``), so callers of the reference API
can pass the same option lists unchanged.

Model hyperparameters mirror the published Moonshine architecture so that
HF ``safetensors`` checkpoints import losslessly (see
``moonshine_tpu.weights``).  Streaming-model fields mirror the reference's
``streaming_config.json`` (reference: core/moonshine-streaming-model.h:17-33).
"""

from __future__ import annotations

import dataclasses
import json
from dataclasses import dataclass, field
from typing import Any, Mapping, Sequence


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


@dataclass(frozen=True)
class MoonshineArchConfig:
    """Architecture of the non-streaming Moonshine encoder/decoder family.

    Matches the published Moonshine architecture (HF ``MoonshineConfig``):
    a strided-conv raw-waveform frontend, a rotary-attention transformer
    encoder and a KV-cached decoder with SwiGLU MLPs.
    """

    name: str = "tiny"
    vocab_size: int = 32768
    hidden_size: int = 288
    intermediate_size: int = 1152
    encoder_layers: int = 6
    decoder_layers: int = 6
    encoder_heads: int = 8
    decoder_heads: int = 8
    encoder_kv_heads: int = 8
    decoder_kv_heads: int = 8
    encoder_hidden_act: str = "gelu"
    decoder_hidden_act: str = "silu"
    max_position_embeddings: int = 512
    rope_theta: float = 10000.0
    partial_rotary_factor: float = 0.9
    attention_bias: bool = False
    layer_norm_eps: float = 1e-5
    bos_token_id: int = 1
    eos_token_id: int = 2
    decoder_start_token_id: int = 1
    # Conv frontend: (out_mult, kernel, stride, bias) per stage; stage 0 input
    # is the raw waveform. Downsample factor is prod(strides) = 384 samples
    # per encoder frame at 16 kHz.
    conv_kernels: tuple[int, ...] = (127, 7, 3)
    conv_strides: tuple[int, ...] = (64, 3, 2)
    # Cap on emitted tokens per second of audio; the reference uses this as a
    # hallucination watchdog (reference: core/moonshine-model.h:47,
    # core/transcriber.h:170).
    max_tokens_per_second: float = 6.5

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.encoder_heads

    @property
    def rotary_dim(self) -> int:
        # Must round to an even number of rotary pairs.
        dim = int(self.head_dim * self.partial_rotary_factor)
        return dim - (dim % 2)

    @property
    def samples_per_frame(self) -> int:
        out = 1
        for s in self.conv_strides:
            out *= s
        return out

    def frames_for_samples(self, num_samples: int) -> int:
        """Output frame count of the conv frontend for a waveform length.

        Mirrors the valid-convolution arithmetic of the reference frontend
        (reference: HF modeling `_get_feat_extract_output_lengths`).
        """
        n = num_samples
        for k, s in zip(self.conv_kernels, self.conv_strides):
            n = (n - k) // s + 1
        return max(int(n), 0)

    def min_samples(self) -> int:
        """Smallest waveform length producing one encoder frame."""
        n = 1
        for k, s in zip(reversed(self.conv_kernels), reversed(self.conv_strides)):
            n = (n - 1) * s + k
        return n


# Published model sizes (reference: README.md model tables).
TINY = MoonshineArchConfig(name="tiny")
BASE = MoonshineArchConfig(
    name="base",
    hidden_size=416,
    intermediate_size=1664,
    encoder_layers=8,
    decoder_layers=8,
)
ARCHS: dict[str, MoonshineArchConfig] = {"tiny": TINY, "base": BASE}


@dataclass(frozen=True)
class StreamingConfig:
    """Streaming-model configuration.

    Field-for-field mirror of the reference ``streaming_config.json``
    (reference: core/moonshine-streaming-model.h:17-33); values shown are the
    tiny-streaming defaults.
    """

    encoder_dim: int = 320
    decoder_dim: int = 320
    depth: int = 6
    nheads: int = 8
    head_dim: int = 40
    vocab_size: int = 32768
    bos_id: int = 1
    eos_id: int = 2
    frame_len: int = 80  # audio samples per frontend frame
    total_lookahead: int = 16  # encoder frames withheld until is_final
    d_model_frontend: int = 320
    c1: int = 640
    c2: int = 320
    max_seq_len: int = 448  # decoder token capacity
    # Encoder depth (layers) — the reference reuses `depth` for both encoder
    # and decoder; kept separate here for flexibility.
    encoder_depth: int | None = None
    rope_theta: float = 10000.0

    @property
    def enc_depth(self) -> int:
        return self.depth if self.encoder_depth is None else self.encoder_depth

    @property
    def left_context_frames(self) -> int:
        # Fixed per-layer left context used by the sliding-window re-encode
        # (reference: core/moonshine-streaming-model.cpp:609).
        return 16 * self.enc_depth

    @classmethod
    def from_json(cls, payload: str | Mapping[str, Any]) -> "StreamingConfig":
        """Parse a reference-format streaming_config.json payload."""
        if isinstance(payload, str):
            payload = json.loads(payload)
        known = {f.name for f in dataclasses.fields(cls)}
        return cls(**{k: v for k, v in payload.items() if k in known})

    def to_json(self) -> str:
        d = dataclasses.asdict(self)
        if d["encoder_depth"] is None:
            del d["encoder_depth"]
        return json.dumps(d)


STREAMING_TINY = StreamingConfig()
STREAMING_SMALL = StreamingConfig(
    encoder_dim=512, decoder_dim=512, depth=8, nheads=8, head_dim=64,
    d_model_frontend=512, c1=1024, c2=512,
)
STREAMING_MEDIUM = StreamingConfig(
    encoder_dim=704, decoder_dim=704, depth=10, nheads=11, head_dim=64,
    d_model_frontend=704, c1=1408, c2=704,
)
STREAMING_ARCHS: dict[str, StreamingConfig] = {
    "tiny_streaming": STREAMING_TINY,
    "small_streaming": STREAMING_SMALL,
    "medium_streaming": STREAMING_MEDIUM,
}


def _parse_bool(v: str) -> bool:
    return str(v).strip().lower() in ("1", "true", "yes", "on")


@dataclass
class VadOptions:
    """VAD segmentation knobs (reference: core/transcriber.h:112-190,
    core/voice-activity-detector.h:22-70)."""

    threshold: float = 0.5
    min_silence_duration: float = 0.5  # seconds of silence closing a segment
    speech_pad: float = 0.512  # look-behind prepend, 8192 samples at 16 kHz
    max_segment_duration: float = 15.0  # force-split bound
    window_size: int = 32  # smoothing window in VAD hops


@dataclass
class TranscriberOptions:
    """Typed options for the transcription pipeline.

    The canonical flag list mirrors the reference ``TranscriberOptions``
    (reference: core/transcriber.h:112-190).  ``from_options`` accepts the
    reference's string-string pairs for drop-in compatibility.
    """

    model: str = "tiny"
    transcription_interval: float = 0.5
    max_tokens_per_second: float = 6.5
    use_speculative_decoding: bool = True
    word_timestamps: bool = False
    identify_speakers: bool = False
    spelling_mode: bool = False
    vad: VadOptions = field(default_factory=VadOptions)
    log_model_run: bool = False
    log_api_calls: bool = False
    log_output_text: bool = False
    save_input_wav_path: str | None = None
    # Decoding
    beam_size: int = 1
    # int8 KV caches on the offline decode path (ops/int8_kv.py)
    kv_int8: bool = False
    # Batched offline decode
    batch_size: int = 8

    _ALIASES = {
        "vad_threshold": ("vad", "threshold"),
        "vad_min_silence_duration": ("vad", "min_silence_duration"),
        "vad_speech_pad": ("vad", "speech_pad"),
        "vad_max_segment_duration": ("vad", "max_segment_duration"),
    }

    @classmethod
    def from_options(
        cls,
        options: Sequence[tuple[str, str]] | Mapping[str, str] | None = None,
        **kwargs: Any,
    ) -> "TranscriberOptions":
        """Build from reference-style (name, value) option pairs."""
        out = cls(**kwargs)
        if options is None:
            return out
        items = options.items() if isinstance(options, Mapping) else options
        for name, value in items:
            out.set_option(name, value)
        return out

    def set_option(self, name: str, value: str) -> None:
        if name in self._ALIASES:
            group, attr = self._ALIASES[name]
            target = getattr(self, group)
            current = getattr(target, attr)
            setattr(target, attr, type(current)(float(value)) if isinstance(current, (int, float)) else value)
            return
        if not hasattr(self, name):
            raise ValueError(f"Unknown transcriber option: {name!r}")
        current = getattr(self, name)
        if isinstance(current, bool):
            setattr(self, name, _parse_bool(value))
        elif isinstance(current, int):
            setattr(self, name, int(float(value)))
        elif isinstance(current, float):
            setattr(self, name, float(value))
        else:
            setattr(self, name, value)
