"""moonshine_tpu — a TPU-native real-time voice framework.

From-scratch JAX/XLA/Pallas implementation of the Moonshine Voice
capability set (reference: moonshine-ai/moonshine): streaming and offline
speech-to-text, Silero-style VAD segmentation, word timestamps, speaker
diarization, text embeddings and phrase matching, conversational agent
flows, and text-to-speech — designed for TPU pod slices (SPMD over device
meshes) rather than on-device CPU inference.
"""

import os as _os

# The image's sitecustomize pins JAX to the TPU plugin and ignores
# JAX_PLATFORMS; this package-level override lets scripts/subprocesses
# force a backend (e.g. MOONSHINE_TPU_PLATFORM=cpu for CI example runs).
_platform = _os.environ.get("MOONSHINE_TPU_PLATFORM")
if _platform:
    import jax as _jax

    _jax.config.update("jax_platforms", _platform)

from .api import MicTranscriber, Transcriber
from .core.config import (
    ARCHS,
    BASE,
    STREAMING_ARCHS,
    TINY,
    MoonshineArchConfig,
    StreamingConfig,
    TranscriberOptions,
    VadOptions,
)
from .core.tokenizer import BinTokenizer
from .core.types import SpeakerSpan, Transcript, TranscriptLine, TranscriptWord
from .pipeline.transcriber import (
    ErrorEvent,
    LineCompleted,
    LineSpeakersChanged,
    LineStarted,
    LineTextChanged,
    LineUpdated,
    TranscriptEventListener,
)

__version__ = "0.1.0"

__all__ = [
    "Transcriber",
    "MicTranscriber",
    "BinTokenizer",
    "Transcript",
    "TranscriptLine",
    "TranscriptWord",
    "SpeakerSpan",
    "TranscriberOptions",
    "VadOptions",
    "MoonshineArchConfig",
    "StreamingConfig",
    "TranscriptEventListener",
    "LineStarted",
    "LineUpdated",
    "LineTextChanged",
    "LineSpeakersChanged",
    "LineCompleted",
    "ErrorEvent",
    "ARCHS",
    "STREAMING_ARCHS",
    "TINY",
    "BASE",
    "__version__",
]
