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

# Persistent XLA compilation cache: the streaming service's program set
# (per verify-bucket, per stream-count) costs minutes of compile at
# load(); caching makes a server restart reuse them (the reference's
# analog is shipping pre-converted .ort artifacts — compile once,
# load forever).  MOONSHINE_TPU_COMPILE_CACHE overrides the location;
# "0"/"off" disables.  Only programs that took >=2 s to compile are
# persisted (the jit-cache already covers the small ones in-process).
_cache = _os.environ.get("MOONSHINE_TPU_COMPILE_CACHE", "")
if _cache.lower() not in ("0", "off", "none"):
    import jax as _jax

    _cache_dir = _cache or _os.path.join(
        _os.path.expanduser("~"), ".cache", "moonshine_tpu", "xla"
    )
    try:
        _os.makedirs(_cache_dir, exist_ok=True)
        _jax.config.update("jax_compilation_cache_dir", _cache_dir)
        # Persist EVERY program: through the axon remote-compile service
        # even a one-op program costs seconds to compile, and a cold
        # transcriber start touches ~60 small shape-varying programs
        # (measured: first 10 s clip 334 s cold vs 6 s warm).  Entries
        # are KBs; the usual persist-only-slow-compiles heuristic is
        # tuned for local compiles and loses badly here.
        _jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
        _jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
        try:
            # Bound on-disk growth (LRU eviction); persist-everything with
            # no ceiling would grow forever across configs/restarts.
            _jax.config.update("jax_compilation_cache_max_size", 4 << 30)
        except Exception:  # older jax without the knob
            pass
    except Exception:  # pragma: no cover - cache is best-effort
        pass

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
