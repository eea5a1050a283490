"""Public API: the reference binding surface, TPU-native underneath.

Construct -> chainable setters -> ``load()`` -> use (reference:
docs/design/api-principles.md:9-15; python binding Transcriber,
language-bindings/python/src/moonshine_voice/transcriber.py).

    import moonshine_tpu as mt

    t = mt.Transcriber(model="tiny").load()
    transcript = t.transcribe_wav("speech.wav")

    stream = t.create_stream(update_interval=0.5)
    stream.add_listener(lambda e: print(e))
    stream.start(); stream.add_audio(chunk); stream.stop()

Weights come from a catalog-resolved directory, an explicit safetensors
path, or random initialization (``weights=None`` — useful for smoke tests
and benchmarking where compute is weight-independent).
"""

from __future__ import annotations

import threading
from pathlib import Path
from typing import Any, Callable, Optional

import numpy as np

from . import catalog
from .core.config import (
    ARCHS,
    STREAMING_ARCHS,
    MoonshineArchConfig,
    StreamingConfig,
    TranscriberOptions,
)
from .core.tokenizer import BinTokenizer
from .core.types import Transcript
from .pipeline.transcriber import Stream, Transcriber as _PipelineTranscriber
from .pipeline.transcriber import TranscriptEventListener  # re-export


class Transcriber:
    """High-level transcriber matching the reference binding API."""

    def __init__(
        self,
        model: str = "tiny",
        language: str = "en",
        weights: str | Path | None = None,
        tokenizer_path: str | Path | None = None,
        options: TranscriberOptions | None = None,
        vad_weights: str | Path | None = None,
        seed: int = 0,
    ):
        # ``model`` is an ARCHS/STREAMING_ARCHS key, or a config instance
        # for custom (e.g. freshly trained) architectures.
        self._model = model
        self._language = language
        self._weights = weights
        self._params = None
        self._tokenizer_path = tokenizer_path
        model_name = model if isinstance(model, str) else getattr(model, "name", "custom")
        self.options = options or TranscriberOptions(model=model_name)
        self._vad_weights = vad_weights
        self._seed = seed
        self._loaded = False
        self._pipeline: _PipelineTranscriber | None = None

    # -- chainable setters --------------------------------------------------

    def language(self, code: str) -> "Transcriber":
        self._language = code
        return self

    def with_weights(self, path: str | Path) -> "Transcriber":
        self._weights = path
        return self

    def with_params(self, params) -> "Transcriber":
        """Use an in-memory parameter pytree (e.g. just trained/imported).

        The analog of the reference's memory-files model source
        (reference: core/transcriber.h:116-135, ModelSource::MEMORY —
        transcriber-test.cpp loads encoder/decoder/tokenizer from RAM).
        """
        self._params = params
        return self

    def with_options(self, **kw) -> "Transcriber":
        for k, v in kw.items():
            self.options.set_option(k, str(v))
        return self

    # -- loading ------------------------------------------------------------

    def load(self) -> "Transcriber":
        import jax

        if self._loaded:
            return self

        if isinstance(self._model, str):
            is_streaming = self._model in STREAMING_ARCHS
            cfg_obj = None
        else:  # config instance (custom architecture)
            from .core.config import StreamingConfig

            cfg_obj = self._model
            is_streaming = isinstance(cfg_obj, StreamingConfig)
        tokenizer = self._load_tokenizer()

        if is_streaming:
            from .models import streaming as ms
            from .pipeline.backends import StreamingBackend

            cfg = cfg_obj if cfg_obj is not None else STREAMING_ARCHS[self._model]
            params = self._load_or_init(
                lambda: ms.init_params(cfg, jax.random.PRNGKey(self._seed)),
                importer="streaming",
                cfg=cfg,
            )
            backend = StreamingBackend(
                params,
                cfg,
                tokenizer,
                use_speculative_decoding=self.options.use_speculative_decoding,
                max_tokens_per_second=self.options.max_tokens_per_second,
                word_timestamps=self.options.word_timestamps,
            )
        else:
            from .models import moonshine as mm
            from .pipeline.backends import OfflineBackend

            cfg = cfg_obj if cfg_obj is not None else ARCHS[self._model]
            params = self._load_or_init(
                lambda: mm.init_params(cfg, jax.random.PRNGKey(self._seed)),
                importer="moonshine",
                cfg=cfg,
            )
            backend = OfflineBackend(
                params,
                cfg,
                tokenizer,
                max_tokens_per_second=self.options.max_tokens_per_second,
                word_timestamps=self.options.word_timestamps,
                kv_int8=self.options.kv_int8,
            )

        hop_prob_fn = self._load_vad()
        diarizer = self._load_diarizer() if self.options.identify_speakers else None
        self._pipeline = _PipelineTranscriber(
            backend, self.options, hop_prob_fn=hop_prob_fn, diarizer=diarizer
        )
        self._loaded = True
        return self

    def _load_diarizer(self):
        import jax

        from .models import diarization as dm
        from .pipeline.diarization import SpeakerDiarizer

        seg_params = dm.init_segmentation_params(jax.random.PRNGKey(self._seed + 2))
        emb_params = dm.init_embedding_params(jax.random.PRNGKey(self._seed + 3))

        def activities(batch: np.ndarray) -> np.ndarray:
            import jax.numpy as jnp

            return np.asarray(dm.segmentation_activations(seg_params, jnp.asarray(batch)))

        def embeddings(batch: np.ndarray, weights: np.ndarray) -> np.ndarray:
            import jax.numpy as jnp

            return np.asarray(
                dm.embedding_forward(emb_params, jnp.asarray(batch), jnp.asarray(weights))
            )

        return SpeakerDiarizer(activities, embeddings)

    def _load_tokenizer(self) -> BinTokenizer:
        path = self._tokenizer_path
        if path is None:
            try:
                resolved = catalog.resolve(self._model, self._language)
                path = resolved.path("tokenizer.bin")
            except (FileNotFoundError, KeyError):
                path = catalog.default_tokenizer_path()
        if path is None:
            raise FileNotFoundError(
                "No tokenizer.bin found; pass tokenizer_path= or populate the cache"
            )
        return BinTokenizer.from_file(str(path))

    def _load_or_init(self, init_fn, importer: str, cfg) -> Any:
        if self._params is not None:
            return self._params
        if self._weights is None and isinstance(self._model, str):
            try:
                resolved = catalog.resolve(self._model, self._language)
                self._weights = resolved.path("model.safetensors")
            except (FileNotFoundError, KeyError):
                pass
        if self._weights is None:
            return init_fn()
        if importer == "moonshine":
            from .weights import import_hf_moonshine

            return import_hf_moonshine(str(self._weights), cfg)
        # Streaming family: a checkpoint directory (reference layout:
        # README.md:935) or a single flat safetensors file.
        from .weights import import_streaming, load_streaming_checkpoint

        path = Path(self._weights)
        if path.is_dir():
            params, _cfg = load_streaming_checkpoint(str(path))
            return params
        return import_streaming(str(path), cfg)

    def _load_vad(self) -> Optional[Callable]:
        if self.options.vad.threshold <= 0.0:
            return None  # always-voice: the segmenter short-circuits
        import jax
        import jax.numpy as jnp

        from .models import vad as vad_mod

        if self._vad_weights is not None:
            # Real TinyVadCNN weights (ONNX export, e.g. the reference's
            # in-tree micro/models/tinyvad_cnn_speech_mel.onnx).
            return vad_mod.TinyVad.from_onnx(str(self._vad_weights)).hop_prob_fn()

        params = vad_mod.init_params(jax.random.PRNGKey(self._seed + 1))
        state_holder = {"state": vad_mod.init_state(1)}

        def hop_probs(hops: np.ndarray) -> np.ndarray:
            probs, state_holder["state"] = vad_mod.predict_hops_jit(
                params, jnp.asarray(hops)[None], state_holder["state"]
            )
            return np.asarray(probs)[0]

        return hop_probs

    # -- use ----------------------------------------------------------------

    def _require_loaded(self) -> _PipelineTranscriber:
        if not self._loaded:
            raise RuntimeError("Call load() before using the transcriber")
        return self._pipeline

    def _log_api(self, name: str, **args) -> None:
        from . import profiling

        profiling.log_api_call(self.options.log_api_calls, name, **args)

    def transcribe(self, audio: np.ndarray, sample_rate: int = 16000) -> Transcript:
        self._log_api("transcribe", audio=audio, sample_rate=sample_rate)
        return self._require_loaded().transcribe_without_streaming(audio, sample_rate)

    def transcribe_wav(self, path: str) -> Transcript:
        self._log_api("transcribe_wav", path=path)
        return self._require_loaded().transcribe_wav(path)

    def create_stream(self, update_interval: float | None = None, flags: int = 0) -> Stream:
        self._log_api("create_stream", update_interval=update_interval, flags=flags)
        return self._require_loaded().create_stream(update_interval, flags)

    def free_stream(self, stream: Stream) -> None:
        self._log_api("free_stream", stream=getattr(stream, "stream_id", stream))
        self._require_loaded().free_stream(stream)

    # -- implicit default stream ---------------------------------------------
    # Single-input apps can forget streams exist: the transcriber exposes
    # the same start/add_audio/update/stop surface, lazily backed by one
    # stream (reference: README "the transcriber class includes the same
    # methods (start/stop/add_audio) as a stream", transcriber.py).

    _default_stream: Stream | None = None

    def _stream(self) -> Stream:
        if self._default_stream is None:
            self._default_stream = self.create_stream()
            self._default_stream.start()
        return self._default_stream

    def start(self) -> None:
        self._stream()

    def add_audio(self, audio: np.ndarray, sample_rate: int = 16000) -> None:
        self._stream().add_audio(audio, sample_rate)

    def update_transcription(self, flags: int = 0) -> Transcript:
        return self._stream().update_transcription(flags)

    def add_listener(self, listener) -> None:
        self._stream().add_listener(listener)

    def stop(self) -> Transcript:
        stream = self._stream()
        transcript = stream.stop()
        self.free_stream(stream)
        self._default_stream = None
        return transcript


class MicTranscriber:
    """Microphone-fed transcriber (reference: mic_transcriber.py).

    Uses ``sounddevice`` when available; raises a clear error otherwise.
    Events arrive through the stream listeners exactly as for file input.
    """

    def __init__(self, transcriber: Transcriber, update_interval: float = 0.5, device=None):
        self.transcriber = transcriber
        self.update_interval = update_interval
        self.device = device
        self.stream: Stream | None = None
        self._sd_stream = None
        self._muted = False

    def add_listener(self, listener) -> None:
        if self.stream is None:
            self.stream = self.transcriber.create_stream(self.update_interval)
        self.stream.add_listener(listener)

    def mute(self, muted: bool = True) -> None:
        self._muted = muted

    def start(self) -> None:
        try:
            import sounddevice as sd
        except ImportError as e:  # pragma: no cover - env-dependent
            raise RuntimeError(
                "MicTranscriber requires the sounddevice package and an audio "
                "input device"
            ) from e
        if self.stream is None:
            self.stream = self.transcriber.create_stream(self.update_interval)
        self.stream.start()

        def callback(indata, frames, time_info, status):  # pragma: no cover
            if not self._muted:
                self.stream.add_audio(indata[:, 0].copy(), int(self._sd_stream.samplerate))

        self._sd_stream = sd.InputStream(
            channels=1, callback=callback, device=self.device
        )
        self._sd_stream.start()

    def stop(self) -> Transcript:  # pragma: no cover - env-dependent
        if self._sd_stream is not None:
            self._sd_stream.stop()
            self._sd_stream.close()
            self._sd_stream = None
        return self.stream.stop()
