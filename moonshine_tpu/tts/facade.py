"""TextToSpeech facade: voices, options, synthesis queue.

Capability mirror of the reference's MoonshineTTS + Python binding tts.py
(reference: core/moonshine-tts/src/moonshine-tts.h:22-63 — unified
synthesis at 24 kHz, engine auto-pick per voice prefix, per-call option
overrides for speed/volume/normalize, synthesize_from_phonemes; binding:
queued ``say()`` with a synthesis thread and pluggable playback,
README.md:1574 — the next utterance synthesizes during playback).
"""

from __future__ import annotations

import queue
import threading
from dataclasses import dataclass
from pathlib import Path
from typing import Callable, Mapping, Optional

import numpy as np

from ..models import tts as tts_model
from .g2p import GraphemeToPhonemizer

SAMPLE_RATE = tts_model.SAMPLE_RATE


def save_voice_pack(
    path: str | Path,
    voices: Mapping[str, np.ndarray],
    params=None,
) -> None:
    """Write voices (+ optionally trained acoustic params) to safetensors.

    Layout: ``voice/<name>`` style vectors; ``params/<pytree/path>`` when
    params are included.  One file distributes a whole voice set, like the
    reference's TTS asset catalog entries.
    """
    from safetensors.numpy import save_file

    import jax

    flat: dict[str, np.ndarray] = {
        f"voice/{name}": np.asarray(v, np.float32) for name, v in voices.items()
    }
    if params is not None:
        for key_path, leaf in jax.tree_util.tree_flatten_with_path(params)[0]:
            name = "/".join(
                str(k.key) if hasattr(k, "key") else str(getattr(k, "name", k))
                for k in key_path
            )
            flat[f"params/{name}"] = np.asarray(leaf)
    save_file(flat, str(path))


def load_voice_pack(path: str | Path, cfg=None):
    """Read a voice pack -> (params-or-None, {name: style vector})."""
    from safetensors.numpy import load_file

    import jax

    flat = load_file(str(path))
    voices = {
        k[len("voice/"):]: v for k, v in flat.items() if k.startswith("voice/")
    }
    params = None
    if any(k.startswith("params/") for k in flat):
        import jax.numpy as jnp

        target = tts_model.init_params(cfg or tts_model.TTSConfig(), jax.random.PRNGKey(0))
        leaves_with_paths = jax.tree_util.tree_flatten_with_path(target)[0]
        treedef = jax.tree_util.tree_structure(target)
        new_leaves = []
        for key_path, leaf in leaves_with_paths:
            name = "params/" + "/".join(
                str(k.key) if hasattr(k, "key") else str(getattr(k, "name", k))
                for k in key_path
            )
            if name not in flat:
                raise KeyError(f"Voice pack missing tensor {name!r}")
            arr = flat[name]
            if arr.shape != tuple(leaf.shape):
                raise ValueError(
                    f"Shape mismatch for {name}: {arr.shape} vs {tuple(leaf.shape)}"
                )
            new_leaves.append(jnp.asarray(arr, leaf.dtype))
        params = jax.tree_util.tree_unflatten(treedef, new_leaves)
    return params, voices


@dataclass
class TTSOptions:
    """Per-call synthesis options (reference: moonshine-tts-options.*)."""

    speed: float = 1.0
    volume: float = 1.0
    normalize: bool = True


class TextToSpeech:
    """Chainable-setter TTS runner over the JAX acoustic model."""

    def __init__(
        self,
        params=None,
        cfg: tts_model.TTSConfig | None = None,
        language: str = "en",
        seed: int = 0,
    ):
        import jax

        self.cfg = cfg or tts_model.TTSConfig()
        self._language = language
        self._voice_name = "af_default"
        self._seed = seed
        self.params = params
        self.voices: dict[str, np.ndarray] = {}
        self._g2p: GraphemeToPhonemizer | None = None
        self._playback_fn: Optional[Callable[[np.ndarray, int], None]] = None
        self._queue: "queue.Queue[Optional[tuple[str, TTSOptions]]]" = queue.Queue()
        self._synth_thread: threading.Thread | None = None
        self._said: list[str] = []
        self._loaded = False
        self._default_options = TTSOptions()

    # -- chainable setters --------------------------------------------------

    def language(self, code: str) -> "TextToSpeech":
        self._language = code
        return self

    def voice(self, name: str) -> "TextToSpeech":
        self._voice_name = name
        return self

    def play_with(self, fn: Callable[[np.ndarray, int], None]) -> "TextToSpeech":
        """Playback hook (sounddevice, file writer, test recorder...)."""
        self._playback_fn = fn
        return self

    def options(self, **kw) -> "TextToSpeech":
        for k, v in kw.items():
            setattr(self._default_options, k, v)
        return self

    # -- loading ------------------------------------------------------------

    def load(
        self, voice_pack: Mapping[str, np.ndarray] | str | None = None
    ) -> "TextToSpeech":
        """Initialise (or load) model params and voices.

        ``voice_pack``: a mapping of voice name -> style vector, or a path
        to a ``.safetensors`` voice pack written by :func:`save_voice_pack`
        — the distribution analog of the reference's per-voice style files
        (``.kokorovoice``, reference: moonshine-tts.cpp voice catalogs).
        A pack may also carry trained acoustic params under ``params/``.
        """
        import jax

        if isinstance(voice_pack, (str, Path)):
            params, voices = load_voice_pack(voice_pack, self.cfg)
            if params is not None:
                self.params = params
            voice_pack = voices
        if self.params is None:
            self.params = tts_model.init_params(self.cfg, jax.random.PRNGKey(self._seed))
        if voice_pack:
            self.voices.update({k: np.asarray(v) for k, v in voice_pack.items()})
        if self._voice_name not in self.voices:
            self.voices[self._voice_name] = np.asarray(
                tts_model.make_voice(jax.random.PRNGKey(self._seed + 1))
            )
        self._g2p = GraphemeToPhonemizer(self._language)
        self._loaded = True
        return self

    # -- synthesis ----------------------------------------------------------

    def synthesize(
        self, text: str, options: TTSOptions | None = None
    ) -> tuple[np.ndarray, int]:
        """Text -> (waveform float32, 24000)."""
        if not self._loaded:
            raise RuntimeError("Call load() before synthesize()")
        ipa = self._g2p.text_to_ipa(text)
        return self.synthesize_from_phonemes(ipa, options)

    def synthesize_from_phonemes(
        self, ipa: str, options: TTSOptions | None = None
    ) -> tuple[np.ndarray, int]:
        """IPA string -> waveform (reference: moonshine-tts.h
        synthesize_from_phonemes)."""
        import jax.numpy as jnp

        if not self._loaded:
            raise RuntimeError("Call load() before synthesize()")
        opts = options or self._default_options
        ids = tts_model.ipa_to_ids(ipa.replace(" ", ""))
        phonemes = np.zeros(tts_model.MAX_PHONEMES, np.int32)
        phonemes[: len(ids)] = ids
        style = jnp.asarray(self.voices[self._voice_name], jnp.float32)
        result = tts_model.synthesize(
            self.params,
            self.cfg,
            jnp.asarray(phonemes),
            jnp.asarray(len(ids), jnp.int32),
            style,
            speed=float(opts.speed),
        )
        n = int(result.n_frames) * tts_model.HOP
        wav = np.asarray(result.waveform[:n], np.float32)
        if opts.normalize and wav.size:
            peak = np.max(np.abs(wav))
            if peak > 1e-6:
                wav = wav * (0.95 / max(peak, 0.95))
        if opts.volume != 1.0:
            wav = wav * opts.volume
        return wav, SAMPLE_RATE

    # -- queued speech (reference: binding tts.py synthesis thread) ---------

    def say(self, text: str, options: TTSOptions | None = None) -> None:
        """Queue an utterance; synthesis runs on a worker thread and
        playback happens through the injected hook."""
        self._ensure_thread()
        self._queue.put((text, options or self._default_options))

    def wait_for_all(self, timeout: float | None = None) -> None:
        self._queue.join()

    def stop(self) -> None:
        if self._synth_thread is not None:
            self._queue.put(None)
            self._synth_thread.join(timeout=5)
            self._synth_thread = None

    def _ensure_thread(self) -> None:
        if self._synth_thread is None or not self._synth_thread.is_alive():
            self._synth_thread = threading.Thread(target=self._worker, daemon=True)
            self._synth_thread.start()

    def _worker(self) -> None:
        while True:
            item = self._queue.get()
            try:
                if item is None:
                    return
                text, opts = item
                wav, sr = self.synthesize(text, opts)
                self._said.append(text)
                if self._playback_fn is not None:
                    self._playback_fn(wav, sr)
            except Exception as e:  # noqa: BLE001 — a failed utterance must not kill the queue
                import sys

                print(f"TextToSpeech: synthesis failed: {e!r}", file=sys.stderr)
            finally:
                self._queue.task_done()
