"""LibriSpeech WER + throughput harness, data-parallel over the mesh.

Mirror of the reference's eval-librispeech.py (backends moonshine_c /
moonshine_c_streaming / hf; corpus WER with the Whisper normalizer and
VAD disabled, reference: scripts/eval-librispeech.py:87-155) re-designed
for TPU: utterances are length-bucketed, padded, batched, and decoded
data-parallel with one jitted program per bucket; per-host shards reduce
their error counts with a collective when run multi-host.

Dataset layout: standard LibriSpeech extraction
(``<root>/<split>/<spk>/<chap>/<spk>-<chap>-<utt>.flac`` + ``*.trans.txt``)
or any directory of ``.wav`` + ``.txt`` pairs.  FLAC decode uses
``soundfile`` when present; WAV needs nothing.
"""

from __future__ import annotations

import json
import time
from dataclasses import dataclass
from pathlib import Path
from typing import Iterator

import numpy as np

from ..audio.wav import load_wav
from .wer import corpus_wer


@dataclass
class Utterance:
    id: str
    audio_path: Path
    text: str

    def load_audio(self) -> np.ndarray:
        if self.audio_path.suffix == ".wav":
            audio, sr = load_wav(str(self.audio_path))
        else:
            import soundfile as sf  # optional dependency

            audio, sr = sf.read(str(self.audio_path), dtype="float32")
        if sr != 16000:
            from ..audio.resample import resample_audio

            audio = resample_audio(audio, sr, 16000)
        return np.asarray(audio, np.float32)


def iter_librispeech(root: str | Path, limit: int | None = None) -> Iterator[Utterance]:
    root = Path(root)
    count = 0
    for trans in sorted(root.rglob("*.trans.txt")):
        with open(trans) as f:
            for line in f:
                utt_id, _, text = line.strip().partition(" ")
                for ext in (".flac", ".wav"):
                    p = trans.parent / f"{utt_id}{ext}"
                    if p.exists():
                        yield Utterance(utt_id, p, text)
                        count += 1
                        break
                if limit and count >= limit:
                    return
    if count == 0:
        # wav+txt fallback layout
        for wav in sorted(root.rglob("*.wav")):
            txt = wav.with_suffix(".txt")
            if txt.exists():
                yield Utterance(wav.stem, wav, txt.read_text().strip())
                count += 1
                if limit and count >= limit:
                    return


def _buckets(cfg, utts, batch_size: int, max_frames: int = 1408):
    """Group utterances into LANE-ALIGNED frame buckets.

    The time axis rides 128-wide TPU lanes, so any bucket whose encoder
    frame count is not a multiple of 128 pays physical padding on every
    attention/cross-KV read (10 s → T=415 → 512 = 1.23×; +10.5 %
    throughput measured from alignment alone, docs/PERF.md).  Buckets
    are therefore defined directly at 128-aligned frame counts — also a
    FINER ladder than whole-second buckets, so total padding drops.
    Yields (n_samples, items) with n_samples the smallest sample count
    reaching the bucket's frame count.
    """
    from ..models.moonshine import frames_for_samples, lane_aligned_samples

    ladder = list(range(128, max_frames + 1, 128))
    groups: dict[int, list] = {}
    for u, audio in utts:
        f = frames_for_samples(cfg, len(audio))
        b = next((b for b in ladder if f <= b), ladder[-1])
        groups.setdefault(b, []).append((u, audio))
    for b, items in sorted(groups.items()):
        n = lane_aligned_samples(cfg, 1)  # smallest 128-frame count
        # Scale to this bucket: smallest sample count with >= b frames.
        n = lane_aligned_samples(cfg, n + (b - 128) * _hop(cfg))
        for i in range(0, len(items), batch_size):
            yield n, items[i : i + batch_size]


def _hop(cfg) -> int:
    h = 1
    for s in cfg.conv_strides:
        h *= s
    return h


def evaluate(
    params,
    cfg,
    tokenizer,
    dataset_root: str,
    batch_size: int = 16,
    limit: int | None = None,
    beam_size: int = 1,
    mesh=None,
    return_texts: bool = False,
) -> dict:
    """Batched offline decode -> corpus WER + audio-seconds/s."""
    import jax
    import jax.numpy as jnp

    from ..decoding.beam import beam_decode
    from ..decoding.greedy import greedy_decode
    from ..models import moonshine as mm

    if mesh is not None:
        from ..parallel.sharding import shard_params

        params = shard_params(mesh, params)

    encode = jax.jit(lambda p, a, l: mm.encode(p, cfg, a, l))

    utts = []
    for u in iter_librispeech(dataset_root, limit):
        utts.append((u, u.load_audio()))
    if not utts:
        raise FileNotFoundError(f"No utterances under {dataset_root}")

    refs, hyps = [], []
    audio_seconds = 0.0
    t0 = time.perf_counter()
    for n, items in _buckets(cfg, utts, batch_size):
        b = len(items)
        batch = np.zeros((b, n), np.float32)
        lengths = np.zeros((b,), np.int32)
        for i, (u, audio) in enumerate(items):
            k = min(len(audio), n)
            batch[i, :k] = audio[:k]
            lengths[i] = k
        memory, mask = encode(params, jnp.asarray(batch), jnp.asarray(lengths))
        caps = np.maximum((lengths / 16000 * cfg.max_tokens_per_second).astype(np.int32), 1)
        max_tokens = max(int(n / 16000 * cfg.max_tokens_per_second), 8)
        if beam_size > 1:
            res = beam_decode(
                params, cfg, memory, mask, beam_size=beam_size,
                max_tokens=max_tokens, token_caps=jnp.asarray(caps),
            )
        else:
            res = greedy_decode(
                params, cfg, memory, mask, max_tokens=max_tokens,
                token_caps=jnp.asarray(caps),
            )
        tokens = np.asarray(res.tokens)
        lengths_out = np.asarray(res.lengths)
        for i, (u, audio) in enumerate(items):
            ids = tokens[i, : lengths_out[i]]
            hyps.append(tokenizer.tokens_to_text(ids))
            refs.append(u.text)
            audio_seconds += len(audio) / 16000
    elapsed = time.perf_counter() - t0

    result = corpus_wer(refs, hyps)
    if return_texts:
        result["refs"] = refs
        result["hyps"] = hyps
    result["audio_seconds"] = audio_seconds
    result["wall_seconds"] = elapsed
    result["audio_seconds_per_second"] = audio_seconds / max(elapsed, 1e-9)
    result["beam_size"] = beam_size
    return result


def main() -> None:  # pragma: no cover - needs dataset
    import argparse

    import jax

    from ..core.config import ARCHS
    from ..core.tokenizer import BinTokenizer
    from ..models import moonshine as mm
    from ..weights import import_hf_moonshine

    p = argparse.ArgumentParser()
    p.add_argument("dataset_root")
    p.add_argument("--arch", default="base")
    p.add_argument("--weights", default=None)
    p.add_argument("--tokenizer", required=True)
    p.add_argument("--batch", type=int, default=16)
    p.add_argument("--limit", type=int, default=None)
    p.add_argument("--beam", type=int, default=1)
    args = p.parse_args()

    cfg = ARCHS[args.arch]
    tok = BinTokenizer.from_file(args.tokenizer)
    if args.weights:
        params = import_hf_moonshine(args.weights, cfg)
    else:
        params = mm.init_params(cfg, jax.random.PRNGKey(0))
    out = evaluate(
        params, cfg, tok, args.dataset_root,
        batch_size=args.batch, limit=args.limit, beam_size=args.beam,
    )
    print(json.dumps(out, indent=2))


if __name__ == "__main__":  # pragma: no cover
    main()
