"""Offline transcription of a WAV file (reference analog:
examples/c++/transcriber.cpp, python quick start).

    python examples/transcribe_file.py speech.wav --model tiny
"""

import argparse
import sys

sys.path.insert(0, ".")

import moonshine_tpu as mt


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("wav")
    p.add_argument("--model", default="tiny")
    p.add_argument("--weights", default=None, help="HF safetensors checkpoint")
    p.add_argument("--tokenizer", default=None)
    p.add_argument("--word-timestamps", action="store_true")
    p.add_argument("--vad-threshold", type=float, default=0.5,
                   help="0 = treat everything as speech")
    args = p.parse_args()

    options = mt.TranscriberOptions(
        word_timestamps=args.word_timestamps,
        vad=mt.VadOptions(threshold=args.vad_threshold),
    )
    t = mt.Transcriber(
        model=args.model,
        weights=args.weights,
        tokenizer_path=args.tokenizer,
        options=options,
    ).load()

    transcript = t.transcribe_wav(args.wav)
    for line in transcript.lines:
        print(f"[{line.start_time:6.2f}s] {line.text}")
        for w in line.words:
            print(f"    {w.start:6.2f}-{w.end:6.2f} {w.text}")


if __name__ == "__main__":
    main()
