"""Live-style streaming with the five-event contract (reference analog:
the README streaming example with TranscriptEventListener).

Feeds a WAV in 0.5 s chunks as if from a microphone and prints events as
they fire.

    python examples/streaming_events.py speech.wav --model tiny_streaming
"""

import argparse
import sys

sys.path.insert(0, ".")

import moonshine_tpu as mt
from moonshine_tpu.audio.wav import load_wav


class Printer(mt.TranscriptEventListener):
    def on_line_started(self, e):
        print(f"+ line {e.line.id} started at {e.line.start_time:.1f}s")

    def on_line_text_changed(self, e):
        print(f"~ line {e.line.id}: {e.line.text}")

    def on_line_completed(self, e):
        print(f"= line {e.line.id} complete: {e.line.text}")


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("wav")
    p.add_argument("--model", default="tiny_streaming")
    p.add_argument("--tokenizer", default=None)
    p.add_argument("--vad-threshold", type=float, default=0.5,
                   help="0 = treat everything as speech")
    args = p.parse_args()

    t = mt.Transcriber(
        model=args.model, tokenizer_path=args.tokenizer,
        options=mt.TranscriberOptions(vad=mt.VadOptions(threshold=args.vad_threshold)),
    ).load()
    stream = t.create_stream(update_interval=0.5)
    stream.add_listener(Printer())
    stream.start()

    audio, sr = load_wav(args.wav)
    chunk = sr // 2
    for i in range(0, len(audio), chunk):
        stream.add_audio(audio[i : i + chunk], sr)
    transcript = stream.stop()
    print("---")
    print(transcript.text)


if __name__ == "__main__":
    main()
