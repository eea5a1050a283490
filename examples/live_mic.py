"""Live microphone transcription (reference: examples using MicTranscriber).

With a microphone + sounddevice installed:
    python examples/live_mic.py

Headless (plays a WAV through the same path):
    python examples/live_mic.py --wav /root/reference/test-assets/two_cities_16k.wav
"""

import argparse
import time

from moonshine_tpu.mic import MicTranscriber, WavSource


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--model", default="tiny")
    p.add_argument("--wav", default=None, help="WAV file instead of a microphone")
    p.add_argument("--seconds", type=float, default=20.0)
    args = p.parse_args()

    mic = MicTranscriber().model_arch(args.model).on_text(lambda t: print(f"> {t}"))
    if args.wav:
        mic.audio_source(WavSource(args.wav))
    mic.load()
    mic.start()
    try:
        time.sleep(args.seconds)
    except KeyboardInterrupt:
        pass
    transcript = mic.stop()
    print("--- final ---")
    for line in transcript.lines:
        print(f"[{line.start_time:6.2f}s] {line.text}")


if __name__ == "__main__":
    main()
