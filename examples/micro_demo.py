"""The micro-stack demo pipeline: listen -> classify -> speak.

Analog of the reference's rp2350 demo firmware loop (reference:
micro/README.md "whole demo pipeline ~3.6 MiB flash / classify+speak
0.7-1.0 s": TinyVadCNN gates capture, SpellingCNN classifies the spoken
letter/digit, the formant TTS speaks it back) — same three models, same
dataflow, running on the host/TPU instead of an MCU:

  1. TinyVadCNN (REAL reference weights) finds the voiced span;
  2. SpellingCNN (REAL reference weights, 51 classes) classifies it;
  3. the Klatt formant voice (tts/klatt.py — code-only, zero weights)
     speaks the recognized character back.

With --wav the demo consumes a recording; without, it synthesizes its
own test utterance by speaking a letter through the Klatt voice first
(TTS -> ASR round trip, fully self-contained).

Run: python examples/micro_demo.py [--wav path.wav] [--out reply.wav]
"""

from __future__ import annotations

import argparse
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import numpy as np

REF_MODELS = pathlib.Path("/root/reference/micro/models")


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--wav", help="16 kHz mono input (default: self-test)")
    ap.add_argument("--out", default="/tmp/micro_demo_reply.wav")
    args = ap.parse_args()

    from moonshine_tpu.audio.wav import load_wav, save_wav
    from moonshine_tpu.models.spelling import SpellingOnnx
    from moonshine_tpu.models.vad import TinyVad
    from moonshine_tpu.tts.klatt import KlattTTS, deterministic_voice

    if not REF_MODELS.exists():
        print("reference micro models not available", file=sys.stderr)
        return 1

    tts = KlattTTS(voice=deterministic_voice())

    # --- input: recording, or a self-spoken letter ------------------------
    if args.wav:
        audio, sr = load_wav(args.wav)
        if sr != 16000:
            from moonshine_tpu.audio.resample import resample_audio

            audio = resample_audio(audio, sr, 16000)
        audio = np.asarray(audio, np.float32)
    else:
        # Self-test: speak the digit "eight" through the formant voice
        # and resample to the capture rate — the MCU demo's loopback
        # mode.  Despite the domain gap (synthetic formant speech vs the
        # CNN's human training voices), the full gated round trip
        # recognizes it at ~0.89 probability; several letters/digits
        # survive the trip (measured sweep: 8 at 0.89, 2 at 0.88, 1/k
        # recognized ungated), vowel-heavy letters do not — robotic
        # vowels sit off the training manifold.
        from moonshine_tpu.audio.resample import resample_audio

        spoken = tts.synthesize_ipa("ˈeɪt")
        audio = np.asarray(resample_audio(spoken, 22050, 16000), np.float32)
        print(f"self-test utterance: 'eight' ({len(audio) / 16000:.2f}s)")

    # --- 1) VAD gate (real TinyVadCNN weights, 512-sample hops) -----------
    vad = TinyVad.from_onnx(str(REF_MODELS / "tinyvad_cnn_speech_mel.onnx"))
    hop = 512
    n_hops = len(audio) // hop
    hops = audio[: n_hops * hop].reshape(1, n_hops, hop)
    probs, _ = vad.predict_hops(hops, vad.init_state(1))
    probs = np.asarray(probs[0])
    voiced = np.nonzero(probs > 0.5)[0]
    if len(voiced) == 0:
        print("no speech detected")
        return 0
    start = int(voiced[0]) * hop
    end = min((int(voiced[-1]) + 1) * hop, len(audio))
    span = audio[start:end]
    print(f"VAD span: {start / 16000:.2f}s .. {end / 16000:.2f}s "
          f"(peak prob {float(probs.max()):.2f})")

    # --- 2) classify (real SpellingCNN weights, 1 s window) ---------------
    stt = SpellingOnnx.from_onnx(str(REF_MODELS / "spelling_cnn_mel.onnx"))
    window = np.zeros(16000, np.float32)
    n = min(len(span), 16000)
    window[:n] = span[:n]
    pred = stt.predict(window)
    print(f"SpellingCNN: char={pred.character!r} "
          f"probability={pred.probability:.2f}")

    # --- 3) speak the result back (Klatt formant voice) -------------------
    reply = tts.synthesize(f"you said {pred.character}")
    save_wav(args.out, reply, 22050)
    print(f"spoke reply -> {args.out} ({len(reply) / 22050:.2f}s)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
