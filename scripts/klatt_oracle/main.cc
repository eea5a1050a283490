// Oracle driver for the reference Klatt formant TTS engine.
//
// Compiles the UNMODIFIED reference sources in place from /root/reference
// (micro/klatt-tts + micro/g2p) -- nothing is vendored into this repo -- and
// renders one utterance to raw float32 PCM so the TPU-native port
// (moonshine_tpu/tts/klatt.py) can be golden-tested against the real engine,
// exactly like scripts/g2p_oracle does for the G2P rules.
//
// Usage:
//   klatt_oracle --ipa  "<ipa string>"  [opts] out.f32
//   klatt_oracle --text "<plain text>"  [opts] out.f32
// opts: --sr <hz> --speed <x> --question
// Prints "<n_samples> <sample_rate>" on stdout.

#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <string>
#include <vector>

#include "tts/tts.h"

int main(int argc, char** argv) {
  const char* ipa = nullptr;
  const char* config = nullptr;
  const char* text = nullptr;
  const char* out_path = nullptr;
  float sr = 22050.0f, speed = 1.0f;
  bool question = false;
  for (int i = 1; i < argc; ++i) {
    if (!std::strcmp(argv[i], "--ipa") && i + 1 < argc) ipa = argv[++i];
    else if (!std::strcmp(argv[i], "--text") && i + 1 < argc) text = argv[++i];
    else if (!std::strcmp(argv[i], "--sr") && i + 1 < argc) sr = std::atof(argv[++i]);
    else if (!std::strcmp(argv[i], "--speed") && i + 1 < argc) speed = std::atof(argv[++i]);
    else if (!std::strcmp(argv[i], "--question")) question = true;
    else if (!std::strcmp(argv[i], "--config") && i + 1 < argc) config = argv[++i];
    else out_path = argv[i];
  }
  if ((ipa == nullptr) == (text == nullptr) || out_path == nullptr) {
    std::fprintf(stderr, "usage: %s --ipa|--text <s> [--sr hz] [--speed x] [--question] out.f32\n", argv[0]);
    return 1;
  }

  tts::VoiceParams voice = tts::DefaultVoiceParams();
  if (config != nullptr && !tts::LoadVoiceConfig(config, voice)) {
    std::fprintf(stderr, "bad config: %s\n", config);
    return 4;
  }
  static uint8_t arena[1 << 22];
  tts::StreamSynth synth(voice, arena, sizeof(arena));
  tts::StreamOptions opts;
  opts.sample_rate = sr;
  opts.speed = speed;
  opts.question = question;
  const int rc = ipa ? synth.BeginIpa(ipa, opts) : synth.BeginText(text, opts);
  if (rc != tts::kStreamOk) {
    std::fprintf(stderr, "Begin failed: %d\n", rc);
    return 2;
  }
  std::vector<float> pcm;
  float buf[512];
  for (int n; (n = synth.Read(buf, 512)) > 0;) pcm.insert(pcm.end(), buf, buf + n);
  FILE* f = std::fopen(out_path, "wb");
  if (!f) return 3;
  std::fwrite(pcm.data(), sizeof(float), pcm.size(), f);
  std::fclose(f);
  std::printf("%zu %d\n", pcm.size(), static_cast<int>(sr));
  return 0;
}
