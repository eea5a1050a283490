// G2P oracle CLI over the reference's rule engines (rules-only tier: empty
// lexicons, no ONNX helpers — matching the measurable comparison surface).
// Usage: g2p_oracle <lang> ; reads UTF-8 text lines on stdin, writes one IPA
// line per input line on stdout.
#include <iostream>
#include <memory>
#include <optional>
#include <fstream>
#include <string>

#include "arabic.h"
#include "chinese.h"
#include "dutch.h"
#include "english.h"
#include "french.h"
#include "german.h"
#include "hindi.h"
#include "italian.h"
#include "korean.h"
#include "portuguese.h"
#include "russian.h"
#include "spanish.h"
#include "turkish.h"
#include "ukrainian.h"
#include "vietnamese.h"

using namespace moonshine_tts;

int main(int argc, char** argv) {
  if (argc < 2) {
    std::cerr << "usage: g2p_oracle <lang>\n";
    return 2;
  }
  const std::string lang = argv[1];
  std::unique_ptr<RuleBasedG2p> eng;
  std::string dict = "";  // rules-only tier unless argv[2] gives a TSV
  if (argc >= 3) {
    std::ifstream in(argv[2]);
    dict.assign(std::istreambuf_iterator<char>(in),
                std::istreambuf_iterator<char>());
  }
  if (lang == "en" || lang == "en_us") {
    eng = std::make_unique<EnglishRuleG2p>(dict, std::nullopt);
  } else if (lang == "es_es") {
    eng = std::make_unique<SpanishRuleG2p>(spanish_dialect_from_cli_id("es-ES"),
                                           true);
  } else if (lang == "es_mx") {
    eng = std::make_unique<SpanishRuleG2p>(spanish_dialect_from_cli_id("es-MX"),
                                           true);
  } else if (lang == "de") {
    eng = std::make_unique<GermanRuleG2p>(dict);
  } else if (lang == "fr") {
    eng = std::make_unique<FrenchRuleG2p>(dict, std::string{});
  } else if (lang == "nl") {
    eng = std::make_unique<DutchRuleG2p>(dict);
  } else if (lang == "it") {
    eng = std::make_unique<ItalianRuleG2p>(dict);
  } else if (lang == "ru") {
    eng = std::make_unique<RussianRuleG2p>(dict);
  } else if (lang == "zh" || lang == "zh_hans") {
    eng = std::make_unique<ChineseRuleG2p>(dict);
  } else if (lang == "ko") {
    eng = std::make_unique<KoreanRuleG2p>(dict);
  } else if (lang == "vi") {
    eng = std::make_unique<VietnameseRuleG2p>(dict);
  } else if (lang == "ar") {
    eng = std::make_unique<ArabicRuleG2p>(std::string("/nonexistent"), dict);
  } else if (lang == "pt_br") {
    eng = std::make_unique<PortugueseRuleG2p>(dict, false);
  } else if (lang == "pt_pt") {
    eng = std::make_unique<PortugueseRuleG2p>(dict, true);
  } else if (lang == "tr") {
    eng = std::make_unique<TurkishRuleG2p>();
  } else if (lang == "uk") {
    eng = std::make_unique<UkrainianRuleG2p>();
  } else if (lang == "hi") {
    eng = std::make_unique<HindiRuleG2p>(dict);
  } else {
    std::cerr << "unknown lang " << lang << "\n";
    return 2;
  }
  std::string line;
  while (std::getline(std::cin, line)) {
    try {
      std::cout << eng->text_to_ipa(line) << "\n";
    } catch (const std::exception& e) {
      std::cout << "<<ERROR: " << e.what() << ">>\n";
    }
  }
  return 0;
}
