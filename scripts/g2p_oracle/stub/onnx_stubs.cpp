// Stub bodies for the ONNX-backed helpers. No helper models ship in-tree,
// so these are construction-time dead ends; callers gate on model-file
// existence before constructing.
#include <stdexcept>

#include "arabic-diac-onnx.h"
#include "onnx-g2p-models.h"

namespace moonshine_tts {

OnnxOovG2p::OnnxOovG2p(Ort::Env&, const std::filesystem::path&,
                       const std::vector<std::string>&, const std::string&) {
  throw std::runtime_error("ONNX OOV G2P unavailable in oracle build");
}

OnnxOovG2p::OnnxOovG2p(Ort::Env&, const void*, size_t, const nlohmann::json&,
                       const std::vector<std::string>&, const std::string&) {
  throw std::runtime_error("ONNX OOV G2P unavailable in oracle build");
}

std::vector<std::string> OnnxOovG2p::predict_phonemes(const std::string&) {
  return {};
}

// Identity diacritizer: with no model available the Arabic engine sees the
// input unvocalized, i.e. the rules-only tier.
ArabicDiacOnnx::ArabicDiacOnnx(std::filesystem::path model_dir, bool)
    : model_dir_(std::move(model_dir)) {}

ArabicDiacOnnx::ArabicDiacOnnx(const MoonshineG2POptions*, std::string_view,
                               std::filesystem::path model_dir_fallback, bool)
    : model_dir_(std::move(model_dir_fallback)) {}

ArabicDiacOnnx::~ArabicDiacOnnx() = default;

std::string ArabicDiacOnnx::diacritize(std::string_view text_utf8) const {
  return std::string(text_utf8);
}

}  // namespace moonshine_tts
