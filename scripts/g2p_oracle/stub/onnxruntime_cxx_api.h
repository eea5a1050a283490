// Minimal Ort type stubs so the reference's rule-only G2P engines link
// without ONNX Runtime (no Linux x86_64 ORT lib ships in-tree, and no ONNX
// helper models are in-tree either, so these paths are never exercised).
#ifndef STUB_ONNXRUNTIME_CXX_API_H
#define STUB_ONNXRUNTIME_CXX_API_H

#include <stdexcept>

enum OrtLoggingLevel { ORT_LOGGING_LEVEL_WARNING = 2 };
enum OrtAllocatorType { OrtArenaAllocator = 0 };
enum OrtMemType { OrtMemTypeDefault = 0 };

namespace Ort {

struct Env {
  Env() = default;
  Env(OrtLoggingLevel, const char*) {}
};

struct MemoryInfo {
  static MemoryInfo CreateCpu(OrtAllocatorType, OrtMemType) { return {}; }
};

struct Session {
  Session() = default;
};

struct RunOptions {
  RunOptions(decltype(nullptr)) {}
};

struct SessionOptions {
  SessionOptions() = default;
};

struct Value {
  Value() = default;
};

}  // namespace Ort

#endif
