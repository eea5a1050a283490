#ifndef STUB_ORT_UTILS_CXX_H
#define STUB_ORT_UTILS_CXX_H

#include "onnxruntime_cxx_api.h"

inline Ort::Env make_ort_env(OrtLoggingLevel level, const char* name) {
  return Ort::Env(level, name);
}

#endif
