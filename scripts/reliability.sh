#!/usr/bin/env bash
# Reliability suite for the native host runtime + Python fuzz analogs.
#
# Mirror of the reference's MOONSHINE_RELIABILITY pipeline (reference:
# scripts/reliability.sh:1-31, core/CMakeLists.txt:43-72): the C ABI is
# rebuilt and fuzz-driven under ASan+UBSan, then rebuilt separately under
# TSan (the two sanitizers cannot combine) for the threaded SPSC ring
# test, then the Python reliability tests run.
#
# Usage: scripts/reliability.sh [iters]   (default 2000)

set -euo pipefail
cd "$(dirname "$0")/.."
NATIVE=moonshine_tpu/runtime/native
BUILD="$NATIVE/build/reliability"
ITERS="${1:-2000}"
mkdir -p "$BUILD"

SRC="$NATIVE/moonshine_host.cpp $NATIVE/host_selftest.cpp"
CLIENT_SRC="$NATIVE/client_selftest.cpp"
COMMON="-std=c++17 -g -O1 -fno-omit-frame-pointer -I$NATIVE -pthread -D_GLIBCXX_ASSERTIONS"

echo "== ASan + UBSan build =="
g++ $COMMON -fsanitize=address,undefined -fno-sanitize-recover=all \
    $SRC -o "$BUILD/host_selftest_asan"
g++ $COMMON -fsanitize=address,undefined -fno-sanitize-recover=all \
    $CLIENT_SRC -o "$BUILD/client_selftest_asan"
echo "== ASan + UBSan run ($ITERS iters) =="
"$BUILD/host_selftest_asan" "$ITERS"
"$BUILD/client_selftest_asan" "$ITERS"

echo "== TSan build =="
g++ $COMMON -fsanitize=thread $SRC -o "$BUILD/host_selftest_tsan"
g++ $COMMON -fsanitize=thread $CLIENT_SRC -o "$BUILD/client_selftest_tsan"
echo "== TSan run ($ITERS iters) =="
"$BUILD/host_selftest_tsan" "$ITERS"
"$BUILD/client_selftest_tsan" "$ITERS"

echo "== Python reliability tests =="
python -m pytest tests/test_reliability.py tests/test_native_host.py -q

echo "RELIABILITY SUITE PASSED"
