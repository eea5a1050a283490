#!/usr/bin/env bash
# Banned-construct gate for the library source (the TPU analog of the
# reference's scripts/check-banned-constructs.sh + clang-tidy baseline).
#
# Each ban is a construct that has actually bitten this codebase or its
# platform (docs/PERF.md measurement discipline):
#
#   block_until_ready(   through the axon relay it does NOT synchronize;
#                        fencing must be a small host transfer.  A "wait"
#                        that doesn't wait corrupts every timing number.
#   np.random.<fn>(      module-level (unseeded, process-global) RNG in
#                        library code breaks reproducibility; use a seeded
#                        Generator/RandomState or jax.random keys.
#   time.time(           wall-clock deltas jump with NTP; intervals must
#                        use time.monotonic()/perf_counter().
#   jnp.float64          x64 is disabled (JAX_ENABLE_X64=0); f64 requests
#                        silently downcast to f32 — state the dtype you get.
#   pickle.load(         untrusted deserialization; checkpoints use
#                        safetensors/orbax, catalogs use JSON.
#   os.system(           shell-injection surface; use subprocess lists.
#   eval( / exec(        dynamic code execution in a library.
#
# Scope: moonshine_tpu/ (library only — tests and scripts may fence,
# sleep, and seed however they need).  Exits non-zero with the offending
# lines on any hit.  tests/test_banned_constructs.py runs this in CI.

set -u
cd "$(dirname "$0")/.."

fail=0

check() {
  local pattern="$1" why="$2" exclude="${3:-__NO_EXCLUDE__}"
  # Strip comments so documentation may NAME a banned construct.
  hits=$(grep -rEn "$pattern" moonshine_tpu --include='*.py' \
         | grep -vE '^[^:]*:[0-9]+:\s*#' \
         | sed -E 's/#.*$//' \
         | grep -E "$pattern" \
         | grep -vE "$exclude" || true)
  if [ -n "$hits" ]; then
    echo "BANNED: $why"
    echo "$hits"
    echo
    fail=1
  fi
}

check '\.block_until_ready\(' \
  "block_until_ready does not fence through the axon relay (docs/PERF.md)"
check 'np\.random\.(randn|rand|randint|normal|uniform|random|choice|seed|shuffle|permutation)\(' \
  "module-level numpy RNG (unseeded, process-global); use default_rng(seed)/RandomState(seed)"
check 'time\.time\(' \
  "wall-clock interval timing; use time.monotonic()/perf_counter()"
check 'jnp\.float64' \
  "x64 is disabled — jnp.float64 silently downcasts to f32"
check 'pickle\.(load|loads)\(' \
  "untrusted deserialization; use safetensors/orbax/JSON"
check 'os\.system\(' \
  "shell injection surface; use subprocess with list argv"
check '(^|[^A-Za-z_.])(eval|exec)\(' \
  "dynamic code execution in library source"

if [ "$fail" -ne 0 ]; then
  echo "check_banned_constructs: FAILED"
  exit 1
fi
echo "check_banned_constructs: OK"
