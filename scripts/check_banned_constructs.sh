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
# sleep, and seed however they need).  Comments are stripped with
# Python's tokenizer (docs may NAME a banned construct; a '#' inside a
# string literal does not hide code after it).  Exits non-zero with the
# offending lines on any hit.  tests/test_banned_constructs.py runs
# this in CI and proves it still detects violations.

set -u
cd "$(dirname "$0")/.."

python - <<'EOF'
import io
import re
import sys
import tokenize
from pathlib import Path

BANS = [
    (r"\.block_until_ready\(",
     "block_until_ready does not fence through the axon relay (docs/PERF.md)"),
    (r"np\.random\.(randn|rand|randint|normal|uniform|random|choice|seed|shuffle|permutation)\(",
     "module-level numpy RNG (unseeded, process-global); use default_rng(seed)/RandomState(seed)"),
    (r"time\.time\(",
     "wall-clock interval timing; use time.monotonic()/perf_counter()"),
    (r"jnp\.float64",
     "x64 is disabled — jnp.float64 silently downcasts to f32"),
    (r"pickle\.(load|loads)\(",
     "untrusted deserialization; use safetensors/orbax/JSON"),
    (r"os\.system\(",
     "shell injection surface; use subprocess with list argv"),
    (r"(^|[^A-Za-z_.])(eval|exec)\(",
     "dynamic code execution in library source"),
]

fail = False
for path in sorted(Path("moonshine_tpu").rglob("*.py")):
    src = path.read_text()
    # Strip COMMENT tokens only — '#' inside string literals stays code.
    try:
        toks = list(tokenize.generate_tokens(io.StringIO(src).readline))
    except (tokenize.TokenError, SyntaxError) as e:
        print(f"BANNED-GATE PARSE ERROR: {path}: {e}")
        fail = True
        continue
    lines = src.splitlines()
    for tok in toks:
        if tok.type == tokenize.COMMENT:
            row = tok.start[0] - 1
            col = tok.start[1]
            lines[row] = lines[row][:col]
    for lineno, line in enumerate(lines, 1):
        for pat, why in BANS:
            if re.search(pat, line):
                print(f"BANNED: {why}\n  {path}:{lineno}: {line.strip()}")
                fail = True

if fail:
    print("check_banned_constructs: FAILED")
    sys.exit(1)
print("check_banned_constructs: OK")
EOF
