#!/usr/bin/env bash
# Release gate + artifact build (reference analog: the release/publish
# scripts under reference scripts/ — version-stamped model/package
# publishing; here the artifact is the Python wheel + the native client
# library, and "publishing" is copying to a dist directory, since this
# environment has zero egress).
#
# Usage: bash scripts/release.sh [--skip-tests] [outdir]
set -euo pipefail
cd "$(dirname "$0")/.."

# Never touch the TPU from the release pipeline (wheel + native builds
# are host-only; grabbing the chip here can kill a concurrent bench).
export MOONSHINE_TPU_PLATFORM=cpu

SKIP_TESTS=0
OUT=dist
for a in "$@"; do
  case "$a" in
    --skip-tests) SKIP_TESTS=1 ;;
    *) OUT="$a" ;;
  esac
done

VERSION=$(python -c "import moonshine_tpu;print(moonshine_tpu.__version__)")
echo "== moonshine_tpu release $VERSION =="

echo "-- gate: banned constructs"
bash scripts/check_banned_constructs.sh

echo "-- gate: native reliability (ASan/UBSan/TSan selftests)"
bash scripts/reliability.sh >/dev/null
echo "reliability OK"

if [ "$SKIP_TESTS" != 1 ]; then
  echo "-- gate: fast test suite"
  python -m pytest tests/ -q -x
fi

echo "-- build: wheel"
mkdir -p "$OUT"
python -m pip wheel --no-deps --no-build-isolation -w "$OUT" . >/dev/null
ls -1 "$OUT"/moonshine_tpu-"$VERSION"-*.whl

echo "-- build: native client library"
python - <<'EOF'
from moonshine_tpu.runtime.native_client import build_native
p = build_native(force=True)
assert p is not None, "native build failed"
print(p)
EOF
cp "$(python -c 'from moonshine_tpu.runtime.native_client import build_native; print(build_native())')" "$OUT/"

echo "-- manifest"
python - "$OUT" "$VERSION" <<'EOF'
import hashlib
import json
import sys
from pathlib import Path

out, version = Path(sys.argv[1]), sys.argv[2]
manifest = {"version": version, "artifacts": {}}
for f in sorted(out.iterdir()):
    if f.name == "MANIFEST.json" or f.is_dir():
        continue
    manifest["artifacts"][f.name] = {
        "sha256": hashlib.sha256(f.read_bytes()).hexdigest(),
        "bytes": f.stat().st_size,
    }
(out / "MANIFEST.json").write_text(json.dumps(manifest, indent=2) + "\n")
print(json.dumps(manifest, indent=2))
EOF

echo "== release $VERSION OK -> $OUT =="
