#!/usr/bin/env bash
# Build dist/engine.zip for spark-submit --py-files.
set -euo pipefail
cd "$(dirname "$0")/.."
mkdir -p dist
rm -f dist/engine.zip
# engine package only; tests and data stay out of the executor payload
python - <<'EOF'
import zipfile, pathlib
root = pathlib.Path(".")
with zipfile.ZipFile("dist/engine.zip", "w", zipfile.ZIP_DEFLATED) as z:
    for p in sorted(root.glob("engine/**/*.py")):
        z.write(p, p.as_posix())
print("dist/engine.zip:", len(z.namelist()), "files")
EOF
