#!/bin/sh
# Build the --py-files archive for spark-submit (north rule deployment mode):
#   tools/make_pyfiles_zip.sh [out.zip]
set -eu
cd "$(dirname "$0")/.."
OUT="${1:-xml2arrow_spark.zip}"
rm -f "$OUT"
# stdlib zip of the package only — no deps (numpy/pyarrow ship with the cluster image)
python - "$OUT" <<'EOF'
import os, sys, zipfile
out = sys.argv[1]
with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as z:
    for root, _dirs, files in os.walk("xml2arrow_spark"):
        if "__pycache__" in root:
            continue
        for f in files:
            if f.endswith(".py"):
                p = os.path.join(root, f)
                z.write(p, p)
print(out)
EOF
