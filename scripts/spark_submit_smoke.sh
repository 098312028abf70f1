#!/usr/bin/env bash
# Proof that `spark-submit --py-files mitie_spark.zip` is a COMPLETE
# deployment: code and packaged model artifacts ship in one zip, no repo
# checkout on the driver or executors (the driver below asserts the
# package is zipimported). Model loaders resolve artifacts through
# mitie_spark/models/artifact_path.py: real path -> SparkFiles(--files)
# -> task CWD -> packaged resource materialized from the zip.
#
# Usage: scripts/spark_submit_smoke.sh [master]   (default local[8])
set -euo pipefail
cd "$(dirname "$0")/.."
MASTER="${1:-local[8]}"
WORK="$(mktemp -d)"
trap 'rm -rf "$WORK"' EXIT

python - "$WORK" <<'EOF'
import os, sys, zipfile
work = sys.argv[1]
with zipfile.ZipFile(os.path.join(work, "mitie_spark.zip"), "w",
                     zipfile.ZIP_DEFLATED) as z:
    for root, dirs, files in os.walk("mitie_spark"):
        dirs[:] = [d for d in dirs if d != "__pycache__"]
        for f in files:
            if f.endswith((".py", ".npz", ".json")):
                z.write(os.path.join(root, f), os.path.join(root, f))
EOF

cat > "$WORK/driver.py" <<'EOF'
import mitie_spark
assert "mitie_spark.zip" in mitie_spark.__file__, mitie_spark.__file__
print("PACKAGE_FROM_ZIP:", mitie_spark.__file__)
from mitie_spark.plans.pipeline import main
main()
EOF

cd "$WORK"  # away from the checkout so only the zip provides the package
PYTHONPATH= spark-submit --master "$MASTER" \
  --py-files "$WORK/mitie_spark.zip" "$WORK/driver.py" \
  --pages-dir "$WORK/pages" --gen-pages "${SMOKE_PAGES:-200}" \
  --out "$WORK/out" --master "$MASTER"
