#!/bin/sh
# Package the engine for cluster submission:
#   sh scripts/make_pyfiles.sh
#   spark-submit --master <cluster> --py-files dist/ferenda_spark.zip \
#       scripts/submit_flagship.py --sf <pages dir> --out <store dir>
# The zip ships ONLY the library package; the job file goes as the
# application argument (spark-submit distributes both to executors).
set -e
cd "$(dirname "$0")/.."
mkdir -p dist
rm -f dist/ferenda_spark.zip
python - <<'EOF'
import os
import zipfile

with zipfile.ZipFile("dist/ferenda_spark.zip", "w",
                     zipfile.ZIP_DEFLATED) as z:
    for root, dirs, files in os.walk("ferenda_spark"):
        dirs[:] = [d for d in dirs if d != "__pycache__"]
        for f in files:
            if f.endswith(".py"):
                p = os.path.join(root, f)
                z.write(p, p)
print("wrote dist/ferenda_spark.zip")
EOF
