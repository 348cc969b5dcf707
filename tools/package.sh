#!/usr/bin/env bash
# Build the --py-files artifact and show the spark-submit invocation
# (north_rule: "runs via spark-submit --py-files").
set -euo pipefail
cd "$(dirname "$0")/.."
rm -f dist/sparkdedup.zip
mkdir -p dist
zip -qr dist/sparkdedup.zip sparkdedup -x '*__pycache__*'
echo "built dist/sparkdedup.zip"
cat <<'USAGE'
Run on a cluster:
  spark-submit \
    --master <cluster-master> \
    --py-files dist/sparkdedup.zip \
    --conf spark.sql.adaptive.enabled=true \
    sparkdedup/__main__.py \
    -D <iceberg-table-or-parquet-path> -s similar -ro True \
    -Z <output-dir> --work_dir <checkpoint-dir>
Local smoke:
  python -m sparkdedup -D /root/testdata/sf0.01/documents.parquet ...
USAGE
