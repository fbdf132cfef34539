#!/bin/bash
# Package the engine and run the CDC replay through spark-submit --py-files
# (the north rule's deployment shape). Run from anywhere; imports must come
# from the shipped zip, which the driver asserts by printing the package path.
set -euo pipefail
REPO="$(cd "$(dirname "$0")/.." && pwd)"
ZIP=$(mktemp -u /tmp/diffsync_spark_XXXX.zip)
(cd "$REPO" && zip -qr "$ZIP" diffsync_spark -x '*__pycache__*')
cd /tmp  # away from the repo so the zip, not the checkout, is imported
/opt/spark/bin/spark-submit --master "local[${SPARK_GRAFT_CPUS:-8}]" \
    --conf spark.sql.shuffle.partitions="${SPARK_GRAFT_CPUS:-8}" \
    --py-files "$ZIP" \
    "$REPO/scripts/submit_replay.py" --events "${1:-1000000}"
rm -f "$ZIP"
