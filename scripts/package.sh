#!/usr/bin/env bash
# Build the --py-files zip for spark-submit (north rule: "ships as
# spark-submit --py-files package").
set -euo pipefail
cd "$(dirname "$0")/.."
rm -f dist/pastash_spark.zip
mkdir -p dist
zip -qr dist/pastash_spark.zip pastash_spark -x '*__pycache__*'
echo "dist/pastash_spark.zip"
