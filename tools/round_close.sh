#!/usr/bin/env bash
# Round-close checks: run before the end-of-round commit.
#  1. inventory_check  — SparkEntry.queries / oracleSql / SURVEY §2 stay 1:1
#  2. gen_readme_index — README operator index regenerated from the registry
#  3. reminder of the two measurement gates the driver replays
set -euo pipefail
cd "$(dirname "$0")/.."
python3 tools/inventory_check.py
python3 tools/gen_readme_index.py
if ! git diff --quiet README.md; then
  echo "README.md index regenerated — review and commit it"
fi
echo "round-close checks OK. Remaining gates (run if source changed):"
echo "  sbt -batch test"
echo "  sbt -batch 'runMain graft.Verify /root/testdata/sf0.01 /tmp/v' && python3 tools/check.py /root/testdata/sf0.01 /tmp/v"
echo "  SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt -batch 'runMain graft.Bench'"
