#!/bin/bash
# Local verify loop: compile → dump → DuckDB compare.
# Usage: tools/verify.sh [sfDir] [outDir] [query ...]
set -e
cd "$(dirname "$0")/.."
SF="${1:-/root/testdata/sf0.001}"
OUT="${2:-/tmp/verify_out}"
shift 2 2>/dev/null || shift $#
OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net java.nio \
         java.util java.util.concurrent java.util.concurrent.atomic; do
  OPENS="$OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
for p in sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  OPENS="$OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
java $OPENS -Xmx8g -cp "target/scala-2.13/classes:/opt/spark/jars/*" \
  graft.Verify "$SF" "$OUT" 2>/dev/null
python3 tools/check.py "$SF" "$OUT" "$@"
