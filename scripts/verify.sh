#!/bin/bash
# Run graft.Verify directly (no sbt startup), then the local DuckDB
# oracle compare. Usage:
#   [SPARK_GRAFT_ONLY=q146] scripts/verify.sh [sfDir] [outDir]
cd "$(dirname "$0")/.."
SF=${1:-/root/testdata/sf0.01}
OUT=${2:-/tmp/graft-verify}
source scripts/_jvmflags.sh
java $ADD_OPENS $JVM_FLAGS -cp "$CP" graft.Verify "$SF" "$OUT" || exit 1
python3 scripts/oracle_check.py "$SF" "$OUT"
