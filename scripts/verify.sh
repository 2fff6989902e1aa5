#!/bin/bash
# Run graft.Verify directly (no sbt startup), then the local DuckDB
# oracle compare. Usage:
#   [SPARK_GRAFT_ONLY=q146] scripts/verify.sh [sfDir] [outDir]
cd "$(dirname "$0")/.."
SF=${1:-/root/testdata/sf0.01}
OUT=${2:-/tmp/graft-verify}
CP="target/scala-2.13/classes:/opt/spark/jars/*"
ADD_OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent java.util.concurrent.atomic; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
for p in sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
java $ADD_OPENS \
  -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  -Xmx${SPARK_DRIVER_MEM:-24g} -XX:ReservedCodeCacheSize=2g \
  -cp "$CP" graft.Verify "$SF" "$OUT" || exit 1
python3 scripts/oracle_check.py "$SF" "$OUT"
