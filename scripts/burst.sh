#!/bin/bash
# Closing certification burst: N sequential full-suite bench runs at
# the CURRENT src/main tree, so the cross-run per-query medians the
# round artifact certifies from have >= N same-sha samples (the r13
# lesson: a 2-sample closing sha let one hot host window inflate the
# shipped number ~19%). Usage:
#   scripts/burst.sh [N] [sfDir]
cd "$(dirname "$0")/.."
N=${1:-5}
SF=${2:-/root/testdata/sf0.1}
if [ -n "$(git status --porcelain src/main)" ]; then
  echo "burst: src/main is dirty - commit first (samples at a -dirty sha never pool)" >&2
  exit 1
fi
for i in $(seq 1 "$N"); do
  echo "=== burst run $i/$N ($(date -u +%H:%M:%S)) ==="
  SPARK_GRAFT_SF_DIR="$SF" SPARK_GRAFT_CPUS=32 scripts/bench.sh 2>&1 \
    | tail -1
done
