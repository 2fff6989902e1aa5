#!/bin/bash
# Interleaved A/B bench: r9 tree (d210091, worktree /root/repo-r9) vs
# r10 tree (01bd688, /root/repo), 3 pairs, alternating, full suite at
# sf0.1. Raw per-run lines land in each tree's BENCH_LOG.jsonl; this
# script also tees per-run stderr to /tmp/ab/ for the post-mortem.
set -u
mkdir -p /tmp/ab
export SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1
export SPARK_GRAFT_CPUS=32
for pair in 1 2 3; do
  for tree in r9 r10; do
    dir=/root/repo-r9
    [ "$tree" = r10 ] && dir=/root/repo
    echo "=== pair $pair $tree $(date -u +%H:%M:%S) ===" | tee -a /tmp/ab/summary.txt
    (cd "$dir" && bash scripts/bench.sh) \
      >"/tmp/ab/${tree}_p${pair}.out" 2>"/tmp/ab/${tree}_p${pair}.err"
    tail -c 300 "/tmp/ab/${tree}_p${pair}.out" >> /tmp/ab/summary.txt
    echo >> /tmp/ab/summary.txt
  done
done
echo "=== AB DONE $(date -u +%H:%M:%S) ===" | tee -a /tmp/ab/summary.txt
