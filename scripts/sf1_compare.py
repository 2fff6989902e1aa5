#!/usr/bin/env python3
"""SF1-FULL scale-law table (r12 verdict #1): per-query wall at the 10x
tree vs sf0.1, from BENCH_LOG.jsonl.

Usage: sf1_compare.py [sha] [ratio_gate]
Takes the per-query MEDIAN over all same-sha runs at each sf so one hot
window can't flag a query, prints every query's (sf0.1 s, sf1 s, ratio)
sorted by ratio, and lists the >gate offenders (default gate x4 — the
R12-SF1-SCALELAW bar: data x10, wall must stay under x4).

Streaming rows are harness-fixed-cost dominated (the feeds are fixture
batches, identical at every sf) — they are listed but exempt from the
gate, as are sub-0.3 s sf0.1 rows where the ratio is scheduler jitter.
"""
import json, sys, statistics

# sha may be comma-separated to pool runs across code-identical trees
# (e.g. a "-dirty" twin taken before recompiling, or doc-only commits)
shas = set(sys.argv[1].split(",")) if len(sys.argv) > 1 else None
gate = float(sys.argv[2]) if len(sys.argv) > 2 else 4.0

runs = {"/root/testdata/sf0.1": [], "/tmp/graft_sf1": []}
for line in open("BENCH_LOG.jsonl"):
    j = json.loads(line)
    b = j["bench"]
    if shas and j.get("sha") not in shas:
        continue
    if b["sf"] in runs:
        runs[b["sf"]].append(b["queries"])

def medians(rs):
    # union of keys across ALL runs: a query missing from the first
    # (failed/partial) run must still enter the scale-law table
    out = {}
    for q in (set().union(*[set(r) for r in rs]) if rs else set()):
        vals = [r[q] for r in rs if q in r]
        out[q] = statistics.median(vals)
    return out

m01 = medians(runs["/root/testdata/sf0.1"])
m1 = medians(runs["/tmp/graft_sf1"])
print(f"sha={sorted(shas) if shas else None} runs: sf0.1={len(runs['/root/testdata/sf0.1'])} "
      f"sf1={len(runs['/tmp/graft_sf1'])}")
common = sorted(set(m01) & set(m1), key=lambda q: -(m1[q] / max(m01[q], 1e-9)))
flagged = []
for q in common:
    r = m1[q] / max(m01[q], 1e-9)
    exempt = "streaming" in q or m01[q] < 0.3
    mark = ""
    if r > gate and not exempt:
        mark = " <<< FLAG"
        flagged.append(q)
    elif r > gate:
        mark = " (exempt)"
    print(f"{q:42s} {m01[q]:7.2f} {m1[q]:8.2f}  x{r:6.2f}{mark}")
print(f"\ntotal sf0.1={sum(m01[q] for q in common):.1f}s "
      f"sf1={sum(m1[q] for q in common):.1f}s "
      f"x{sum(m1[q] for q in common)/max(sum(m01[q] for q in common),1e-9):.2f}")
print(f"flagged (> x{gate}, non-exempt): {flagged or 'NONE'}")
