#!/usr/bin/env python3
"""Analyze the r9-vs-r10 interleaved A/B bench runs (r10 verdict #1).

Reads raw per-run lines from both trees' BENCH_LOG.jsonl, restricts to
sf0.1 full-suite runs, and compares the SHARED query set (the r9
suite) per run: today's interleaved pairs vs each round's closing
window. Prints per-run shared-set totals and the q83_pagerank series.
Runs missing any shared query are SKIPPED from the comparison (a
partial total would bias that tree's shared-set number downward).
"""
import json, sys

def runs(path):
    out = []
    for line in open(path):
        try:
            o = json.loads(line)
        except Exception:
            continue
        b = o.get("bench", {})
        if b.get("sf") != "/root/testdata/sf0.1":
            continue
        qs = b.get("queries", {})
        out.append((o.get("ts", ""), o.get("sha", ""), qs))
    return out

r10 = runs("/root/repo/BENCH_LOG.jsonl")
r9 = runs("/root/repo-r9/BENCH_LOG.jsonl")

# the shared set = the r9 suite's keys (full r9 runs have 194 queries)
r9full = [r for r in r9 if len(r[2]) >= 190]
if not r9full:
    sys.exit("no full-suite (>=190 query) r9 runs in /root/repo-r9 log")
shared = set(r9full[-1][2].keys())
print(f"shared query set: {len(shared)}")

def report(tag, rs, cutoff):
    for ts, sha, qs in rs:
        if len(qs) < 190:
            continue
        missing = shared - set(qs)
        if missing:
            print(f"{tag} SKIP ts={ts[:19]} sha={sha} missing "
                  f"{len(missing)} shared queries: "
                  f"{sorted(missing)[:3]}...")
            continue
        tot = sum(qs[k] for k in shared)
        when = "TODAY-AB" if ts >= cutoff else "closing"
        print(f"{tag} {when} ts={ts[:19]} sha={sha} shared{len(shared)}"
              f"={tot:.1f}s q83={qs.get('q83_pagerank', float('nan')):.2f}"
              f" total_all={sum(qs.values()):.1f}")

CUT = sys.argv[1] if len(sys.argv) > 1 else "2026-08-14T19:15"
report("r9 ", r9, CUT)
report("r10", r10, CUT)
