#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB-oracle compare.

Usage: oracle_check.py <sfDir> <outDir> [perQueryTimeoutSec]
Reads <outDir>/<name>/ parquet (Spark results) + <outDir>/oracle_sql.json,
runs each SQL in DuckDB against the sfDir tables, and diffs values with
columns sorted by name and rows sorted by all columns.

The optional timeout (sf1-scale runs: some oracles brute-force what the
engine computes bucketed, so DuckDB cost is quadratic where Spark's
isn't) interrupts a long oracle and records TIMEOUT — an unverified
row, not a failure; the driver's sf0.01 gate stays the authority.
"""
import sys, os, json, glob, threading
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        vals = []
        for i in order:
            v = r[i]
            if isinstance(v, float):
                v = round(v, 9) + 0.0  # also folds IEEE -0.0 into 0.0
            vals.append(repr(v))
        out.append(tuple(vals))
    out.sort()
    return [cols[i] for i in order], out

def main(sf_dir, out_dir, timeout_sec=None):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(p):  # Spark-written table dir: glob the parts
            p = f"{p}/part-*.parquet"
        elif not os.path.exists(p):
            continue
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = n_timeout = 0
    for name in sorted(oracle):
        spark_dir = f"{out_dir}/{name}"
        files = glob.glob(f"{spark_dir}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output")
            n_fail += 1
            continue
        timer = None
        timed_out = []
        done = []  # set before leaving the try: a timer firing after
        # the last fetch must NOT con.interrupt() an idle connection
        # (the interrupt would abort the NEXT query's execute and
        # misreport it as FAIL)
        if timeout_sec:
            def interrupt():
                if not done:
                    timed_out.append(True)
                    con.interrupt()
            timer = threading.Timer(timeout_sec, interrupt)
            timer.start()
            # absorb any stale interrupt a prior query's timer race
            # may have left pending on the shared connection
            try:
                con.execute("SELECT 1").fetchall()
            except Exception:
                pass
        try:
            sr = con.execute(f"SELECT * FROM read_parquet('{spark_dir}/*.parquet')")
            scols = [d[0] for d in sr.description]
            stypes = [str(d[1]) for d in sr.description]
            srows = sr.fetchall()
            dr = con.execute(oracle[name])
            dcols = [d[0] for d in dr.description]
            dtypes = [str(d[1]) for d in dr.description]
            drows = dr.fetchall()
            done.append(True)
        except Exception as e:
            if timed_out:
                n_timeout += 1
                print(f"TIMEOUT {name}: oracle exceeded {timeout_sec}s")
            else:
                print(f"FAIL {name}: {type(e).__name__}: {str(e)[:300]}")
                n_fail += 1
            if timer:
                timer.cancel()
            continue
        finally:
            if timer:
                timer.cancel()
        sc, sv = canon(srows, scols)
        dc, dv = canon(drows, dcols)
        # Type parity: the driver hashes TYPED values, so a DuckDB
        # aggregate that widens (sum(BIGINT) -> HUGEINT, sum(INT) ->
        # INT128) hash-mismatches even when every value compares equal
        # here.  Compare DuckDB type names per sorted column to catch
        # widening locally (this is what let q117 slip through in r5).
        st = {c: t for c, t in zip(scols, stypes)}
        dt = {c: t for c, t in zip(dcols, dtypes)}
        tdiff = [(c, st[c], dt[c]) for c in sc if c in dt and st[c] != dt[c]]
        if sc != dc:
            print(f"FAIL {name}: columns {sc} vs {dc}")
            n_fail += 1
        elif tdiff:
            n_fail += 1
            print(f"FAIL {name}: type mismatch " +
                  "; ".join(f"{c}: spark={a} oracle={b}" for c, a, b in tdiff))
        elif sv != dv:
            n_fail += 1
            diffs = [i for i, (a, b) in enumerate(zip(sv, dv)) if a != b]
            print(f"FAIL {name}: {len(sv)} vs {len(dv)} rows, "
                  f"{len(diffs) if len(sv)==len(dv) else '?'} differing")
            shown = 0
            if len(sv) == len(dv):
                for i in diffs:
                    print(f"   row {i} cols {sc}\n   spark={sv[i]}\n   duck ={dv[i]}")
                    shown += 1
                    if shown >= 3: break
            else:
                sset, dset = set(sv), set(dv)
                for r in list(sset - dset)[:2]: print(f"   only-spark: {r}")
                for r in list(dset - sset)[:2]: print(f"   only-duck : {r}")
        else:
            n_pass += 1
            print(f"PASS {name} ({len(sv)} rows)")
    extra = f" / {n_timeout} timeout" if n_timeout else ""
    print(f"\n{n_pass} pass / {n_fail} fail{extra}")
    return 1 if n_fail else 0

if __name__ == "__main__":
    to = float(sys.argv[3]) if len(sys.argv) > 3 else None
    sys.exit(main(sys.argv[1], sys.argv[2], to))
