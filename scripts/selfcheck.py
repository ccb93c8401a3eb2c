#!/usr/bin/env python3
"""Dev-only self-check mirroring the driver's correctness gate:
runs DuckDB on SparkEntry.oracleSql (dumped by graft.Verify as
oracle_sql.json) and compares against the Spark result parquet per query.

Usage: python3 scripts/selfcheck.py <verify_out_dir> [sf_dir]
(Run `sbt "runMain graft.Verify /root/testdata/sf0.01 /tmp/vout"` first.)
"""
import json, math, sys, glob, os
import duckdb
import pandas as pd

out_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/vout"
sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"

con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

# When both a full and a partial dump exist, trust the most recently
# written one: a stale full dump must not shadow the fresh SQL of a
# just-iterated filtered run (and vice versa).
onames = [p for p in (f"{out_dir}/oracle_sql.json",
                      f"{out_dir}/oracle_sql.partial.json") if os.path.exists(p)]
if not onames:
    sys.exit(f"no oracle_sql[.partial].json under {out_dir}")
chosen = max(onames, key=os.path.getmtime)
if len(onames) == 2:
    print(f"WARN: both oracle dumps present; using newer {os.path.basename(chosen)}")
if chosen.endswith("partial.json"):
    print("NOTE: checking a PARTIAL (SPARK_GRAFT_ONLY) dump")
oracle = json.load(open(chosen))

def canon(df):
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df

fails = []
for name, sql in sorted(oracle.items()):
    pq = glob.glob(f"{out_dir}/{name}/*.parquet")
    if not pq:
        print(f"FAIL {name}: no spark output"); fails.append(name); continue
    try:
        got = canon(con.execute(f"SELECT * FROM read_parquet({pq!r})").df())
        want = canon(con.execute(sql).df())
    except Exception as e:
        print(f"FAIL {name}: {e}"); fails.append(name); continue
    if list(got.columns) != list(want.columns):
        print(f"FAIL {name}: columns {list(got.columns)} vs {list(want.columns)}")
        fails.append(name); continue
    if len(got) != len(want):
        print(f"FAIL {name}: rows {len(got)} vs {len(want)}"); fails.append(name); continue
    bad = None
    for c in got.columns:
        a, b = got[c], want[c]
        # int-vs-float dtype drift (e.g. DuckDB HUGEINT -> pandas float)
        # breaks the driver's exact hash even when values match — FAIL here
        # too so it can never pass locally and fail on the driver.
        if (a.dtype.kind == "f") != (b.dtype.kind == "f"):
            bad = f"col {c}: dtype mismatch {a.dtype} vs {b.dtype} (int-vs-float breaks driver hash)"
            break
        if a.dtype.kind == "f" or b.dtype.kind == "f":
            af = a.astype(float); bf = b.astype(float)
            # NOTE: the driver gate compares exactly (hash of rounded
            # values); the tiny tolerance here only absorbs summation-order
            # noise in the last rounded digit at larger SFs.
            close = (af - bf).abs() <= (1e-9 + 1e-9 * bf.abs())
            neq = ~(close | (af.isna() & bf.isna()))
            if neq.any():
                i = neq.idxmax()
                bad = f"col {c} row {i}: {af[i]!r} vs {bf[i]!r} (maxdiff={(af-bf).abs().max()})"
                break
        else:
            if not a.equals(b):
                neq = a.astype(str) != b.astype(str)
                if neq.any():  # dtype-only difference with equal values: PASS
                    i = neq.idxmax()
                    bad = f"col {c} row {i}: {a[i]!r} vs {b[i]!r}"
                    break
    if bad:
        print(f"FAIL {name}: {bad}"); fails.append(name)
    else:
        print(f"PASS {name} ({len(got)} rows)")

print(f"\n{len(oracle)-len(fails)}/{len(oracle)} passed")
sys.exit(1 if fails else 0)
