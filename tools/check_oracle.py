#!/usr/bin/env python3
"""Local pre-flight for the driver's t2 correctness gate.

Runs AFTER `sbt "runMain graft.Verify <sfDir> <outDir>"`:
for each <outDir>/<name>/ parquet result, runs the matching SQL from
<outDir>/oracle_sql.json in DuckDB over the same testdata parquet tables and
compares (columns sorted by name, exact values; floats reported with max
abs diff on mismatch).

Usage: python3 tools/check_oracle.py [sfDir] [outDir]
"""
import json, sys, math
import duckdb
import pandas as pd


def same(x, y):
    try:
        if pd.isna(x) and pd.isna(y):
            return True
    except (TypeError, ValueError):
        pass
    return x == y


def dtype_class(dt):
    k = dt.kind
    if k in "iu":
        return "int"
    if k == "f":
        return "float"
    if k == "b":
        return "bool"
    if k in "Mm":
        return "time"
    return "other"


def dtype_mismatch(got, want):
    """Driver-parity guard (VERDICT r16 #2): the driver's hash compare
    is representation-sensitive, so an int64 Spark column vs a HUGEINT
    oracle column (pandas float64) must FAIL here even though the
    values are ==-equal. Classes, not widths: int32 vs int64 passes."""
    for c in got.columns:
        a, b = dtype_class(got[c].dtype), dtype_class(want[c].dtype)
        if a != b:
            return (f"dtype col={c}: spark={got[c].dtype}({a}) "
                    f"duckdb={want[c].dtype}({b})")
    return None

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/graft_verify"

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

con = duckdb.connect()
for t in TABLES:
    con.execute(
        f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
fails = 0
for name, sql in sorted(oracle.items()):
    try:
        got = con.execute(
            f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')").df()
        want = con.execute(sql).df()
    except Exception as e:
        print(f"FAIL {name}: {str(e)[:200]}")
        fails += 1
        continue
    got = got[sorted(got.columns)]
    want = want[sorted(want.columns)]
    if list(got.columns) != list(want.columns):
        print(f"FAIL {name}: columns {list(got.columns)} != {list(want.columns)}")
        fails += 1
        continue
    if len(got) != len(want):
        print(f"FAIL {name}: rows {len(got)} != {len(want)}")
        fails += 1
        continue
    dt_err = dtype_mismatch(got, want)
    if dt_err:
        print(f"FAIL {name}: {dt_err}")
        fails += 1
        continue
    bad = []
    for c in got.columns:
        a, b = got[c].tolist(), want[c].tolist()
        for i, (x, y) in enumerate(zip(a, b)):
            if not same(x, y):
                diff = abs(x - y) if isinstance(x, float) else None
                bad.append((c, i, x, y, diff))
                break
    if bad:
        fails += 1
        print(f"FAIL {name}: {len(bad)} mismatching column(s)")
        for c, i, x, y, diff in bad[:5]:
            print(f"   col={c} row={i}: spark={x!r} duckdb={y!r} absdiff={diff}")
    else:
        print(f"OK   {name}: {len(got)} rows, {len(got.columns)} cols")

print(f"\n{len(oracle) - fails}/{len(oracle)} oracle queries match")
sys.exit(1 if fails else 0)
