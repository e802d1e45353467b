#!/usr/bin/env python3
"""Registry-wide oracle TYPE sweep (VERDICT r16 #2b).

Binds every oracle SQL text in DuckDB with DESCRIBE (no execution) and
fails if any output column would reach the driver's hash compare with a
representation that cannot match Spark's parquet dump:

 - any HUGEINT / UHUGEINT column (DuckDB's sum(BIGINT) widens to
   HUGEINT; pandas renders it as float64/object, so a value-equal
   result still hash-mismatches — exactly how q150/q157 passed five
   local gates in r16 and failed the driver);
 - a DOUBLE/FLOAT oracle column where the committed Spark result
   parquet column is integral, or vice versa (6 vs 6.0).

Usage:
  python3 tools/check_oracle_types.py SF_DIR OUT_DIR   # full sweep
  python3 tools/check_oracle_types.py --selftest       # prove the
      checker still catches a deliberately-uncast HUGEINT oracle

OUT_DIR must hold oracle_sql.json (from graft.Verify); per-query Spark
parquet dumps are used for the float-vs-integral cross-check when
present (queries without a dump still get the HUGEINT screen).
Exit 1 on any finding.
"""
import json
import sys

import duckdb

BAD_ALWAYS = ("HUGEINT",)          # matches UHUGEINT too (substring)
INTEGRAL = {"TINYINT", "SMALLINT", "INTEGER", "BIGINT",
            "UTINYINT", "USMALLINT", "UINTEGER", "UBIGINT"}
FLOATING = {"FLOAT", "DOUBLE", "REAL"}

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def describe(con, sql):
    """column -> DuckDB type name for a query, without executing it."""
    rows = con.execute(f"DESCRIBE {sql}").fetchall()
    return {r[0]: r[1].upper() for r in rows}


def sweep(con, oracle, out_dir):
    findings = []
    for name, sql in sorted(oracle.items()):
        try:
            otypes = describe(con, sql)
        except Exception as e:  # a bind failure is itself a finding
            findings.append(f"{name}: DESCRIBE failed: {str(e)[:160]}")
            continue
        for c, t in otypes.items():
            if any(b in t for b in BAD_ALWAYS):
                findings.append(f"{name}: oracle col {c} types {t} "
                                f"(cast it in the SQL)")
        try:
            stypes = describe(
                con, f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')")
        except Exception:
            continue  # no Spark dump for this query; HUGEINT screen only
        for c, t in otypes.items():
            s = stypes.get(c)
            if s is None:
                continue  # column-name mismatch is the value gate's job
            if t in FLOATING and s in INTEGRAL:
                findings.append(f"{name}: oracle col {c} is {t} but the "
                                f"Spark dump is {s}")
            elif s in FLOATING and t in INTEGRAL:
                findings.append(f"{name}: Spark col {c} is {s} but the "
                                f"oracle types {t}")
    return findings


def selftest():
    con = duckdb.connect()
    bad = {"fake": "SELECT sum(CAST(x AS BIGINT)) AS s FROM range(3) t(x)"}
    good = {"fake": "SELECT CAST(sum(CAST(x AS BIGINT)) AS BIGINT) AS s "
                    "FROM range(3) t(x)"}
    got_bad = sweep(con, bad, "/nonexistent")
    got_good = sweep(con, good, "/nonexistent")
    assert got_bad and "HUGEINT" in got_bad[0], got_bad
    assert not got_good, got_good
    print("selftest OK: uncast sum(BIGINT) oracle is flagged, cast one passes")


def main():
    if len(sys.argv) == 2 and sys.argv[1] == "--selftest":
        selftest()
        return
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{sf_dir}/{t}.parquet')")
    try:
        oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    except FileNotFoundError:
        oracle = json.load(open(f"{out_dir}/oracle_sql.partial.json"))
    findings = sweep(con, oracle, out_dir)
    for f in findings:
        print(f"TYPE {f}")
    print(f"type sweep: {len(oracle)} oracles bound, "
          f"{len(findings)} finding(s)")
    sys.exit(1 if findings else 0)


main()
