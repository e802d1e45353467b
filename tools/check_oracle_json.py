#!/usr/bin/env python3
"""Oracle compare with a JSON artifact + per-oracle timeout — the sf1
correctness gate (VERDICT r8 #3). Same compare semantics as
check_oracle.py (columns sorted by name, exact values), plus:

 - writes {name: {rows_match, schema_match, hash_match, spark_rows,
   oracle_rows, sec, err}} to the json path (CORRECTNESS_r* format,
   with hash_match = full value equality);
 - each DuckDB oracle runs under a watchdog (con.interrupt() after
   --timeout seconds) — a timeout records err="oracle_timeout(Ns)"
   instead of hanging the gate;
 - optional --only name,name filter.

Usage: python3 tools/check_oracle_json.py SF_DIR OUT_DIR JSON_OUT
         [--timeout N] [--only q01,...]
"""
import json
import sys
import threading

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
    """The driver's hash is REPRESENTATION-sensitive: int64 6 and
    float64 6.0 hash differently even though Python == calls them equal
    — the exact blind spot that let q150/q157 pass five local gates in
    r16 and fail the driver (DuckDB HUGEINT arrives in pandas as
    float64/object). Compare dtype CLASSES, not widths: int32 vs int64
    is fine, int vs float is not. Both frames come through the same
    duckdb .df() path, so null-widening (int+NULL -> float64) is
    symmetric and does not false-positive here."""
    for c in got.columns:
        a, b = dtype_class(got[c].dtype), dtype_class(want[c].dtype)
        if a != b:
            return (f"dtype col={c}: spark={got[c].dtype}({a}) "
                    f"duckdb={want[c].dtype}({b})")
    return None


def main():
    # accept BOTH --opt=value and --opt value (the docstring advertises
    # the space form; silently dropping it would run every oracle with
    # the default timeout)
    args, opts = [], {}
    argv = sys.argv[1:]
    i = 0
    while i < len(argv):
        a = argv[i]
        if a.startswith("--"):
            if "=" in a:
                k, v = a.lstrip("-").split("=", 1)
            elif i + 1 < len(argv):
                k, v = a.lstrip("-"), argv[i + 1]
                i += 1
            else:
                raise SystemExit(f"option {a} needs a value")
            opts[k] = v
        else:
            args.append(a)
        i += 1
    sf_dir, out_dir, json_out = args[0], args[1], args[2]
    timeout = float(opts.get("timeout", 300))
    only = set(opts["only"].split(",")) if "only" in opts else None

    tables = ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]
    con = duckdb.connect()
    for t in tables:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{sf_dir}/{t}.parquet')")

    oracle_path = f"{out_dir}/oracle_sql.json"
    try:
        oracle = json.load(open(oracle_path))
    except FileNotFoundError:
        oracle = json.load(open(f"{out_dir}/oracle_sql.partial.json"))
    report = {}
    fails = 0
    # Full runs also bind every oracle's TYPES in DuckDB (no execution)
    # via check_oracle_types.py — a HUGEINT/float-vs-integral oracle is
    # a gate failure even when its values compare equal (VERDICT r16 #2:
    # the driver's hash is representation-sensitive; the local gate must
    # not be able to diverge from it again).
    if only is None:
        import os
        import subprocess
        sweep = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             "check_oracle_types.py")
        r = subprocess.run([sys.executable, sweep, sf_dir, out_dir],
                           capture_output=True, text=True)
        print(r.stdout, end="")
        if r.returncode != 0:
            fails += 1
            report["_type_sweep"] = {"err": r.stdout.strip()[-400:] or
                                            r.stderr.strip()[-400:]}
    for name, sql in sorted(oracle.items()):
        if only is not None and name not in only:
            continue
        row = {"rows_match": False, "schema_match": False,
               "hash_match": False, "spark_rows": None, "oracle_rows": None,
               "sec": None, "err": None}
        report[name] = row
        import time
        t0 = time.time()
        # the Spark-output read runs OUTSIDE the watchdog: it must not
        # consume the oracle's timeout budget, and a failure here is a
        # missing/corrupt dump, not an oracle timeout
        try:
            got = con.execute(
                f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')").df()
        except Exception as e:
            row["err"] = str(e)[:200]
            print(f"FAIL {name}: {row['err']}")
            fails += 1
            continue
        # watchdog with a done-flag under a lock: a bare Timer(con.
        # interrupt) can fire AFTER the query completes but before
        # cancel(), leaving a stray interrupt that kills the NEXT oracle
        done, lock = [False], threading.Lock()

        def _maybe_interrupt():
            with lock:
                if not done[0]:
                    con.interrupt()

        timer = threading.Timer(timeout, _maybe_interrupt)
        timer.start()
        try:
            want = con.execute(sql).df()
        except Exception as e:
            msg = str(e)[:200]
            if "INTERRUPT" in msg.upper():
                msg = f"oracle_timeout({timeout:.0f}s)"
            row["err"] = msg
            print(f"FAIL {name}: {msg}")
            fails += 1
            continue
        finally:
            with lock:
                done[0] = True
            timer.cancel()
            # absorb a stray interrupt that slipped between query
            # completion and the flag write (TOCTOU window is tiny but
            # nonzero): a throwaway statement eats it harmlessly
            try:
                con.execute("SELECT 1")
            except Exception:
                pass
        row["sec"] = round(time.time() - t0, 2)
        got = got[sorted(got.columns)]
        want = want[sorted(want.columns)]
        row["spark_rows"], row["oracle_rows"] = len(got), len(want)
        if list(got.columns) != list(want.columns):
            row["err"] = (f"columns {list(got.columns)} != "
                          f"{list(want.columns)}")[:200]
            print(f"FAIL {name}: {row['err']}")
            fails += 1
            continue
        row["schema_match"] = True
        if len(got) != len(want):
            row["err"] = f"rows {len(got)} != {len(want)}"
            print(f"FAIL {name}: {row['err']}")
            fails += 1
            continue
        row["rows_match"] = True
        dt_err = dtype_mismatch(got, want)
        if dt_err:
            row["err"] = dt_err[:200]
            print(f"FAIL {name}: {dt_err}")
            fails += 1
            continue
        mismatch = None
        for c in got.columns:
            for i, (x, y) in enumerate(zip(got[c].tolist(), want[c].tolist())):
                if not same(x, y):
                    diff = abs(x - y) if isinstance(x, float) else None
                    mismatch = (c, i, x, y, diff)
                    break
            if mismatch:
                break
        if mismatch:
            c, i, x, y, diff = mismatch
            row["err"] = f"col={c} row={i}: spark={x!r} duckdb={y!r} absdiff={diff}"[:200]
            print(f"FAIL {name}: {row['err']}")
            fails += 1
        else:
            row["hash_match"] = True
            print(f"OK   {name}: {len(got)} rows, {len(got.columns)} cols "
                  f"({row['sec']}s)")

    # MERGE into an existing artifact instead of clobbering it: batch
    # and --only runs update just their own entries (the sf1/sf10 gates
    # are assembled from several runs; before this, a filtered re-check
    # would silently drop every other query's record)
    merged = report
    try:
        with open(json_out) as f:
            merged = json.load(f)
        merged.update(report)
    except (FileNotFoundError, ValueError):
        pass
    # a clean full run clears any stale sweep finding from a prior run
    if only is None and "_type_sweep" not in report:
        merged.pop("_type_sweep", None)
    # ...but on a FULL (unfiltered) run, prune merged keys that are no
    # longer in the live oracle registry: a renamed/removed query must
    # not keep a stale PASS record forever (ADVICE r13). `_meta`-style
    # annotation keys survive the prune.
    if only is None:
        stale = [k for k in merged
                 if k not in oracle and not k.startswith("_")]
        for k in stale:
            del merged[k]
            print(f"PRUNE {k}: no longer in the oracle registry")
    with open(json_out, "w") as f:
        json.dump(merged, f, indent=1, sort_keys=True)
    # The summary counts REAL oracle queries only; the type sweep (an
    # underscore report key that also increments `fails`) gets its own
    # verdict line instead of silently skewing the n/fails arithmetic
    # (ADVICE r17: a sweep-only failure used to print "164/165 match"
    # when all 165 value-compares passed).
    n = len([k for k in report if not k.startswith("_")])
    sweep_failed = 1 if "_type_sweep" in report else 0
    print(f"\n{n - (fails - sweep_failed)}/{n} oracle queries match"
          + (" [TYPE SWEEP FAILED]" if sweep_failed else "")
          + f" -> {json_out}")
    sys.exit(1 if fails else 0)


main()
