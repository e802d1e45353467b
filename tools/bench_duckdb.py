#!/usr/bin/env python3
"""Time the DuckDB oracle SQL for the bench headline queries — the first
non-vacuous competitive baseline (BASELINE.md publishes no numbers).

For each query in <outDir>/oracle_sql.json (as dumped by `graft.Verify`),
runs the SQL in DuckDB over the same parquet tables at <sfDir> and records
wall seconds (min of two runs, matching Bench's warm tier protocol). A
watchdog interrupts any query past --timeout seconds (the all-pairs oracle
formulations are intentionally naive — completeness checkers, not
competitive implementations; a timeout row records that honestly).

Usage:
  python3 tools/bench_duckdb.py [sfDir] [outDir] [--names n1,n2] \
      [--timeout 180] [--md BASELINE_DUCKDB.md]

Driver-side tooling only (duckdb/pandas are not dependencies of the
library itself).
"""
import json
import sys
import threading
import time

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    opts = {a.split("=", 1)[0][2:]: a.split("=", 1)[1]
            for a in sys.argv[1:] if a.startswith("--") and "=" in a}
    sf_dir = args[0] if args else "/root/testdata/sf0.1"
    out_dir = args[1] if len(args) > 1 else "/tmp/graft_verify"
    timeout = float(opts.get("timeout", "180"))
    md_path = opts.get("md", "")
    names = opts.get("names", "").split(",") if opts.get("names") else None

    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    if names:
        oracle = {k: v for k, v in oracle.items() if k in set(names)}

    con = duckdb.connect()
    con.execute("SET threads TO 32")
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{sf_dir}/{t}.parquet')")

    def timed(sql):
        """(seconds, status): one run, interrupted past the watchdog.

        Each run gets its OWN cursor (a duplicate connection onto the same
        in-memory database, so the views are visible) and the watchdog
        interrupts only that cursor. With a shared connection there was a
        race: the timeout could expire in the window between fetchall()
        returning and done.set(), landing a stale interrupt on the NEXT
        query and recording a false timeout against the wrong name. A
        per-run cursor makes a late interrupt hit an already-closed
        handle — harmless by construction.
        """
        cur = con.cursor()
        done = threading.Event()

        def watchdog():
            if not done.wait(timeout) and not done.is_set():
                cur.interrupt()
        w = threading.Thread(target=watchdog, daemon=True)
        w.start()
        t0 = time.time()
        try:
            cur.execute(sql).fetchall()
            return time.time() - t0, "ok"
        except duckdb.InterruptException:
            return time.time() - t0, "timeout"
        except Exception as e:  # noqa: BLE001 - record, keep benching
            return time.time() - t0, f"error: {str(e)[:80]}"
        finally:
            done.set()
            w.join(timeout=1)
            cur.close()

    rows = []
    for name in sorted(oracle):
        s1, st1 = timed(oracle[name])
        if st1 == "ok":
            s2, st2 = timed(oracle[name])
            sec = min(s1, s2) if st2 == "ok" else s1
        else:
            sec = s1
        rows.append((name, sec, st1))
        print(f"[duckdb] {name}: {sec:.3f} s ({st1})", flush=True)

    total_ok = sum(s for _, s, st in rows if st == "ok")
    n_ok = sum(1 for r in rows if r[2] == "ok")
    print(json.dumps({
        "metric": "duckdb_oracle_total", "value": round(total_ok, 3),
        "unit": "sec", "sf": sf_dir, "n_ok": n_ok, "n": len(rows),
        "queries": {n: round(s, 3) for n, s, st in rows if st == "ok"},
        "not_ok": {n: st for n, s, st in rows if st != "ok"}}))

    if md_path:
        with open(md_path, "w") as f:
            f.write("# DuckDB oracle timings (single node, 32 threads)\n\n")
            f.write(f"Data: `{sf_dir}`. Min of two runs per query, "
                    f"{timeout:.0f}s watchdog. These time the ORACLE "
                    "formulations (deliberately naive all-pairs checkers "
                    "for the screen queries) — a competitive floor for the "
                    "relational/aggregation queries, an upper bound for "
                    "the screened ones.\n\n")
            f.write("| query | duckdb sec | status |\n|---|---|---|\n")
            for name, sec, st in rows:
                f.write(f"| {name} | {sec:.3f} | {st} |\n")
            f.write(f"\nTotal (ok only): {total_ok:.3f} s over {n_ok} "
                    f"of {len(rows)} queries.\n")


if __name__ == "__main__":
    main()
