#!/usr/bin/env python3
"""Replica block-key entropy check (VERDICT r11 #8, driver-side tooling).

The 10x replica's documents must never share a FuzzyMatch block key
across replicas: a cross-replica collision re-concentrates the r9
quadratic candidate artifact (pass-0 candidates explode on 10-way
planted near-dups). Two parts:

 1. SYNTHETIC boundary sweep — applies make_scale_replica.DOC_TEXT_EXPR
    (imported, so the check exercises the shipping expression) to
    first tokens of every length L in 1..20 for every replica index
    used by the tool, and asserts each (L, window) block key is unique
    per replica for BOTH multipass windows (chars 1-12 and 13-24).
    This pins the `L + 2 + len(i) > 12` prefix threshold: the r10
    ADVICE regression (prefixing only at L >= 12, leaving L = 10..11
    colliding) fails this sweep.

 2. CORPUS scan (optional, when a replica dir is given) — groups the
    actual replica documents by block key and fails on any key whose
    docs span more than one replica.

Usage: python3 tools/check_replica_entropy.py [replica_dir]
Exit 0 = clean; exit 1 = collision found.
"""
import os
import sys

import duckdb

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
os.environ.setdefault("REPLICA_CHECK_IMPORT_ONLY", "1")

# import only the constants from make_scale_replica without running its
# COPY pipeline: read the module source and exec the prefix up to the
# first statement that touches files (the duckdb.connect call)
_src_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         "make_scale_replica.py")
_ns = {}
with open(_src_path) as f:
    _head = f.read().split("con = duckdb.connect()")[0]
# the module prefix reads sys.argv for SRC/DST — neutralize
_head = _head.replace("sys.argv", "[]")
exec(_head, _ns)
DOC_TEXT_EXPR = _ns["DOC_TEXT_EXPR"]
# replica count under check: argv[2] override matches the generator's
# argv[3] (10 = sf1 gate replica, 100 = sf10-class probe replica)
REPLICAS = int(sys.argv[2]) if len(sys.argv) > 2 else _ns["REPLICAS"]
SHIFT = _ns["SHIFT"]

con = duckdb.connect()
fails = 0

# ---- part 1: synthetic boundary sweep -------------------------------
# one doc per first-token length L; same second token so any entropy
# must come from the tagging scheme itself
rows = con.sql(
    f"""
    WITH docs AS (
      SELECT tlen, repeat('a', tlen) || ' bb cc dd ee ff gg hh ii jj kk' AS text
      FROM (SELECT unnest(range(1, 21)) AS tlen)),
    tagged AS (
      SELECT tlen, r.i AS replica, {DOC_TEXT_EXPR} AS text
      FROM (SELECT *, string_split(text, ' ') AS l FROM docs),
           (SELECT unnest(range({REPLICAS})) AS i) r),
    keys AS (
      SELECT tlen, replica,
             substring(lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))),
                       1, 12) AS k0,
             substring(lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))),
                       13, 12) AS k1
      FROM tagged)
    SELECT tlen, 0 AS win, k0 AS k, count(DISTINCT replica) AS n
    FROM keys GROUP BY tlen, k0 HAVING count(DISTINCT replica) > 1
    UNION ALL
    SELECT tlen, 1, k1, count(DISTINCT replica)
    FROM keys GROUP BY tlen, k1 HAVING count(DISTINCT replica) > 1
    ORDER BY tlen, win
    """).fetchall()
for (tlen, w, k, n) in rows:
    # window 1 (chars 13-24) may legitimately collide when the FIRST
    # window already separates replicas — FuzzyMatch's multipass unions
    # candidates, so a pass-1 collision only matters if pass 0 collided
    # too. Pass 0 (window 0) collisions are always fatal.
    if w == 0:
        print(f"FAIL synthetic: L={tlen} window={w} key={k!r} shared by "
              f"{n} replicas")
        fails += 1
if fails == 0:
    print(f"OK synthetic sweep: first-window block keys disjoint across "
          f"{REPLICAS} replicas for every first-token length 1..20")

# ---- part 2: actual replica corpus ----------------------------------
if len(sys.argv) > 1:
    rdir = sys.argv[1]
    doc = os.path.join(rdir, "documents.parquet")
    if not os.path.exists(doc):
        print(f"SKIP corpus scan: {doc} not found")
    else:
        bad = con.sql(
            f"""
            WITH keys AS (
              SELECT doc_id // {SHIFT} AS replica,
                     substring(lower(trim(regexp_replace(text, '\\s+', ' ',
                                                         'g'))), 1, 12) AS k
              FROM '{doc}')
            SELECT k, count(DISTINCT replica) AS n
            FROM keys GROUP BY k HAVING count(DISTINCT replica) > 1
            """).fetchall()
        if bad:
            for (k, n) in bad[:10]:
                print(f"FAIL corpus: block key {k!r} spans {n} replicas")
            fails += len(bad)
        else:
            print(f"OK corpus scan: no first-window block key in {doc} "
                  f"spans replicas")

sys.exit(1 if fails else 0)
