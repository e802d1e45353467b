#!/usr/bin/env python3
"""q112 (corpus_prep2) sf10 oracle, decomposed so it fits this box
(VERDICT r13 #3). The full DuckDB formulation spilled >60 GB because the
`grams` CTE materializes every distinct 8-gram of 500k documents at
once. But the funnel decomposes EXACTLY:

 - stage 0 (input_train) is a per-doc filter + sum — additive over any
   partition of the corpus;
 - stage 1 (decontaminated) subtracts docs sharing an 8-gram with the
   eval slice. In the replica corpus every token carries its replica
   tag (tools/make_scale_replica.py), so an 8-gram can only match
   within a replica: the contaminated set is the union of per-replica
   contaminated sets, and stage 1 is additive over replicas. This is
   the same disjointness the corpus is BUILT to guarantee (and the
   final hash match re-confirms it empirically: a single cross-replica
   gram collision would shift the counts);
 - stage 2 (deduped) groups clean docs by md5(text): computed here
   GLOBALLY over the union of per-replica clean rows — no disjointness
   assumption used at all, just a compact (doc_id, source, md5, ntok)
   table instead of full texts;
 - stages 3-4 (mixed, packed) are deterministic per-doc arithmetic over
   global per-source counts — computed verbatim from the oracle's own
   c/w/t/mixed/mt/pk/nb CTEs, re-rooted on the compact survivor table.

So: one cheap DuckDB pass PER REPLICA (each replica's grams fit in RAM)
produces per-replica stage-0/1 sums plus compact clean rows; one global
pass finishes stages 2-4. Every constant and expression is lifted from
the committed oracle text (oracle_sql.json) with assertions that fail
loudly if the oracle drifts.

Usage: python3 tools/check_q112_sf10.py SF10_DIR OUT_DIR [JSON_MERGE] [REPLICAS]
"""
import json
import sys
import time

import duckdb

SHIFT = 10_000_000

NORM = "lower(trim(regexp_replace(text, '\\s+', ' ', 'g')))"
NTOK = (f"CASE WHEN length({NORM}) = 0 THEN 0 "
        f"ELSE CAST(len(string_split({NORM}, ' ')) AS BIGINT) END")


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    json_merge = sys.argv[3] if len(sys.argv) > 3 else None
    replicas = int(sys.argv[4]) if len(sys.argv) > 4 else 100
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))["q112_corpus_prep2"]

    # oracle-drift tripwires: the restatement below reuses these exact
    # fragments; if the committed oracle changes, update this tool
    for frag in (NTOK, "GROUP BY md5(text)",
                 "(((d.doc_id * 48271) % 2147483647) * 48271 % 2147483647)",
                 "// 256) + 1, 0)"):
        assert frag in oracle, f"oracle drifted; missing fragment: {frag!r}"
    # the per-replica prefix is the oracle text cut before the global
    # CTEs (everything from `c AS (` on is replayed in the global pass)
    cut = oracle.index(",\nc AS (")
    prefix = oracle[:cut]          # WITH tr .. ded  (per-replica exact)

    t0 = time.time()
    con = duckdb.connect()
    con.sql("SET preserve_insertion_order=false")
    con.execute("CREATE TABLE cleanrows (doc_id BIGINT, source VARCHAR, "
                "h VARCHAR, n_tokens BIGINT)")
    tr_docs = tr_toks = clean_docs = clean_toks = 0
    for i in range(replicas):
        con.execute("CREATE OR REPLACE VIEW documents AS "
                    f"SELECT * FROM read_parquet('{sf_dir}/documents.parquet') "
                    f"WHERE doc_id >= {i * SHIFT} AND doc_id < {(i + 1) * SHIFT}")
        td, tt = con.execute(
            f"SELECT count(*), CAST(coalesce(sum({NTOK}), 0) AS BIGINT) "
            f"FROM documents WHERE doc_id % 10 <> 0").fetchone()
        tr_docs += td
        tr_toks += tt
        # the oracle's own tr..clean CTEs, emitting compact rows (the
        # `ded` CTE in the prefix is unreferenced here; stage 2 dedups
        # globally over cleanrows below)
        con.execute(
            f"INSERT INTO cleanrows {prefix}, _ded_unused AS (SELECT 1) "
            f"SELECT doc_id, source, md5(text), {NTOK} FROM clean")
        cd, ct = con.execute(
            "SELECT count(*), CAST(coalesce(sum(n_tokens), 0) AS BIGINT) "
            "FROM cleanrows").fetchone()
        clean_docs, clean_toks = cd, ct
        if i % 10 == 0:
            print(f"[q112-sf10] replica {i}: cum clean={cd} ({time.time()-t0:.0f}s)")

    # global stages 2-4: the oracle's c/w/t/mixed/mt/pk/nb CTEs verbatim,
    # re-rooted on the compact survivor table
    want = con.execute(f"""
WITH ded AS (
  SELECT * FROM cleanrows WHERE doc_id IN (
    SELECT min(doc_id) FROM cleanrows GROUP BY h)),
c AS (SELECT source, count(*) AS n_before FROM ded GROUP BY source),
w AS (SELECT source, n_before,
             CAST(floor(sqrt(CAST(n_before AS DOUBLE))) AS BIGINT) AS weight
      FROM c),
t AS (SELECT source, n_before, weight,
             least(n_before,
               (((SELECT CAST(sum(n_before) AS BIGINT) FROM c) // 2) * weight)
                 // greatest((SELECT CAST(sum(weight) AS BIGINT) FROM w), 1)) AS target_n
      FROM w),
mixed AS (
  SELECT d.* FROM ded d JOIN t USING (source)
  WHERE (((d.doc_id * 48271) % 2147483647) * 48271 % 2147483647)
          * t.n_before < t.target_n * 2147483647),
mt AS (SELECT doc_id, n_tokens FROM mixed),
pk AS (
  SELECT doc_id, n_tokens,
         CAST(sum(n_tokens) OVER (ORDER BY doc_id) - n_tokens AS BIGINT) AS so
  FROM mt),
nb AS (
  SELECT coalesce(max((so + greatest(n_tokens, 1) - 1) // 256) + 1, 0) AS nb
  FROM pk)
SELECT * FROM (
  SELECT 0 AS stage_idx, 'input_train' AS stage, {tr_docs} AS n_docs,
         CAST({tr_toks} AS BIGINT) AS n_tokens, CAST(0 AS BIGINT) AS n_bins
  UNION ALL
  SELECT 1, 'decontaminated', {clean_docs}, CAST({clean_toks} AS BIGINT), 0
  UNION ALL
  SELECT 2, 'deduped', count(*),
         CAST(coalesce(sum(n_tokens), 0) AS BIGINT), 0 FROM ded
  UNION ALL
  SELECT 3, 'mixed', count(*),
         CAST(coalesce(sum(n_tokens), 0) AS BIGINT), 0 FROM mixed
  UNION ALL
  SELECT 4, 'packed', count(*),
         CAST(coalesce(sum(n_tokens), 0) AS BIGINT),
         CAST((SELECT nb FROM nb) AS BIGINT) FROM mt)
ORDER BY stage_idx""").df()
    got = con.execute(
        f"SELECT * FROM read_parquet('{out_dir}/q112_corpus_prep2/*.parquet') "
        f"ORDER BY stage_idx").df()
    got = got[sorted(got.columns)]
    want = want[sorted(want.columns)]
    err = None
    if list(got.columns) != list(want.columns):
        err = f"columns {list(got.columns)} != {list(want.columns)}"
    elif len(got) != len(want):
        err = f"rows {len(got)} != {len(want)}"
    else:
        for c in got.columns:
            for r, (x, y) in enumerate(zip(got[c].tolist(), want[c].tolist())):
                if x != y:
                    err = f"col {c} row {r}: {x} != {y}"
                    break
            if err:
                break
    sec = round(time.time() - t0, 1)
    row = {"rows_match": len(got) == len(want),
           "schema_match": list(got.columns) == list(want.columns),
           "hash_match": err is None, "spark_rows": len(got),
           "oracle_rows": len(want), "sec": sec, "err": err,
           "oracle": "per-replica decomposition (stages 0-1 additive over "
                     "replicas: 8-grams are replica-tagged so the decon "
                     "gate never crosses replicas; stage 2 deduped "
                     "GLOBALLY over compact (doc_id, md5, ntok) rows — no "
                     "disjointness assumed; stages 3-4 replay the "
                     "oracle's own deterministic mix/pack arithmetic on "
                     "the survivor table). Full formulation spilled "
                     ">60 GB of DuckDB temp."}
    print(f"[q112-sf10] {'PASS' if err is None else 'FAIL'} ({sec}s)"
          + ("" if err is None else f" err={err}"))
    if err:
        print(got)
        print(want)
    if json_merge:
        rep = json.load(open(json_merge))
        rep["q112_corpus_prep2"] = row
        json.dump(rep, open(json_merge, "w"), indent=1, sort_keys=True)
    sys.exit(0 if err is None else 1)


main()
