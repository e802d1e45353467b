#!/usr/bin/env python3
"""Build the SCALE.md 10x replica of an sf dir (driver-side tooling).

Ten disjoint key-shifted copies: TPC-H keys shifted per replica (10x
nodes AND 10x edges in the co-purchase / purchase graphs, same degree
distribution); documents get shifted doc_ids and a per-replica token
prefix so cross-replica text shares NO shingles (dedup/similarity
structure scales linearly instead of exploding on 10-way planted
near-dups); events keep their TIMESTAMP(NANOS) physical type (written
via pyarrow — DuckDB's parquet writer downgrades ns to us, which
breaks graft.Tables.events' nanosAsLong read path).

Usage: python3 tools/make_scale_replica.py [src_sf_dir] [dst_dir]
"""
import os
import sys

import duckdb
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

SRC = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
DST = sys.argv[2] if len(sys.argv) > 2 else "/tmp/scale10x"
SHIFT = 10_000_000  # > every key in sf<=1 inputs
# replica count: 10 for the sf1 gate replica, 100 for the sf10-class
# probe (VERDICT r12 #1). Shifted keys stay < REPLICAS*SHIFT = 1e9,
# far inside int64; the doc-text tagger and the entropy check both
# handle 1- and 2-digit indices (the `len(i)` window arithmetic).
REPLICAS = int(sys.argv[3]) if len(sys.argv) > 3 else 10

# The per-replica document-text tagging expression, over a row with
# `l` = string_split(text, ' ') and `r.i` = the replica index. Shared
# with tools/check_replica_entropy.py, which asserts the block-key
# disjointness contract documented in the long comment below — edit the
# expression only together with that check.
DOC_TEXT_EXPR = (
    "array_to_string(list_prepend("
    "    (CASE WHEN length(l[1]) + 2 + length(CAST(r.i AS VARCHAR)) > 12 "
    "          THEN 'r' || r.i || '_' "
    "          ELSE '' END) || l[1] || '_r' || r.i, "
    "    list_transform(l[2:], t -> t || '_r' || r.i)), ' ')")

con = duckdb.connect()
con.sql("SET preserve_insertion_order=false")
rep = f"(SELECT unnest(range({REPLICAS})) AS i) r"
shifted = {
    "lineitem": "l_orderkey + r.i * {s} AS l_orderkey, "
                "l_partkey + r.i * {s} AS l_partkey, "
                "l_suppkey + r.i * {s} AS l_suppkey",
    "orders": "o_orderkey + r.i * {s} AS o_orderkey, "
              "o_custkey + r.i * {s} AS o_custkey",
    "part": "p_partkey + r.i * {s} AS p_partkey",
    "customer": "c_custkey + r.i * {s} AS c_custkey",
    "supplier": "s_suppkey + r.i * {s} AS s_suppkey",
}
os.makedirs(DST, exist_ok=True)
for t, repl in shifted.items():
    con.sql(
        f"COPY (SELECT * EXCLUDE (i) REPLACE ({repl.format(s=SHIFT)}) "
        f"FROM '{SRC}/{t}.parquet', {rep}) "
        f"TO '{DST}/{t}.parquet' (FORMAT PARQUET)")
    print(f"[replica] {t}: done")

# nation/region: tiny dimensions, replicated membership — copy verbatim
# (every replica's shifted suppliers/customers keep their nationkey)
for t in ("nation", "region"):
    con.sql(f"COPY (SELECT * FROM '{SRC}/{t}.parquet') "
            f"TO '{DST}/{t}.parquet' (FORMAT PARQUET)")
    print(f"[replica] {t}: done")

# documents: shift ids AND tag every token per replica so
# cross-replica shingle sets are disjoint. The tag is a SUFFIX, not a
# prefix: prefix-blocked operators (FuzzyMatch keys on the first 12
# chars of normalized text) would see every replica-local doc share the
# 'r<i>_' prefix, eating block-key entropy and exploding pass-0
# candidates ~quadratically (SCALE.md r9: 2.3M candidates at sf1) — a
# fixture artifact, not operator behavior. Suffixing keeps the leading
# characters original so 10x probes measure the operator.
#
# Caveat: a suffix only disambiguates the 12-char block window when the
# first replica-distinguishing character of the '_r<i>' suffix still
# falls INSIDE the window. The suffix occupies positions
# L+1 .. L+2+len(i) after a first token of length L, so the digit is
# in-window only when L + 2 + len(i) <= 12. Docs over that bound would
# keep an identical block key across all replicas, re-concentrating
# the r9 quadratic artifact on long-leading-token docs — so exactly
# those first tokens ALSO get an in-window 'r<i>_' prefix. (ADVICE r10:
# an earlier version prefixed only at L >= 12, leaving L = 10..11
# ambiguous — single-digit indices put the digit at L+3 > 12.)
# Conditional, so corpora whose docs all satisfy the bound are
# byte-identical to the plain-suffix scheme.
con.sql(
    f"COPY (SELECT doc_id + r.i * {SHIFT} AS doc_id, "
    f"  {DOC_TEXT_EXPR} AS text, "
    f"  lang, source, n_chars "
    f"FROM (SELECT *, string_split(text, ' ') AS l "
    f"      FROM '{SRC}/documents.parquet'), {rep}) "
    f"TO '{DST}/documents.parquet' (FORMAT PARQUET)")
print("[replica] documents: done")

# embeddings: shift ids and apply a PER-REPLICA DETERMINISTIC SIGN
# PATTERN to the dimensions (replica 0 = identity). Sign flips are an
# isometry, so WITHIN-replica geometry — norms, every pairwise cosine,
# the planted-copy margins the ANN specs pin — is bit-exactly
# preserved (float negation is exact), while CROSS-replica cosines of
# same-base copies collapse to ~N(0, 1/d) ≈ |cos| ≲ 0.4 for d=128:
# far below every near-dup threshold, so similarity structure scales
# linearly in replicas. (The previous +i*0.001 first-dimension nudge
# left same-base cross-replica pairs at cosine ≈ 0.9999 — the 10x
# corpus was a 10-way near-duplicate pile and the embedding screens'
# oracle checks measured that artifact, not the operator: the r12 sf1
# gate caught q42 missing 1.5% of 90k cross-replica pairs the corpus
# was never meant to contain.)
con.sql(
    f"COPY (SELECT vec_id + r.i * {SHIFT} AS vec_id, "
    f"  CASE WHEN r.i = 0 THEN embedding ELSE "
    f"    list_transform(embedding, (x, k) -> "
    # md5 parity, not hash()%2: DuckDB's integer hash has weak low-bit
    # diffusion over consecutive keys (measured same-base cross-replica
    # |cos| up to 0.84 for some replica pairs; md5 gives ≤ ~0.4, the
    # N(0, 1/d) concentration bound)
    f"      CASE WHEN ascii(substr(md5(CAST(k AS VARCHAR) || '_' || "
    f"                                 CAST(r.i AS VARCHAR)), 1, 1)) % 2 = 0 "
    f"           THEN x ELSE CAST(-x AS FLOAT) END) END AS embedding, "
    f"  label "
    f"FROM '{SRC}/embeddings.parquet', {rep}) "
    f"TO '{DST}/embeddings.parquet' (FORMAT PARQUET)")
print("[replica] embeddings: done")

# events via pyarrow: ts column copied verbatim (stays timestamp[ns])
src_events = pq.read_table(f"{SRC}/events.parquet")
copies = []
for i in range(REPLICAS):
    t = src_events
    for key in ("event_id", "user_id"):
        idx = t.schema.get_field_index(key)
        t = t.set_column(idx, key, pc.add(t.column(key), i * SHIFT))
    copies.append(t)
pq.write_table(pa.concat_tables(copies), f"{DST}/events.parquet")
print("[replica] events: done")
