#!/usr/bin/env python3
"""Adversarial-shape scale replica (VERDICT r13 #1): the uniform replica
corpus (tools/make_scale_replica.py) measures VOLUME — 100 disjoint
isomorphic copies — but not topology. This sibling builds a corpus of
the same volume whose SHAPE is hostile, all deterministically:

 1. GIANT COMPONENT / GROWING DIAMETER — bridge orders: for each pair of
    adjacent replicas (i, i+1), 2 synthetic 2-item orders whose parts are
    replica i's part 0 and replica (i+1)'s part 0. The co-purchase graph
    (distinct same-order part pairs — Tables.copurchaseEdgesWithDeg)
    gains the chain edge p0_i <-> p0_{i+1}; each p0_i is already inside
    its replica's dominant component because of the hub rewrite below,
    so ONE component spans all R replicas and graph diameter grows ~R x
    the replica diameter instead of staying constant. The precedence
    graph (line-number-ordered pairs) gains the same chain, directed.

 2. ZIPF KEY SKEW —
    - hub part PER REPLICA: lineitems of every 97th order are rewritten
      to part (replica*SHIFT + 0): each replica's graph gets one
      mega-degree hub (~1% of its orders' baskets), stressing the
      adjacency explode fanout / k-core peel / LPA label flood with a
      single giant adjacency row. Per-replica (not global) so the hub
      does NOT collapse the cross-replica diameter the bridges grow.
    - mega-order: ONE order with 4000 lineitems, every item part 0
      (same partkey, so the copurchase/precedence self-joins emit ZERO
      edges for it — the graphs stay bridge+hub shaped) — a 1000x-hot
      l_orderkey for the q65 salted-join path and AQE skew handling.
    - mega-customer: 30% of ALL orders (o_orderkey%10<3) rebound to
      customer 0 — one global hot customer key.
    - mega-source: a third of documents (base doc_id%3==0) share
      source='src_mega' — one hot group key for per-source aggregates.
    - mega-user: 20% of events (event_id%5==0) rebound to user 0.

 3. CROSS-REPLICA NEAR-DUPS — the uniform corpus suffixes every token
    per replica precisely so replicas share no shingles; here a
    controlled slice does NOT get tags:
    - base doc_id%50==0 (2%): text verbatim in every replica -> R-way
      EXACT duplicate groups (5k docs in 100-member groups at R=100);
    - base doc_id%50==1 (2%): verbatim plus one trailing replica token
      -> R-way NEAR duplicate groups (high Jaccard, not exact);
    - base vec_id%50==0: embedding identical in every replica (no sign
      flip) -> R-way cosine~1.0 clusters for the semantic screens.
    MinHash/SimHash buckets, the transitive closure, and SemDeDup now
    face genuine giant cross-replica clusters and loaded LSH buckets
    (the mega-bucket caps' design case) instead of provably-disjoint
    replicas. NOTE: this deliberately violates the block-key-entropy
    contract tools/check_replica_entropy.py asserts for the UNIFORM
    corpus — do not point that check at this corpus.

Everything else (key shifts, tag suffix window arithmetic, sign-flip
isometry, ns-timestamp events) matches make_scale_replica.py line for
line so the two corpora differ ONLY in the adversarial features.

Usage: python3 tools/make_skewed_replica.py [src_sf_dir] [dst_dir] [replicas]
  (replicas=10 -> the skew-sf1 full-oracle correctness corpus;
   replicas=100 -> the skew-sf10 cost probe corpus)
"""
import os
import sys

import duckdb
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

SRC = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
DST = sys.argv[2] if len(sys.argv) > 2 else "/tmp/skew10x"
REPLICAS = int(sys.argv[3]) if len(sys.argv) > 3 else 10
SHIFT = 10_000_000
BRIDGE_BASE = 1_500_000_000   # > REPLICAS*SHIFT for any REPLICAS <= 100
MEGA_ORDER_KEY = 1_600_000_000
MEGA_ORDER_ITEMS = 4000

# same tagging expression as make_scale_replica.py (kept in sync by eye;
# the entropy check does NOT run on this corpus so there is no shared
# contract to break), applied only to the docs that keep their tags
DOC_TEXT_EXPR = (
    "array_to_string(list_prepend("
    "    (CASE WHEN length(l[1]) + 2 + length(CAST(r.i AS VARCHAR)) > 12 "
    "          THEN 'r' || r.i || '_' "
    "          ELSE '' END) || l[1] || '_r' || r.i, "
    "    list_transform(l[2:], t -> t || '_r' || r.i)), ' ')")

con = duckdb.connect()
con.sql("SET preserve_insertion_order=false")
rep = f"(SELECT unnest(range({REPLICAS})) AS i) r"
os.makedirs(DST, exist_ok=True)

# ---- lineitem: shift keys, then (a) hub rewrite per replica, (b) bridge
# orders, (c) the mega-order. Bridge/mega rows use fixed template values.
# only the FIRST lineitem of a hub order becomes the hub part — the
# rest of the basket stays original, so the hub gains the basket as
# distinct co-purchase partners (rewriting the whole basket would leave
# nothing to pair with and the hub would gain no edges)
hub = (f"CASE WHEN l_orderkey % 97 = 0 AND l_linenumber = 1 "
       f"     THEN r.i * {SHIFT} "
       f"     ELSE l_partkey + r.i * {SHIFT} END")
bridges = ", ".join(
    f"({BRIDGE_BASE + 10*i + b}, {i * SHIFT}, {(i + 1) * SHIFT}, 1), "
    f"({BRIDGE_BASE + 10*i + b}, {(i + 1) * SHIFT}, {i * SHIFT}, 2)"
    for i in range(REPLICAS - 1) for b in (0, 1))
con.sql(
    f"COPY ("
    f"SELECT l_orderkey + r.i * {SHIFT} AS l_orderkey, "
    f"       {hub} AS l_partkey, "
    f"       l_suppkey + r.i * {SHIFT} AS l_suppkey, "
    f"       l_linenumber, l_quantity, l_extendedprice, l_discount, "
    f"       l_tax, l_returnflag, l_linestatus, l_shipdate "
    f"FROM '{SRC}/lineitem.parquet', {rep} "
    f"UNION ALL "
    f"SELECT ok, pk, sk, ln, 1.0, 100.0, 0.0, 0.0, 'N', 'O', "
    f"       TIMESTAMP '1995-06-15 00:00:00' "
    f"FROM (VALUES {bridges}) AS b(ok, pk, sk, ln) "
    f"UNION ALL "
    f"SELECT {MEGA_ORDER_KEY}, 0, 0, CAST(x AS INT) + 1, 1.0, 100.0, "
    f"       0.0, 0.0, 'N', 'O', TIMESTAMP '1995-06-15 00:00:00' "
    f"FROM unnest(range({MEGA_ORDER_ITEMS})) AS t(x)"
    f") TO '{DST}/lineitem.parquet' (FORMAT PARQUET)")
print("[skew] lineitem: done (hub rewrite + "
      f"{4*(REPLICAS-1)} bridge rows + {MEGA_ORDER_ITEMS} mega-order rows)")

# ---- orders: shift keys, mega-customer rebind, rows for bridge + mega
# orders (priority '3-MEDIUM' just adds to one oracle-recomputed group)
border = ", ".join(f"({BRIDGE_BASE + 10*i + b})"
                   for i in range(REPLICAS - 1) for b in (0, 1))
con.sql(
    f"COPY ("
    f"SELECT o_orderkey + r.i * {SHIFT} AS o_orderkey, "
    f"       CASE WHEN o_orderkey % 10 < 3 THEN 0 "
    f"            ELSE o_custkey + r.i * {SHIFT} END AS o_custkey, "
    f"       o_orderstatus, o_totalprice, o_orderdate, o_orderpriority "
    f"FROM '{SRC}/orders.parquet', {rep} "
    f"UNION ALL "
    f"SELECT ok, 0, 'O', 100.0, TIMESTAMP '1995-06-01 00:00:00', "
    f"       '3-MEDIUM' FROM (VALUES {border}) AS b(ok) "
    f"UNION ALL "
    f"SELECT {MEGA_ORDER_KEY}, 0, 'O', 100.0, "
    f"       TIMESTAMP '1995-06-01 00:00:00', '3-MEDIUM'"
    f") TO '{DST}/orders.parquet' (FORMAT PARQUET)")
print("[skew] orders: done (mega-customer 30%)")

# ---- part/customer/supplier: plain key-shifted replicas (as uniform)
for t, key in (("part", "p_partkey"), ("customer", "c_custkey"),
               ("supplier", "s_suppkey")):
    con.sql(
        f"COPY (SELECT * REPLACE ({key} + r.i * {SHIFT} AS {key}) "
        f"FROM '{SRC}/{t}.parquet', {rep}) "
        f"TO '{DST}/{t}.parquet' (FORMAT PARQUET)")
    print(f"[skew] {t}: done")
for t in ("nation", "region"):
    con.sql(f"COPY (SELECT * FROM '{SRC}/{t}.parquet') "
            f"TO '{DST}/{t}.parquet' (FORMAT PARQUET)")
    print(f"[skew] {t}: done")

# ---- documents: tag per replica EXCEPT the cross-replica dup slices
con.sql(
    f"COPY (SELECT doc_id + r.i * {SHIFT} AS doc_id, "
    f"  CASE WHEN doc_id % 50 = 0 THEN text "
    f"       WHEN doc_id % 50 = 1 THEN text || ' zz_r' || r.i "
    f"       ELSE {DOC_TEXT_EXPR} END AS text, "
    f"  lang, "
    f"  CASE WHEN doc_id % 3 = 0 THEN 'src_mega' ELSE source END AS source, "
    f"  n_chars "
    f"FROM (SELECT *, string_split(text, ' ') AS l "
    f"      FROM '{SRC}/documents.parquet'), {rep}) "
    f"TO '{DST}/documents.parquet' (FORMAT PARQUET)")
print("[skew] documents: done (2% exact + 2% near cross-replica dups, "
      "mega-source 33%)")

# ---- embeddings: sign-flip isometry per replica EXCEPT vec_id%50==0,
# which stays identical across replicas (R-way cosine~1 clusters)
con.sql(
    f"COPY (SELECT vec_id + r.i * {SHIFT} AS vec_id, "
    f"  CASE WHEN r.i = 0 OR vec_id % 50 = 0 THEN embedding ELSE "
    f"    list_transform(embedding, (x, k) -> "
    f"      CASE WHEN ascii(substr(md5(CAST(k AS VARCHAR) || '_' || "
    f"                                 CAST(r.i AS VARCHAR)), 1, 1)) % 2 = 0 "
    f"           THEN x ELSE CAST(-x AS FLOAT) END) END AS embedding, "
    f"  label "
    f"FROM '{SRC}/embeddings.parquet', {rep}) "
    f"TO '{DST}/embeddings.parquet' (FORMAT PARQUET)")
print("[skew] embeddings: done (2% identity across replicas)")

# ---- events via pyarrow (ns timestamps survive), mega-user rebind
src_events = pq.read_table(f"{SRC}/events.parquet")
copies = []
for i in range(REPLICAS):
    t = src_events
    eid = t.column("event_id")
    for key in ("event_id", "user_id"):
        idx = t.schema.get_field_index(key)
        shifted_col = pc.add(t.column(key), i * SHIFT)
        if key == "user_id":
            mega = pc.equal(pc.subtract(
                eid, pc.multiply(pc.divide(eid, 5), 5)), 0)
            shifted_col = pc.if_else(mega, pa.scalar(0, type=pa.int64()),
                                     shifted_col)
        t = t.set_column(idx, key, shifted_col)
    copies.append(t)
pq.write_table(pa.concat_tables(copies), f"{DST}/events.parquet")
print("[skew] events: done (mega-user 20%)")
