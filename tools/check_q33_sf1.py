#!/usr/bin/env python3
"""q33 oracle at replica scale, restated to the operator's CONTRACT
(VERDICT r12 #3).

At sf0.01/sf0.1 q33's oracle equality (simhash pigeonhole screen ==
all exact-jaccard>=0.8 pairs) holds because of a MEASURED margin
property of the base corpus: every true pair lands within hamming 6.
The per-replica token suffixes of the scale replica redraw simhash
distances, so a few percent of true pairs legitimately land at
hamming 7+ — a fixture property, not an operator bug. No token
transform can preserve simhash margins (the fingerprint is a majority
vote over an avalanche hash of each token — there is no string-level
isometry), so at replica scale the oracle must state what the screen
actually promises:

    pairs(jaccard >= 0.8  AND  hamming(simhash_a, simhash_b) <= 6)

with the fingerprints computed INDEPENDENTLY here: pure-Python
xxhash64 (seed 42, verified bit-equal to Spark's xxhash64 across
unicode/length cases) + the same normalize/split/majority-vote
definition, over the parquet corpus directly. The jaccard side is the
same DuckDB CTE as the sf0.01 oracle. Nothing from the engine under
test is reused.

Usage: python3 tools/check_q33_sf1.py SF_DIR OUT_DIR [JSON_MERGE]
  SF_DIR    replica dir with documents.parquet
  OUT_DIR   graft.Verify output (q33_simhash_near_dups/ + oracle_sql.json)
  JSON_MERGE  optional CORRECTNESS json to update the q33 entry in
Exit 0 = restated oracle matches hash-exact.
"""
import json
import re
import sys
import time

import duckdb
import numpy as np

M = (1 << 64) - 1
P1 = 0x9E3779B185EBCA87; P2 = 0xC2B2AE3D27D4EB4F; P3 = 0x165667B19E3779F9
P4 = 0x85EBCA77C2B2AE63; P5 = 0x27D4EB2F165667C5


def _rotl(x, r):
    return ((x << r) | (x >> (64 - r))) & M


def _round(acc, inp):
    acc = (acc + inp * P2) & M
    return (_rotl(acc, 31) * P1) & M


def xxh64(data: bytes, seed: int = 42) -> int:
    """xxHash64 — the public algorithm, bit-equal to Spark's xxhash64."""
    n = len(data); i = 0
    if n >= 32:
        v1 = (seed + P1 + P2) & M; v2 = (seed + P2) & M
        v3 = seed & M; v4 = (seed - P1) & M
        while i + 32 <= n:
            v1 = _round(v1, int.from_bytes(data[i:i + 8], 'little')); i += 8
            v2 = _round(v2, int.from_bytes(data[i:i + 8], 'little')); i += 8
            v3 = _round(v3, int.from_bytes(data[i:i + 8], 'little')); i += 8
            v4 = _round(v4, int.from_bytes(data[i:i + 8], 'little')); i += 8
        h = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)) & M
        for v in (v1, v2, v3, v4):
            h ^= _round(0, v)
            h = (h * P1 + P4) & M
    else:
        h = (seed + P5) & M
    h = (h + n) & M
    while i + 8 <= n:
        h ^= _round(0, int.from_bytes(data[i:i + 8], 'little'))
        h = (_rotl(h, 27) * P1 + P4) & M; i += 8
    if i + 4 <= n:
        h ^= (int.from_bytes(data[i:i + 4], 'little') * P1) & M
        h = (_rotl(h, 23) * P2 + P3) & M; i += 4
    while i < n:
        h ^= (data[i] * P5) & M
        h = (_rotl(h, 11) * P1) & M; i += 1
    h ^= h >> 33; h = (h * P2) & M
    h ^= h >> 29; h = (h * P3) & M
    h ^= h >> 32
    return h


# Java-regex \s (ASCII class), matching Spark's normalizeText exactly;
# Python's \s is unicode-wide, which would over-collapse exotic spaces
_WS = re.compile(r'[ \t\n\x0b\f\r]+')


def simhash(text: str, hash_cache: dict) -> int:
    norm = _WS.sub(' ', text).strip(' ').lower()
    counts = np.zeros(64, dtype=np.int64)
    for tok in norm.split(' '):
        bits = hash_cache.get(tok)
        if bits is None:
            h = xxh64(tok.encode('utf-8'))
            bits = np.array([1 if (h >> j) & 1 else -1 for j in range(64)],
                            dtype=np.int8)
            hash_cache[tok] = bits
        counts += bits
    fp = 0
    for j in range(64):
        if counts[j] > 0:
            fp |= 1 << j
    return fp


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    json_merge = sys.argv[3] if len(sys.argv) > 3 else None
    t0 = time.time()

    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{sf_dir}/documents.parquet')")

    # 1. independent fingerprints for every doc
    docs = con.execute("SELECT doc_id, text FROM documents").fetchall()
    cache = {}
    fps = {did: simhash(txt, cache) for did, txt in docs}
    print(f"[q33-sf1] fingerprints: {len(fps)} docs, "
          f"{len(cache)} distinct tokens, {time.time() - t0:.1f}s")

    # 2. the sf0.01 oracle's jaccard>=0.8 pair set (DuckDB, unchanged)
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    sql = oracle["q33_simhash_near_dups"]
    want = con.execute(sql).df()

    # 3. restate: keep only pairs within the screen's hamming radius
    keep = [bin(fps[a] ^ fps[b]).count('1') <= 6
            for a, b in zip(want["id_a"], want["id_b"])]
    dropped = len(keep) - sum(keep)
    want = want[np.array(keep, dtype=bool)].reset_index(drop=True)
    print(f"[q33-sf1] oracle pairs: {len(want)} within hamming 6 "
          f"({dropped} true pairs beyond the radius — replica fixture margin)")

    got = con.execute(
        f"SELECT * FROM read_parquet('{out_dir}/q33_simhash_near_dups/*.parquet')"
    ).df()
    got = got[sorted(got.columns)]
    want = want[sorted(want.columns)]

    row = {"rows_match": len(got) == len(want),
           "schema_match": list(got.columns) == list(want.columns),
           "hash_match": False, "spark_rows": len(got),
           "oracle_rows": len(want), "sec": None,
           "err": None,
           "oracle": "restated: jaccard>=0.8 AND independent-simhash "
                     "hamming<=6 (the screen's contract; see tool docstring)"}
    if row["rows_match"] and row["schema_match"]:
        mismatch = None
        for c in got.columns:
            a, b = got[c].tolist(), want[c].tolist()
            for i, (x, y) in enumerate(zip(a, b)):
                if x != y and not (x != x and y != y):
                    mismatch = f"col {c} row {i}: {x} != {y}"
                    break
            if mismatch:
                break
        row["hash_match"] = mismatch is None
        row["err"] = mismatch
    row["sec"] = round(time.time() - t0, 1)

    ok = row["hash_match"]
    print(f"[q33-sf1] {'PASS' if ok else 'FAIL'}: {row}")
    if json_merge:
        rep = json.load(open(json_merge))
        rep["q33_simhash_near_dups"] = row
        meta = rep.get("_meta", {})
        meta.pop("excluded", None)
        meta["q33"] = ("restated oracle at replica scale: completeness "
                       "within hamming<=6, fingerprints recomputed "
                       "independently (tools/check_q33_sf1.py); the "
                       "plain jaccard>=0.8 equality remains the gate at "
                       "sf0.01/sf0.1 where the corpus margin holds")
        rep["_meta"] = meta
        json.dump(rep, open(json_merge, "w"), indent=1, sort_keys=True)
        print(f"[q33-sf1] merged into {json_merge}")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
