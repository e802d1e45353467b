#!/bin/bash
# Executor-kill chaos gate (VERDICT r17 #2): 3 consecutive runs, each
# killing one executor JVM mid-query at three kill points — a shuffle
# join (q12), an iterative graph loop (q94, mid-LoopCache-loop), and a
# stateful streaming replay tier (q133, mid-replay) — asserting
# bit-identical results on recovery. Usage: tools/check_chaos_kill.sh [runs] [sfDir]
# Requires a prior `sbt package`.
set -euo pipefail
cd "$(dirname "$0")/.."
RUNS="${1:-3}"
SF="${2:-/root/testdata/sf0.01}"
OUT="${CHAOS_OUT:-CHAOS_KILL.json}"
QUERIES="q12_join_revenue,q94_copurchase_pagerank,q133_funnel_stream_replay"
export SPARK_SCALA_VERSION=2.13
export SPARK_GRAFT_MASTER="${SPARK_GRAFT_MASTER:-local-cluster[2,8,8192]}"
export SPARK_GRAFT_JARS="$(ls target/scala-2.13/*.jar | head -1)"
results=()
for i in $(seq 1 "$RUNS"); do
  echo "=== chaos run $i/$RUNS ==="
  tools/run_main.sh graft.tools.ChaosKillProbe "$SF" "/tmp/chaos_run$i.json" \
    "$QUERIES" 2>&1 | grep -E '^\[chaos\]' >&2 || true
  LINE="$(cat "/tmp/chaos_run$i.json")"
  echo "$LINE"
  python3 - "$LINE" <<'EOF'
import json, sys
d = json.loads(sys.argv[1])
for r in d["results"]:
    assert r["identical"], f"divergence: {r}"
    assert r["kill_mid_query"], f"kill never landed mid-query: {r}"
print("  OK:", ", ".join(f"{r['query']} ({r['chaos_sec']}s, "
      f"{r['attempts']} attempt(s))" for r in d["results"]))
EOF
  results+=("$LINE")
done
printf '{"gate":"chaos_kill_suite","runs":%s,"queries":"%s","results":[%s]}\n' \
  "$RUNS" "$QUERIES" "$(IFS=,; echo "${results[*]}")" > "$OUT"
echo "chaos kill gate: $RUNS/$RUNS green -> $OUT"
