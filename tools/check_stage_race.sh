#!/bin/bash
# Two-JVM staging race gate (VERDICT r17 #8): two separate processes hit
# one cold stage root; assert ONE derive + ONE wait-and-read and equal
# content hashes. Usage: tools/check_stage_race.sh [runs]
# Requires a prior `sbt compile`.
set -euo pipefail
cd "$(dirname "$0")/.."
RUNS="${1:-3}"
OUT="${STAGE_RACE_OUT:-STAGE_RACE.json}"
results=()
for i in $(seq 1 "$RUNS"); do
  ROOT="$(mktemp -d /tmp/graft_stage_race.XXXXXX)"
  export SPARK_GRAFT_STAGE_DIR="$ROOT"
  A="$ROOT/a.out"; B="$ROOT/b.out"
  tools/run_main.sh graft.tools.StageRaceProbe alpha beta  >"$A" 2>"$ROOT/a.err" &
  PA=$!
  tools/run_main.sh graft.tools.StageRaceProbe beta  alpha >"$B" 2>"$ROOT/b.err" &
  PB=$!
  wait $PA; wait $PB
  LA="$(grep '^{"role"' "$A")"; LB="$(grep '^{"role"' "$B")"
  echo "run $i alpha: $LA"
  echo "run $i beta:  $LB"
  python3 - "$LA" "$LB" <<'EOF'
import json, sys
a, b = json.loads(sys.argv[1]), json.loads(sys.argv[2])
pa, pb = a["staged"]["race_gate"], b["staged"]["race_gate"]
derives = [p for p in (pa, pb) if isinstance(p, (int, float))]
waits   = [p for p in (pa, pb) if p == "waited"]
assert len(derives) == 1 and len(waits) == 1, \
    f"want one derive + one wait, got {pa!r} / {pb!r}"
assert a["hash"] == b["hash"] and a["n_rows"] == b["n_rows"], \
    f"torn read: {a} vs {b}"
print(f"  OK: one derive ({derives[0]}s) + one wait, hashes equal")
EOF
  results+=("{\"run\":$i,\"alpha\":$LA,\"beta\":$LB}")
  rm -rf "$ROOT"
done
printf '{"gate":"stage_race","runs":%s,"results":[%s]}\n' \
  "$RUNS" "$(IFS=,; echo "${results[*]}")" > "$OUT"
echo "stage race gate: $RUNS/$RUNS green -> $OUT"
