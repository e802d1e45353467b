#!/bin/bash
# Driver-facing bench entry point (VERDICT r13 #2: the machine-parseable
# JSON headline must be the process's VERY LAST stdout line, bare).
#
#   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 tools/bench.sh
#
# Compiles via sbt with all sbt chatter routed to STDERR, then execs
# graft.Bench directly on the compiled classes (tools/run_main.sh), so
# stdout carries ONLY the bench's own output — no `[info] ` prefixes, no
# trailing `[success] Total time` line. graft.Bench's final println is
# its sub-500-char mini JSON record; the full per-query artifacts land
# in BENCH_TOTAL.json / BENCH_DETAIL.json regardless.
set -euo pipefail
cd "$(dirname "$0")/.."
sbt -batch compile 1>&2
exec tools/run_main.sh graft.Bench "$@"
