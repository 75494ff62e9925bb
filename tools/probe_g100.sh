#!/usr/bin/env bash
# Round-10 scaling probe: one more measured point for the two round-9
# "watch" slopes (VERDICT r9, Next-round #6), scoped to exactly those
# queries — the full 9-query sweep is not repeated.
#
#  - graph_pagerank / graph_label_prop: fixed-round linear should hold
#    g10 → g100 (a full decade; lineitem 60M → 600M rows).
#  - dedup_substring: g10 → g30 (half a decade; documents 500k → 1.5M) —
#    does the occurrence cap keep decaying the exponent below 7.5×/decade?
#
# Like-for-like discipline: the g10 BASELINES are re-measured in this
# session on this box (cross-session slope math inflated two round-9
# suspects 2-4×); every leg runs solo via tools/run_main.sh (no sbt
# lock, no concurrent load). Shuffle partitions scale with the decade:
# 256 at g10 (the round-8 OOM number), 512 at g30, 1024 at g100.
#
# Usage: tools/probe_g100.sh
set -uo pipefail
cd "$(dirname "$0")/.."
G10=/root/repo/probe/g10
G30=/root/repo/probe/g30
G100=/root/repo/probe/g100

run() { # run <sfdir> <partitions> <repeat> <queries> <out>
  SPARK_GRAFT_SF_DIR=$1 SPARK_GRAFT_CPUS=32 SPARK_DRIVER_MEM=96g \
  SPARK_GRAFT_SHUFFLE_PARTITIONS=$2 SPARK_GRAFT_BENCH_REPEAT=$3 \
  SPARK_GRAFT_BENCH_ONLY="$4" BENCH_OUT="$5" \
    tools/run_main.sh graft.Bench > "/tmp/$(basename "$5" .json).log" 2>&1
  tail -1 "/tmp/$(basename "$5" .json).log" | cut -c1-400
}

echo "=== g10 graph baseline (256 parts, min-of-2) ==="
run $G10 256 2 graph_pagerank,graph_label_prop probe_g10_graph_r10.json

echo "=== g100 graphs (1024 parts, single run) ==="
run $G100 1024 1 graph_pagerank,graph_label_prop probe_g100_graph_r10.json

echo "=== g10 dedup_substring baseline (256 parts, single run) ==="
run $G10 256 1 dedup_substring probe_g10_substring_r10.json

echo "=== g30 dedup_substring (512 parts, single run) ==="
run $G30 512 1 dedup_substring probe_g30_substring_r10.json

echo "=== probe complete ==="
