#!/usr/bin/env bash
# Round-10 ANN probe: hierarchical vs flat coarse quantizer on the kNN
# graph, at the two scales where the flop math separates:
#   g10  = 200k vectors, k = 2560 adaptive cells (flat scan 2560·d/row,
#          hier 10 + 2·256 = 522·d/row — ~5× fewer quantizer flops)
#   g100 = 2M vectors, k = 20480 cells (flat 20480·d/row, hier
#          10 + 2·2048 = 4106·d/row — still ~5×, but the flat term is
#          now ~2.6 Tflop total: the crossover the scaladocs predicted)
# Same join tail on both variants, so the delta isolates the quantizer.
# Like-for-like: solo legs via tools/run_main.sh, same box, same session.
#
# Usage: tools/probe_hier_r10.sh
set -uo pipefail
cd "$(dirname "$0")/.."
G10=/root/repo/probe/g10
G100=/root/repo/probe/g100

run() { # run <sfdir> <partitions> <repeat> <queries> <out>
  SPARK_GRAFT_SF_DIR=$1 SPARK_GRAFT_CPUS=32 SPARK_DRIVER_MEM=96g \
  SPARK_GRAFT_SHUFFLE_PARTITIONS=$2 SPARK_GRAFT_BENCH_REPEAT=$3 \
  SPARK_GRAFT_BENCH_ONLY="$4" BENCH_OUT="$5" \
    tools/run_main.sh graft.Bench > "/tmp/$(basename "$5" .json).log" 2>&1
  tail -1 "/tmp/$(basename "$5" .json).log" | cut -c1-400
}

echo "=== g10 kNN graph: flat vs hier (256 parts, min-of-2) ==="
run $G10 256 2 sim_knn_graph,sim_knn_graph_hier probe_g10_hier_r10.json

echo "=== g100 kNN graph: flat vs hier (512 parts, single run) ==="
run $G100 512 1 sim_knn_graph,sim_knn_graph_hier probe_g100_hier_r10.json

echo "=== probe complete ==="
