#!/usr/bin/env bash
# Final round-9 slope record: the 9 heavy queries at g1 AND g10 with the
# round-9 fixes in (CellTopK coarse quantizer, carry-the-vector kNN join).
# dedup_substring keeps its earlier single-run record (code unchanged):
# probe_g1_r09.json / probe_g10_substring_r09.json.
set -uo pipefail
cd "$(dirname "$0")/.."
QUERIES="dedup_components,dedup_keep_best,sim_knn_graph,sim_knn_clusters,graph_pagerank,graph_triangles,graph_label_prop,pipeline_training_corpus,ta_bigram_logprob"

echo "=== final probe: g1 (32 partitions, min-of-2) ==="
SPARK_GRAFT_SF_DIR=/root/repo/probe/g1 SPARK_GRAFT_CPUS=32 SPARK_DRIVER_MEM=48g \
  SPARK_GRAFT_SHUFFLE_PARTITIONS=32 SPARK_GRAFT_BENCH_REPEAT=2 \
  SPARK_GRAFT_BENCH_ONLY="$QUERIES" \
  BENCH_OUT=probe_g1_final_r09.json \
  sbt -batch "runMain graft.Bench" > /tmp/probe_g1_final_r09.log 2>&1
grep -o '{"metric".*}' /tmp/probe_g1_final_r09.log | head -c 400; echo

echo "=== final probe: g10 (256 partitions, min-of-2) ==="
SPARK_GRAFT_SF_DIR=/root/repo/probe/g10 SPARK_GRAFT_CPUS=32 SPARK_DRIVER_MEM=96g \
  SPARK_GRAFT_SHUFFLE_PARTITIONS=256 SPARK_GRAFT_BENCH_REPEAT=2 \
  SPARK_GRAFT_BENCH_ONLY="$QUERIES" \
  BENCH_OUT=probe_g10_final_r09.json \
  sbt -batch "runMain graft.Bench" > /tmp/probe_g10_final_r09.log 2>&1
grep -o '{"metric".*}' /tmp/probe_g10_final_r09.log | head -c 400; echo
echo "=== final probe complete ==="
