#!/usr/bin/env bash
# Round-11 scale probes (VERDICT r10, next-round #4 and #6): the FULL
# g10 -> g30 -> g100 decade for the fixed-shape graph loops and for
# dedup_substring, every leg measured in THIS session on this box, solo,
# one query per JVM — the only slope math that has survived scrutiny is
# within-session ratios at identical settings.
#
# Disk budget (the r10 g100 graph attempt filled 76 GB free mid-leg):
#  - zstd shuffle/spill compression on EVERY leg (text shingles compress
#    ~2x over lz4; like-for-like because every leg in the ladder wears
#    the same codec);
#  - spark.cleaner.periodicGC.interval=45s on the GRAPH legs only (the
#    round-10 measurement: bounds shuffle-file footprint, taxes timing
#    ~22% — the tax cancels in the slope because ALL graph legs pay it);
#  - the graph tables (g30/g100 lineitem+orders, ~29 GB, regenerable by
#    GenData) are DELETED between the graph and substring phases so the
#    substring g100 window sort gets the headroom its ~60 GB (zstd)
#    shuffle needs;
#  - a df poller per leg records free-disk-over-time next to the bench
#    log, so a disk-capped DNF is diagnosable from the sidecar.
#
# Usage: tools/probe_r11.sh   (requires an up-to-date `sbt compile`;
#                              run NOTHING else on the box while it runs)
set -uo pipefail
cd "$(dirname "$0")/.."
G10=/root/repo/probe/g10
G30=/root/repo/probe/g30
G100=/root/repo/probe/g100
ZSTD="-Dspark.io.compression.codec=zstd"
GC="-Dspark.cleaner.periodicGC.interval=45s"

run() { # run <sfdir> <partitions> <query> <out> <extra_java_opts>
  local base; base=$(basename "$4" .json)
  local poll="/tmp/${base}.df"
  : > "$poll"
  ( while true; do
      echo "$(date -u +%T) $(df --output=avail -BG / | tail -1 | tr -d ' ')" >> "$poll"
      sleep 20
    done ) & local pollpid=$!
  EXTRA_JAVA_OPTS="$5" \
  SPARK_GRAFT_SF_DIR=$1 SPARK_GRAFT_CPUS=32 SPARK_DRIVER_MEM=96g \
  SPARK_GRAFT_SHUFFLE_PARTITIONS=$2 SPARK_GRAFT_BENCH_REPEAT=1 \
  SPARK_GRAFT_BENCH_SPILL=1 SPARK_GRAFT_BENCH_ONLY="$3" BENCH_OUT="$4" \
    tools/run_main.sh graft.Bench > "/tmp/${base}.log" 2>&1
  kill "$pollpid" 2>/dev/null || true
  echo "--- $4 (min free disk: $(sort -t' ' -k2 -V "$poll" | head -1))"
  tail -1 "/tmp/${base}.log" | cut -c1-500
}

echo "=== phase 1: graphs, full decade (zstd + periodicGC on every leg) ==="
for sf in "$G10 256 g10" "$G30 768 g30" "$G100 2560 g100"; do
  set -- $sf
  run "$1" "$2" graph_pagerank   "probe_${3}_pagerank_r11.json"  "$ZSTD $GC"
  run "$1" "$2" graph_label_prop "probe_${3}_labelprop_r11.json" "$ZSTD $GC"
done

echo "=== phase 2: free the graph tables (regenerable: GenData <dir> <sf> orders,lineitem) ==="
rm -rf "$G10/lineitem.parquet" "$G10/orders.parquet" \
       "$G30/lineitem.parquet" "$G30/orders.parquet" \
       "$G100/lineitem.parquet" "$G100/orders.parquet"
df -h / | tail -1

echo "=== phase 3: dedup_substring, full decade (zstd, partitions ∝ data) ==="
run "$G10"  256  dedup_substring probe_g10_substring_r11.json  "$ZSTD"
run "$G30"  768  dedup_substring probe_g30_substring_r11.json  "$ZSTD"
run "$G100" 2560 dedup_substring probe_g100_substring_r11.json "$ZSTD"

echo "=== probe_r11 complete ==="
