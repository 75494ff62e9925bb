#!/usr/bin/env bash
# Repeat-suite stress loop — the test-mr-many.sh analog (the reference
# reruns its whole suite N times to flush flakes, src/main/test-mr-many.sh).
# Each trial runs the golden/crash/scheduler/streaming/fuzz suites in a
# fresh sbt JVM with a different shuffle-partition count and RNG seed
# window (SPARK_GRAFT_STRESS_PARTITIONS / SPARK_GRAFT_STRESS_SEED, read by
# SparkTestBase and the seeded suites), and stops at the first failure,
# exactly like the reference loop.
#
#   tools/stress.sh [N]      # default 5 trials
set -euo pipefail
cd "$(dirname "$0")/.."
N=${1:-5}
SUITES="graft.MapReduceGoldenSpec graft.CrashRecoverySpec \
graft.SchedulerIntrospectionSpec graft.StreamsSpec graft.KvStreamSpec \
graft.CdcSpec graft.KvLinearizabilitySpec graft.DeterminismSpec \
graft.SnapshotsFuzzSpec graft.SnapshotsConcurrencySpec \
graft.SnapshotStreamSourceSpec"
for i in $(seq 1 "$N"); do
  parts=$((2 + (i * 7) % 15))
  echo "=== stress trial $i/$N (seed window $i, shuffle.partitions $parts) ==="
  SPARK_GRAFT_STRESS_SEED=$i SPARK_GRAFT_STRESS_PARTITIONS=$parts \
    sbt -batch "testOnly $SUITES" >"/tmp/graft_stress_$i.log" 2>&1 \
    || { echo "*** TRIAL $i FAILED — /tmp/graft_stress_$i.log"; exit 1; }
  # The streaming permutation test logs the seeded micro-batch arrival
  # order it exercised — echo it so each trial's schedule is on record.
  grep -E "arrival permutation" "/tmp/graft_stress_$i.log" | sed 's/^.*+ /    /' || true
  grep -E "Tests: succeeded" "/tmp/graft_stress_$i.log" | tail -1
done
echo "=== $N/$N trials clean ==="
