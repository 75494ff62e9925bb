#!/usr/bin/env bash
# Per-job wall-clock attribution for one declared query: run it isolated
# (warm pass + timed pass) at INFO log level and print each Spark job's
# call site and duration — the local-mode substitute for the Spark UI's
# stage timeline (spark.ui.enabled is off in every harness JVM).
#
#   tools/profile_query.sh <query> [sfDir]
#
# Output: the timed pass's "Job N finished: <site>, took S s" lines,
# which attribute construction-time jobs (materialize/collect/convergence
# counts) as well as the final noop sink job.
set -euo pipefail
cd "$(dirname "$0")/.."
Q=$1
SF=${2:-/root/testdata/sf0.1}
LOG=/tmp/profile_${Q}.log
SPARK_GRAFT_SF_DIR=$SF SPARK_GRAFT_BENCH_ONLY=$Q \
  SPARK_GRAFT_BENCH_REPEAT=${REPEAT:-2} SPARK_GRAFT_LOG=INFO \
  BENCH_OUT=/tmp/profile_${Q}.json \
  tools/run_main.sh graft.Bench >"$LOG" 2>&1
# Keep only the jobs of the LAST run (min-of-N makes earlier ones warmup).
python3 - "$LOG" <<'EOF'
import re, sys
lines = open(sys.argv[1], errors='replace').read().splitlines()
jobs = []  # (jobid, site, sec)
for l in lines:
    m = re.search(r'Job (\d+) finished: (.*), took ([0-9.]+) (ms|s)', l)
    if m:
        sec = float(m.group(3)) / (1000.0 if m.group(4) == 'ms' else 1.0)
        jobs.append((int(m.group(1)), m.group(2), sec))
total = sum(j[2] for j in jobs)
print(f"jobs={len(jobs)} job-sum={total:.2f}s (all repeats incl. warmup)")
for jid, site, sec in jobs:
    if sec >= 0.05:
        print(f"  job {jid:4d} {sec:8.2f}s  {site}")
EOF
