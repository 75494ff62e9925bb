#!/usr/bin/env bash
# Launch a graft main directly from compiled classes — no sbt, so long
# probes/benches never hold the (single-instance) sbt/zinc lock while
# edits compile. Mirrors build.sbt's fork JVM exactly: same add-opens
# set, same -D flags, SPARK_DRIVER_MEM-sized heap.
#
#   tools/run_main.sh graft.Bench [args...]
#
# Requires an up-to-date `sbt compile` (this script does NOT compile).
set -euo pipefail
cd "$(dirname "$0")/.."
# GRAFT_CLASSES: override the classes dir (e.g. a frozen snapshot so a
# multi-hour probe JVM can't lazily load a class that `sbt compile`
# rewrote underneath it mid-run).
CLASSES=${GRAFT_CLASSES:-target/scala-2.13/classes}
[ -d "$CLASSES" ] || { echo "run 'sbt compile' first" >&2; exit 1; }
OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent java.util.concurrent.atomic; do
  OPENS="$OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
for p in sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  OPENS="$OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
# EXTRA_JAVA_OPTS: additional -D/-X flags for one launch (e.g.
# -Dspark.cleaner.periodicGC.interval=60s to bound the shuffle-file
# footprint of long iterative probes on a small disk).
exec java $OPENS ${EXTRA_JAVA_OPTS:-} \
  -Xmx"${SPARK_DRIVER_MEM:-8g}" \
  -Dspark.ui.enabled=false \
  -Dspark.sql.session.timeZone=UTC \
  -cp "$CLASSES:/opt/spark/jars/*" "$@"
