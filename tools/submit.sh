#!/bin/bash
# Run a graft main class under REAL spark-submit with the packaged
# library jar — the deployment face of the north rule ("jobs run via
# spark-submit on multi-executor clusters"). In the sandbox the master
# is local[N]; on a cluster, point --master at YARN/k8s/standalone and
# the same jar + class + args work unchanged (nothing in the library
# assumes local mode — parallelism comes from spark.sql.shuffle
# .partitions and the data's partitioning).
#
# Usage: tools/submit.sh <MainClass> [--master local[N]] [args...]
#   e.g. tools/submit.sh graft.Verify /root/testdata/sf0.001 /tmp/out
#        tools/submit.sh graft.Bench
# Build the jar first: sbt -batch package
set -e
CLS="$1"; shift
MASTER="local[32]"
if [ "${1:-}" = "--master" ]; then MASTER="$2"; shift 2; fi
JAR=$(ls /root/repo/target/scala-2.13/geospark_*.jar 2>/dev/null | head -1)
if [ -z "$JAR" ]; then echo "jar not found — run: sbt -batch package" >&2; exit 1; fi
exec /opt/spark/bin/spark-submit \
  --master "$MASTER" \
  --conf spark.sql.shuffle.partitions=32 \
  --conf spark.sql.adaptive.enabled=true \
  --conf spark.ui.enabled=false \
  --class "$CLS" "$JAR" "$@"
