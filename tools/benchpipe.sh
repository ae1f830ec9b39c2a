#!/bin/bash
# Run BenchPipeline in a fresh JVM with the Bench launcher's flags.
# Usage: tools/benchpipe.sh <threads> <pages> [extraJvmFlags...]
T="$1"; P="$2"; shift 2
ADD_OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent java.util.concurrent.atomic; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
for p in sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
exec java $ADD_OPENS -Xms8g -Xmx8g -XX:+AlwaysPreTouch \
  -XX:ParallelGCThreads=8 -XX:ConcGCThreads=2 -Dspark.ui.enabled=false "$@" \
  -cp "/root/repo/target/scala-2.13/classes:/opt/spark/jars/*" \
  graft.BenchPipeline "$T" "$P"
