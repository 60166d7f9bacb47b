#!/bin/bash
# Run a graft tool main directly against the sbt-compiled classes — same
# JVM flags as build.sbt's forked run, but without taking the sbt project
# lock (so benches can run while a test suite compiles/runs).
# Usage: SPARK_DRIVER_MEM=24g tools/runtool.sh graft.tools.SpanBench args...
# (heap defaults to 8g; set it via the SPARK_DRIVER_MEM env var, same as
# the sbt-forked runs)
set -euo pipefail
MEM="${SPARK_DRIVER_MEM:-8g}"
ADD_OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent java.util.concurrent.atomic \
         sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
exec java -Xmx"$MEM" $ADD_OPENS \
  -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  -cp "/root/repo/target/scala-2.13/classes:/opt/spark/jars/*" "$@"
