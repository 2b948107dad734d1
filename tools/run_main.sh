#!/bin/bash
# Run a graft main directly against the compiled classes (no sbt lock):
#   tools/run_main.sh graft.Explain q1_agg ...
# Mirrors the sbt `run` JVM flags (build.sbt): JDK17 module opens, UTC,
# UI off, 16g heap.
OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent java.util.concurrent.atomic; do
  OPENS="$OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
for p in sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  OPENS="$OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
exec java $OPENS \
  -Dspark.ui.enabled=false \
  -Dspark.sql.session.timeZone=UTC \
  -Xmx${SPARK_DRIVER_MEM:-16g} \
  -cp "/root/repo/target/scala-2.13/classes:/opt/spark/jars/*" "$@"
