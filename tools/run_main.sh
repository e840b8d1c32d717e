#!/bin/bash
# Run a graft main class directly (skips sbt startup). Mirrors build.sbt's
# JDK-17 module opens and default JVM sizing.
# Usage: tools/run_main.sh <MainClass> [args...]
set -u
CLS="$1"; shift
OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent java.util.concurrent.atomic; do
  OPENS="$OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
for p in sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  OPENS="$OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
# SPARK_GRAFT_JAVA_OPTS: extra -D flags for A/B conf experiments
# (e.g. -Dspark.io.compression.codec=zstd for the shuffle-codec A/B)
exec java $OPENS ${SPARK_GRAFT_JAVA_OPTS:-} \
  -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  -Xmx"${SPARK_DRIVER_MEM:-8g}" \
  -cp "/root/repo/target/scala-2.13/classes:/opt/spark/jars/*" \
  "graft.$CLS" "$@"
