#!/bin/bash
# Direct JVM runner for the graft mains (Verify/Bench/Explain) — same
# classpath and module options as `sbt runMain`, minus sbt's JVM startup
# and project lock (lets a main run while `sbt test` holds the lock).
# Usage: tools/run.sh graft.Bench [args...]   (env vars as usual)
set -eo pipefail
cd "$(dirname "$0")/.."
# src/main/resources comes FIRST: `sbt compile` alone does not copy
# resources into target/classes, and without META-INF/services the
# graft-bus DSv2 source is unregistered — the three stream_bus_* keys
# then throw DATA_SOURCE_NOT_FOUND (observed r20: a fresh target dir
# benched them at 0.002 s because Bench swallows per-key throws).
CP="src/main/resources:target/scala-2.13/classes:$(ls /opt/spark/jars/*.jar | tr '\n' ':')"
OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent java.util.concurrent.atomic; do
  OPENS="$OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
for p in sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  OPENS="$OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
exec java $OPENS -Xmx"${SPARK_DRIVER_MEM:-8g}" \
  -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  -cp "$CP" "$@"
