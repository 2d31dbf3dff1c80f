#!/usr/bin/env bash
# Plain-java runner for graft mains — same JVM options as build.sbt's
# forked run, but no sbt lock, so probes can run while sbt is busy.
# Usage: tools/jrun.sh <mainClass> [args...]
set -euo pipefail
cd "$(dirname "$0")/.."
CP="target/scala-2.13/classes:$(ls -d /opt/spark/jars/* | tr '\n' ':')"
OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent java.util.concurrent.atomic \
         sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  OPENS="$OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
exec java $OPENS \
  -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  -Xmx"${SPARK_DRIVER_MEM:-8g}" -XX:ReservedCodeCacheSize=512m \
  ${SPARK_GRAFT_JAVA_OPTS:-} \
  -cp "$CP" "$@"
