#!/bin/bash
# Direct-JVM runner for graft mains (no sbt lock/startup): compiled classes
# + /opt/spark/jars, same --add-opens and defaults as build.sbt's fork.
# Usage: scripts/jrun.sh <mainClass> [args...]   (env passes through)
set -euo pipefail
MAIN="$1"; shift
ADD_OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent java.util.concurrent.atomic; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
for p in sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
CP="/root/repo/target/scala-2.13/classes:/root/repo/target/scala-2.13/test-classes:/opt/spark/jars/*"
exec java $ADD_OPENS \
  -Dspark.ui.enabled=${SPARK_UI:-false} \
  -Dspark.sql.session.timeZone=UTC \
  ${JRUN_OPTS:-} \
  -Xmx"${SPARK_DRIVER_MEM:-8g}" -cp "$CP" "$MAIN" "$@"
