#!/usr/bin/env bash
# Run a graft main class with plain `java` against the sbt-compiled classes
# (frees the sbt lock for concurrent compile/test work during long Verify /
# Bench / GenScale runs). Mirrors build.sbt's javaOptions exactly.
#
# Usage: SPARK_DRIVER_MEM=16g scripts/run_main.sh graft.Verify /root/repo/testdata-sf1 /tmp/vsf1
set -euo pipefail
cd "$(dirname "$0")/.."
CP="target/scala-2.13/classes:/opt/spark/jars/*"
OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net java.nio \
         java.util java.util.concurrent java.util.concurrent.atomic \
         sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  OPENS="$OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
exec java $OPENS \
  -Dspark.ui.enabled=false \
  -Dspark.sql.session.timeZone=UTC \
  -Xmx"${SPARK_DRIVER_MEM:-8g}" \
  -cp "$CP" "$@"
