#!/usr/bin/env bash
# Run a graft main without sbt (same JDK17 module options build.sbt
# injects) — lets Verify/Bench/tools run while sbt holds the project
# lock, and is the vehicle for SPARK_GRAFT_MASTER=local-cluster runs.
# Usage: dev/run_main.sh <mainClass> [args...]
set -euo pipefail
cd "$(dirname "$0")/.."
MAIN="$1"; shift
# local-cluster workers launch executor processes through Spark's
# AbstractCommandBuilder, which needs SPARK_HOME and (for a
# distribution without launcher/target build dirs) an explicit
# SPARK_SCALA_VERSION — without them every executor dies at startup
# with "Cannot find any build directories."
export SPARK_HOME="${SPARK_HOME:-/opt/spark}"
export SPARK_SCALA_VERSION="${SPARK_SCALA_VERSION:-2.13}"
ADD_OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent java.util.concurrent.atomic; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
for p in sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
exec java $ADD_OPENS \
  -Xmx"${SPARK_DRIVER_MEM:-8g}" -Xss16m \
  -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  -cp "target/scala-2.13/classes:/opt/spark/jars/*" \
  "$MAIN" "$@"
