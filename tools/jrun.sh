#!/bin/bash
# Run a graft main class outside sbt (no build lock): same JVM options
# as build.sbt's fork settings (JDK17 add-opens for Spark internals,
# big heap, widened JIT code cache). Usage:
#   tools/jrun.sh graft.Verify /root/testdata/sf0.01 /tmp/out
#   SPARK_GRAFT_SF_DIR=... tools/jrun.sh graft.Bench
# Compile first (sbt compile); this runs target/scala-2.13/classes.
set -euo pipefail
cd "$(dirname "$0")/.."
# local-cluster masters (SPARK_GRAFT_MASTER=local-cluster[n,c,m]): the
# in-process Worker launches executor JVMs through the spark-launcher
# library, whose classpath builder needs the Scala version pinned when
# SPARK_HOME isn't a dev tree ("Cannot find any build directories").
export SPARK_SCALA_VERSION="${SPARK_SCALA_VERSION:-2.13}"
# COUPLED LIST: the same opens live in build.sbt (sbt-forked JVMs)
# and graft.tools.ClusterConf (local-cluster executor JVMs) — a Spark
# upgrade needing another open must edit all three.
OPENS=""
for p in java.base/java.lang java.base/java.lang.invoke \
         java.base/java.lang.reflect java.base/java.io \
         java.base/java.net java.base/java.nio java.base/java.util \
         java.base/java.util.concurrent \
         java.base/java.util.concurrent.atomic java.base/sun.nio.ch \
         java.base/sun.nio.cs java.base/sun.security.action \
         java.base/sun.util.calendar; do
  OPENS="$OPENS --add-opens $p=ALL-UNNAMED"
done
exec java $OPENS \
  -Dspark.ui.enabled=false \
  -Dspark.sql.session.timeZone=UTC \
  -Xmx"${SPARK_DRIVER_MEM:-24g}" \
  -XX:ReservedCodeCacheSize=512m \
  -cp "target/scala-2.13/classes:/opt/spark/jars/*" "$@"
