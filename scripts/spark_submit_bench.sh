#!/bin/bash
# spark-submit launcher for the engine's driver mains — the deployment shape
# the north rule names ("run via spark-submit on a multi-executor cluster").
# In this sandbox the master is local[N] (no real cluster; see BASELINE.md's
# note on the two-parallelism-level proxy); on a cluster, point --master at
# YARN/k8s/standalone and the same jar + class + conf run unchanged — every
# pipeline already partitions/broadcasts explicitly and keeps state in
# executor-shared storage, never driver-local.
#
#   scripts/spark_submit_bench.sh graft.Bench
#   scripts/spark_submit_bench.sh graft.Verify /root/testdata/sf0.01 /tmp/graft_verify
#   scripts/spark_submit_bench.sh graft.CrawlMain ...
#
# Build the jar first: sbt -batch package
set -euo pipefail
cd "$(dirname "$0")/.."
CLASS="${1:?usage: spark_submit_bench.sh <mainClass> [args...]}"
shift
JAR="target/scala-2.13/extensioncrawlerspark_2.13-0.1.0.jar"
[ -f "$JAR" ] || { echo "jar missing — run: sbt -batch package" >&2; exit 1; }
exec /opt/spark/bin/spark-submit \
  --master "local[${SPARK_GRAFT_CPUS:-32}]" \
  --class "$CLASS" \
  --driver-memory "${SPARK_DRIVER_MEM:-24g}" \
  --conf spark.driver.extraJavaOptions="-Xms${SPARK_DRIVER_MEM:-24g} -XX:+UseParallelGC" \
  --conf spark.sql.shuffle.partitions="${SPARK_GRAFT_CPUS:-32}" \
  --conf spark.sql.session.timeZone=UTC \
  --conf spark.local.dir=/dev/shm/graft-spark \
  --conf spark.ui.enabled=false \
  "$JAR" "$@"
