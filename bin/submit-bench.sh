#!/usr/bin/env bash
# spark-submit launcher for the engine's mains on a real cluster.
# Local sandbox equivalent: sbt "runMain graft.Bench" (see BASELINE.md).
#
#   bin/submit-bench.sh graft.Bench        # per-round benchmark
#   bin/submit-bench.sh graft.ScalingBench # N vs 4N scaling evidence
#   bin/submit-bench.sh graft.Verify <sfDir> <outDir>
#
# On a cluster, size executors instead of local threads:
#   --num-executors N --executor-cores 4 --executor-memory 16g
# and set GRAFT_SCALE_LO/HI to the two executor counts.
set -euo pipefail
MAIN="${1:-graft.Bench}"; shift || true
JAR="target/scala-2.13/graphragapidbspark_2.13-0.1.0.jar"
[ -f "$JAR" ] || sbt -batch package
exec "${SPARK_HOME:-/opt/spark}"/bin/spark-submit \
  --class "$MAIN" \
  --conf spark.sql.shuffle.partitions="${GRAFT_PARTS:-64}" \
  --conf spark.sql.adaptive.enabled=true \
  --conf spark.sql.session.timeZone=UTC \
  --conf spark.sql.extensions=graft.GraftExtensions \
  "$JAR" "$@"
