#!/usr/bin/env bash
# spark-submit launcher for the extraction job (north rule: "run via
# spark-submit on a multi-executor cluster"). On a real cluster, swap
# --master for yarn/k8s and add executor sizing; the job code is identical.
#
# Usage: scripts/submit.sh <tableDir> [nDocs] [cores]
set -euo pipefail
cd "$(dirname "$0")/.."
TABLE_DIR="${1:?usage: submit.sh <tableDir> [nDocs] [cores]}"
N_DOCS="${2:-20000}"
CORES="${3:-8}"

sbt -batch package > /dev/null

exec /opt/spark/bin/spark-submit \
  --master "local[$CORES]" \
  --class graft.ExtractMain \
  --conf spark.sql.shuffle.partitions="$CORES" \
  --conf spark.sql.session.timeZone=UTC \
  --conf spark.ui.enabled=false \
  --conf spark.sql.extensions=graft.plans.GraftExtensions \
  --driver-memory "${SPARK_DRIVER_MEM:-8g}" \
  target/scala-2.13/qetchspark_2.13-0.1.0.jar \
  "$TABLE_DIR" "$N_DOCS" "${@:4}"
