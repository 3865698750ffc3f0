#!/usr/bin/env bash
# Cluster submission shape for the engine (north rule: spark-submit
# --py-files on N and 4N executors). Locally the same job runs via
# plain `python` with master local[N] (see bench.py).
set -euo pipefail

REPO="$(cd "$(dirname "$0")/.." && pwd)"
ZIP="/tmp/spark_otel_logpipe.zip"
# fresh archive every run: `zip -qr` into an existing file only
# adds/updates entries, so a deleted or renamed module would silently
# keep shipping stale code to executors
rm -f "$ZIP"
(cd "$REPO" && zip -qr "$ZIP" opentelemetry_collector_contrib_spark)

# Example: flagship pipeline over an Iceberg transcript table.
# On a real cluster swap --master / add Iceberg catalog confs:
#   --conf spark.sql.catalog.lake=org.apache.iceberg.spark.SparkCatalog
#   --conf spark.sql.catalog.lake.type=rest ...
exec spark-submit \
  --master "${SPARK_MASTER:-local[8]}" \
  --py-files "$ZIP" \
  --conf spark.sql.adaptive.enabled=true \
  --conf spark.sql.adaptive.skewJoin.enabled=true \
  --conf spark.sql.shuffle.partitions="${SHUFFLE_PARTITIONS:-200}" \
  "$REPO/scripts/run_pipeline.py" "$@"
