"""spark-submit entry point: flagship pipeline over a transcript table.

Usage (see submit_example.sh):

    spark-submit --py-files pkg.zip scripts/run_pipeline.py \
        [--table <iceberg_table> | --events <events.parquet>] \
        [--config <pipeline.json>] [--out <sink_base_path>]

Reads the transcript table (or derives transcripts from an events
parquet for sandbox runs), runs parse -> enrich -> route -> aggregate,
writes per-sink outputs partitioned by route plus the counts table, and
prints the obsreport metrics row.

``--config`` swaps the built-in flagship chain for a declarative
pipeline (the collector's YAML operator topology as JSON, compiled by
plans/compiler.py) applied BEFORE routing — the config-driven deploy
path a collector user would migrate their operator list onto.
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

from pyspark.sql import SparkSession

# local runs resolve the package from the repo root; under spark-submit
# the --py-files zip provides it instead
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from opentelemetry_collector_contrib_spark.data import derive_transcripts
from opentelemetry_collector_contrib_spark.metrics import MetricsCollector
from opentelemetry_collector_contrib_spark.pipeline import TranscriptPipeline


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--table", help="Iceberg/catalog transcript table name")
    ap.add_argument(
        "--events", default=None,
        help="events parquet to derive transcripts from (sandbox mode; "
        "default /root/testdata/sf0.01/events.parquet)",
    )
    ap.add_argument("--out", default="/tmp/logpipe_out")
    ap.add_argument(
        "--config",
        help="JSON pipeline config (collector operator topology) applied "
        "instead of the built-in parse/enrich stages",
    )
    ap.add_argument(
        "--dim", action="append", default=[], metavar="NAME=PATH",
        help="dim table for --config stages that reference one by name "
        "(lookup/geoip/k8sattributes): NAME=parquet_path, repeatable",
    )
    ap.add_argument(
        "--stream",
        help="run as a long-lived service: watch this directory for new "
        "transcript parquet files (the collector's receiver posture) and "
        "fan rows out to per-sink streaming writes",
    )
    ap.add_argument(
        "--once", action="store_true",
        help="with --stream: drain what's available and exit "
        "(availableNow trigger) instead of running forever",
    )
    args = ap.parse_args()

    if args.stream and (args.config or args.table or args.events):
        # fail loudly rather than silently running the built-in chain
        # while the user believes their topology / table / input is live
        # (--events defaults to None precisely so an EXPLICIT value is
        # distinguishable here; the batch default applies below)
        ap.error("--stream runs the built-in pipeline over a watched "
                 "directory; --config/--table/--events are batch-mode "
                 "options")
    if args.events is None:
        args.events = "/root/testdata/sf0.01/events.parquet"

    spark = SparkSession.builder.getOrCreate()
    if args.stream:
        from opentelemetry_collector_contrib_spark.streaming import (
            file_stream,
            streaming_pipeline,
            write_routed_stream,
        )

        coll = MetricsCollector(run_id="run_pipeline_stream")
        routed = streaming_pipeline(file_stream(spark, args.stream))
        q = write_routed_stream(
            routed,
            f"{args.out}/sinks",
            f"{args.out}/checkpoint",
            trigger_available_now=args.once,
            collector=coll,
        )
        try:
            q.awaitTermination()
        finally:
            # reachable on drain (--once), Ctrl-C and query failure alike
            for row in coll.snapshot(spark).collect():
                print(row)
            spark.stop()
        return
    if args.table:
        transcripts = spark.read.table(args.table)
    else:
        transcripts = derive_transcripts(spark.read.parquet(args.events))

    collector = MetricsCollector(run_id="run_pipeline")
    if args.config:
        # the config IS the pipeline: include a "routing" stage in it to
        # get per-sink fan-out (route column -> partitioned write)
        from opentelemetry_collector_contrib_spark.plans.compiler import (
            load_pipeline_json,
        )

        dims = {}
        for spec in args.dim:
            name, _, path = spec.partition("=")
            if not name or not path:
                ap.error(f"--dim expects NAME=PATH, got {spec!r}")
            dims[name] = spark.read.parquet(path)
        out = load_pipeline_json(args.config, dims)(transcripts)
        # the metrics contract holds in config mode too: counters
        # accumulate DURING the sink write, snapshot printed after
        out = collector.observe(out, "config_pipeline")
        writer = out.write.mode("overwrite")
        if "route" in out.columns:
            writer = writer.partitionBy("route")
        writer.parquet(f"{args.out}/sinks")
        for row in collector.snapshot(spark).collect():
            print(row)
        spark.stop()
        return

    routed, counts = TranscriptPipeline(collector=collector)(transcripts)
    (
        routed.write.mode("overwrite")
        .partitionBy("route")
        .parquet(f"{args.out}/sinks")
    )
    counts.write.mode("overwrite").parquet(f"{args.out}/counts")
    for row in collector.snapshot(spark).collect():
        print(row)
    spark.stop()


if __name__ == "__main__":
    main()
