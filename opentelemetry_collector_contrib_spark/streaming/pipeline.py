"""Streaming pipeline stages.

The parse/enrich/route stages are stateless projections + broadcast
joins, so ``TranscriptPipeline``'s builders apply to streaming frames
unchanged. Stateful stages get streaming-native forms:

- ``windowed_counts``: count-connector semantics per event-time window
  with a watermark — the streaming restatement of the interval
  processor (processor/intervalprocessor/config.go:20-31) feeding the
  count connector (connector/countconnector/counter.go:38-128); late
  rows beyond the watermark are dropped, mirroring ``max_stale``
  eviction (deltatocumulativeprocessor/config.go:15-24).
- ``session_recombine``: recombine with ``force_flush_timeout``
  (transformer/recombine/transformer.go:60-83) as a session window —
  a conversation's turns concatenate until a `gap` of event-time
  silence flushes the session. This is the batch-meaningless timeout
  semantics done right in streaming (SURVEY.md 7.3).
- ``streaming_dedup_exact``: exact dedup at ingest via
  ``dropDuplicatesWithinWatermark`` — one state entry per content hash,
  evicted when the watermark passes (bounded state, the eviction
  posture of deltatocumulative ``max_stale``).
- ``write_routed_stream``: per-sink fan-out from ONE tagged stream via
  ``foreachBatch`` + ``partitionBy(route)`` — single pass per
  micro-batch, the streaming twin of the routing connector write.
- ``streaming_rollup`` / ``read_rollup``: the continuous-aggregate
  pattern (TimescaleDB caggs) for the multi-grain hypertable rollup:
  each micro-batch appends its own ADDITIVE partial aggregates (a few
  rows per grain x bucket x dims), the reader view merges by summing.
  No cross-batch state store at all — state IS the partial table, so
  a 10^12-row stream carries rollup state sized by (time range x
  grain), never by row count, and replays stay idempotent by
  overwriting their own batch directory.
"""

from __future__ import annotations

import logging
import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..pipeline import TranscriptPipeline



def _with_event_time(stream: DataFrame, ts_col: str, watermark: str) -> DataFrame:
    """Apply a watermark, casting a TIMESTAMP_NTZ event-time column
    first (this repo's parquet tables read ``ts`` as ntz; withWatermark
    requires a zoned TIMESTAMP — session zone is pinned UTC)."""
    if dict(stream.dtypes).get(ts_col) == "timestamp_ntz":
        stream = stream.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    return stream.withWatermark(ts_col, watermark)


def streaming_pipeline(
    stream: DataFrame, match_once: bool = True
) -> DataFrame:
    """parse -> enrich -> route over a streaming transcript frame;
    returns the route-tagged stream (aggregate separately — streaming
    aggregation needs a watermark, see ``windowed_counts``)."""
    p = TranscriptPipeline(match_once=match_once)
    return p.route(p.enrich(p.parse(stream)))


def windowed_counts(
    routed: DataFrame,
    window: str = "1 minute",
    watermark: str = "2 minutes",
    ts_col: str = "ts",
) -> DataFrame:
    """Per-(window, route, role) record counts with late-data bound."""
    return (
        _with_event_time(routed, ts_col, watermark)
        .groupBy(F.window(ts_col, window).alias("w"), "route", "role")
        .agg(F.count(F.lit(1)).alias("count"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "route",
            "role",
            "count",
        )
    )


def session_recombine(
    stream: DataFrame,
    gap: str = "5 minutes",
    watermark: str = "10 minutes",
    source_identifier: str = "conv_id",
    combine_field: str = "text",
    combine_with: str = "\n",
    order_by: str = "turn_idx",
    ts_col: str = "ts",
) -> DataFrame:
    """Concatenate a conversation's turns per event-time session; a
    ``gap`` of silence flushes the session (force_flush_timeout)."""
    collected = F.sort_array(
        F.collect_list(
            F.struct(F.col(order_by).alias("__o__"), F.col(combine_field).alias("__v__"))
        )
    )
    return (
        _with_event_time(stream, ts_col, watermark)
        .groupBy(
            F.session_window(F.col(ts_col), gap).alias("session"),
            F.col(source_identifier),
        )
        .agg(
            F.array_join(
                F.transform(collected, lambda s: s.getField("__v__")),
                combine_with,
            ).alias(combine_field),
            F.count(F.lit(1)).alias("n_turns"),
            F.min(order_by).alias(order_by),
        )
        .select(
            F.col("session.start").alias("session_start"),
            F.col("session.end").alias("session_end"),
            source_identifier,
            order_by,
            combine_field,
            "n_turns",
        )
    )


def streaming_dedup_exact(
    stream: DataFrame,
    key_col: str = "text",
    watermark: str = "10 minutes",
    ts_col: str = "ts",
) -> DataFrame:
    """Exact dedup at streaming ingest: keep the first row per content
    hash, with state bounded by the watermark.

    The streaming twin of ``training.dedup.exact_dedup`` — same
    ``md5(key)`` identity, but instead of an unbounded groupBy the
    engine's ``dropDuplicatesWithinWatermark`` keeps one state entry
    per hash and EVICTS it once the watermark passes, so a 10^12-turn
    ingest holds only the watermark-window's worth of hashes per
    partition (exact global dedup over all history is the batch op's
    job; the reference's bounded-state analogue is the recombine
    max_sources / deltatocumulative max_stale eviction posture).
    State is hash-partitioned on the dedup key by the engine — the
    same shuffle the batch groupBy pays, amortized per micro-batch.

    Watermarks require a zoned TIMESTAMP; parquet event times commonly
    read as TIMESTAMP_NTZ (this repo's tables do), so an ntz event-time
    column is cast session-zone-as-UTC first (shared
    ``_with_event_time`` — all three watermark entry points use it).
    """
    staged = _with_event_time(
        stream.withColumn("__h", F.md5(F.col(key_col))), ts_col, watermark
    )
    return staged.dropDuplicatesWithinWatermark(["__h"]).drop("__h")


def write_routed_stream(
    routed: DataFrame,
    base_path: str,
    checkpoint: str,
    fmt: str = "parquet",
    trigger_available_now: bool = False,
    collector=None,
    routes: list[str] | None = None,
):
    """Fan the tagged stream out to per-sink directories in one pass
    per micro-batch (file-exporter group_by semantics,
    exporter/fileexporter/grouping_file_exporter.go:115-130).

    ``collector`` (a :class:`..metrics.MetricsCollector`) records
    obsreport-style per-batch counters — total rows plus, when
    ``routes`` names the expected sinks, a per-route count — attached
    via a short-lived ``observe()`` on the batch frame, so they
    accumulate DURING the write action with zero extra passes (the
    reference's exporter obsreport counts per send the same way). The
    Observation is read and released after each batch and the values go
    through ``record_batch`` (keyed by batch_id), so a long-lived
    service neither leaks one JVM Observation per batch nor
    double-counts a replayed micro-batch."""
    from pyspark.sql.observation import Observation

    def sink_batch(batch: DataFrame, batch_id: int) -> None:
        obs = None
        if collector is not None:
            exprs = [F.count(F.lit(1)).alias("rows")] + [
                F.sum(F.when(F.col("route") == r, 1).otherwise(0)).alias(
                    f"rows_{r}"
                )
                for r in (routes or [])
            ]
            obs = Observation()
            batch = batch.observe(obs, *exprs)
        # replay-idempotent: a micro-batch replayed after a crash (same
        # batch_id, checkpoint not yet committed) OVERWRITES its own
        # batch directory instead of appending duplicates — the
        # foreachBatch exactly-once contract the batch twin gets from
        # idempotent overwrite (writers.write_routed)
        (
            batch.write.mode("overwrite")
            .partitionBy("route")
            .format(fmt)
            .save(os.path.join(base_path, f"batch_id={batch_id}"))
        )
        if obs is not None:
            got = collector._get_or_none(obs)
            if got is not None:
                collector.record_batch("stream_sink", batch_id, got)
            else:
                # Observation result unavailable after the write action:
                # this micro-batch's counters are lost — say so instead
                # of silently understating stream_sink totals
                logging.getLogger(__name__).warning(
                    "stream_sink batch_id=%s: Observation result "
                    "unavailable; dropping this micro-batch's counters",
                    batch_id,
                )

    writer = (
        routed.writeStream.foreachBatch(sink_batch)
        .option("checkpointLocation", checkpoint)
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def streaming_rollup(
    stream: DataFrame,
    ts_col: str,
    grains,
    dims,
    aggs_factory,
    base_path: str,
    checkpoint: str,
    trigger_available_now: bool = False,
):
    """Continuous aggregate: maintain the multi-grain hypertable rollup
    over a stream by appending each micro-batch's PARTIAL rollup
    (``operators.temporal.hypertable_rollup`` of just that batch) and
    merging at read time (``read_rollup``).

    ``aggs_factory`` returns fresh agg Columns per batch and MUST be
    additive (counts, integer/scaled sums) — merge is a plain SUM over
    batches, exactly the partial/final split Spark itself uses inside
    one aggregation, lifted across micro-batches. Non-additive finals
    (averages, rates) belong in the reader view, derived from additive
    parts. This needs NO streaming state store: per-batch output is
    bounded by (buckets-in-batch x dims x grains), and a replayed batch
    (same batch_id, uncommitted checkpoint) overwrites its own
    directory — the same exactly-once contract as
    ``write_routed_stream``.
    """
    from ..operators.temporal import hypertable_rollup

    def sink_batch(batch: DataFrame, batch_id: int) -> None:
        partial = hypertable_rollup(batch, ts_col, grains, dims, aggs_factory())
        (
            partial.coalesce(1)  # a handful of rows per batch
            .write.mode("overwrite")
            .save(os.path.join(base_path, f"batch_id={batch_id}"))
        )

    writer = (
        stream.writeStream.foreachBatch(sink_batch)
        .option("checkpointLocation", checkpoint)
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def read_rollup(spark, base_path: str, dims) -> DataFrame:
    """Merge view over a ``streaming_rollup`` directory: sum every
    additive partial column grouped by (grain, bucket, *dims). Output
    schema matches the batch ``hypertable_rollup`` of the full data
    when the aggs are additive."""
    # batch dirs are named batch_id=N, so plain partition discovery
    # reads them all and surfaces batch_id as a (dropped) partition col
    parts = spark.read.parquet(base_path)
    keys = ["grain", "bucket", *dims]
    measure_cols = [c for c in parts.columns if c not in keys and c != "batch_id"]
    return parts.groupBy(*keys).agg(
        *[F.sum(c).alias(c) for c in measure_cols]
    )


def streaming_ingest_dedup(
    stream: DataFrame,
    base_path: str,
    checkpoint: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    trigger_available_now: bool = False,
):
    """Continuous corpus ingest with cross-batch EXACT dedup -- the
    streaming form of :func:`~..training.dedup.incremental_dedup`:
    each micro-batch drops rows whose text hash already exists in any
    PRIOR batch, collapses intra-batch duplicates to the lowest id,
    appends survivors under ``<base>/docs/batch_id=N`` and their
    hashes under ``<base>/seen/batch_id=N``.

    State IS the on-disk hash table (one row per unique kept doc),
    not a streaming state store: unlike
    ``dropDuplicatesWithinWatermark`` (bounded state, duplicates
    forgotten past the watermark -- the log-pipeline posture), corpus
    ingest must remember every hash FOREVER, which only a table can.
    At scale the seen table is written bucketed by hash (the Iceberg
    sink) so the per-batch anti-join is bucket-local, and the Bloom
    prune documented on ``incremental_dedup`` bounds the probe side.

    Exactly-once on replay: a retried batch overwrites its OWN two
    ``batch_id=N`` directories, and the seen read FILTERS to
    ``batch_id < N`` -- so a half-written previous attempt can neither
    duplicate output nor anti-join the batch against its own hashes
    (which would silently drop every row of the retried batch).
    """
    import os

    docs_dir = os.path.join(base_path, "docs")
    seen_dir = os.path.join(base_path, "seen")

    def sink_batch(batch: DataFrame, batch_id: int) -> None:
        from pyspark.errors import AnalysisException

        from ..training.dedup import exact_dedup

        spark = batch.sparkSession
        hashed = batch.withColumn("__h", F.md5(F.col(text_col)))
        try:
            seen = spark.read.parquet(seen_dir).filter(
                F.col("batch_id") < batch_id
            ).select(F.col("__h").alias("__seen_h"))
        except AnalysisException:  # first batch: no seen table yet.
            # ONLY the missing-path case may fall through — any other
            # read failure (corrupt footer, transient FS error) must
            # FAIL the batch and retry, because ingesting with seen=None
            # silently disables cross-batch dedup forever.
            seen = None
        # null-SAFE anti join: md5(null text) is null, and a plain
        # left_anti on __h would let one null-text doc through EVERY
        # batch (null never equals null)
        fresh = (
            hashed.join(
                seen,
                hashed["__h"].eqNullSafe(seen["__seen_h"]),
                "left_anti",
            )
            if seen is not None
            else hashed
        )
        out = exact_dedup(
            fresh.drop("__h"), text_col=text_col, id_col=id_col
        )
        # one execution for both write actions — without the persist the
        # seen read + anti-join + exact_dedup lineage runs twice per
        # trigger for the life of the stream
        out = out.persist()
        try:
            out.write.mode("overwrite").parquet(
                os.path.join(docs_dir, f"batch_id={batch_id}")
            )
            (
                out.select(F.md5(F.col(text_col)).alias("__h"))
                .distinct()
                .write.mode("overwrite")
                .parquet(os.path.join(seen_dir, f"batch_id={batch_id}"))
            )
        finally:
            out.unpersist()

    writer = (
        stream.writeStream.foreachBatch(sink_batch)
        .option("checkpointLocation", checkpoint)
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
