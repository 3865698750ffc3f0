"""Streaming interval processor + streaming spanmetrics: watermarked
tumbling-window flushes with batch parity.

The batch twins (IntervalProcessor, SpanMetricsConnector) are
DuckDB-oracle-gated; these tests assert the streaming forms produce the
same rows (interval) / the same per-key totals across flush windows
(spanmetrics delta temporality) over identical inputs.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from opentelemetry_collector_contrib_spark.connectors.spanmetrics import (
    SpanMetricsConnector,
)
from opentelemetry_collector_contrib_spark.processors.metrics_state import (
    IntervalProcessor,
)
from opentelemetry_collector_contrib_spark.streaming.metrics import (
    streaming_interval_last,
    streaming_spanmetrics,
)

T0 = dt.datetime(2024, 1, 1, 0, 0, 0)


def _drain(q):
    q.awaitTermination(180)


def test_streaming_interval_last_matches_batch(spark, tmp_path):
    ddl = "metric string, ts timestamp, value double, seq int"
    s = dt.timedelta(seconds=1)
    rows = []
    for m in ("A", "B"):
        for i in range(150):
            rows.append((m, T0 + i * 7 * s, float(i + (m == "B") * 1000), i))
    # equal-timestamp tiebreak case
    rows.append(("A", T0 + 3 * s, -1.0, 999))
    rows.append(("A", T0 + 3 * s, -2.0, 500))
    df = spark.createDataFrame(rows, ddl)
    src = str(tmp_path / "in")
    df.coalesce(1).write.parquet(src)
    # a later file advances the watermark past the last real window so
    # append mode flushes it; its sentinel metric is excluded below
    spark.createDataFrame(
        [("__flush__", T0 + dt.timedelta(days=1), 0.0, 0)], ddl
    ).coalesce(1).write.mode("append").parquet(src)

    batch = IntervalProcessor(
        interval="60 seconds", stream_keys=["metric"], tiebreak_col="seq"
    )(df)
    want = {
        (r.metric, r.interval_start, r.value)
        for r in batch.select("metric", "interval_start", "value").collect()
    }

    stream = spark.readStream.schema(ddl).option(
        "maxFilesPerTrigger", 1
    ).parquet(src)
    out = streaming_interval_last(
        stream, interval="60 seconds", stream_keys=["metric"],
        tiebreak_col="seq",
    )
    q = (
        out.writeStream.format("memory")
        .queryName("iv_mem")
        .outputMode("append")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ck"))
        .start()
    )
    _drain(q)
    got = {
        (r.metric, r.interval_start, r.value)
        for r in spark.sql("SELECT * FROM iv_mem").collect()
        if r.metric != "__flush__"
    }
    assert got == want


def test_streaming_spanmetrics_totals_match_batch(spark, tmp_path):
    ddl = (
        "service_name string, span_name string, span_kind string, "
        "status_code string, duration_ms double, ts timestamp"
    )
    s = dt.timedelta(seconds=1)
    rows = []
    for i in range(300):
        rows.append(
            (
                f"svc{i % 3}",
                f"op{i % 2}",
                "SERVER",
                "ERROR" if i % 7 == 0 else "OK",
                float((i * 37) % 900),
                T0 + i * 2 * s,
            )
        )
    df = spark.createDataFrame(rows, ddl)
    src = str(tmp_path / "in2")
    df.coalesce(1).write.parquet(src)
    spark.createDataFrame(
        [("__flush__", "op", "SERVER", "OK", 1.0, T0 + dt.timedelta(days=1))],
        ddl,
    ).coalesce(1).write.mode("append").parquet(src)

    conn = SpanMetricsConnector(duration_col="duration_ms")
    want = {
        (r.service_name, r.span_name, r.status_code, r.le): (
            r.bucket_count,
            round(r.duration_sum, 6),
        )
        for r in conn(df).collect()
    }

    stream = spark.readStream.schema(ddl).option(
        "maxFilesPerTrigger", 1
    ).parquet(src)
    out = streaming_spanmetrics(
        stream, conn, ts_col="ts", flush_interval="60 seconds"
    )
    q = (
        out.writeStream.format("memory")
        .queryName("sm_mem")
        .outputMode("append")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ck2"))
        .start()
    )
    _drain(q)
    flushed = spark.sql("SELECT * FROM sm_mem")
    # several flush windows actually occurred (delta temporality)
    assert flushed.select("flush_start").distinct().count() > 1
    got = {
        (r.service_name, r.span_name, r.status_code, r.le): (
            r.bucket_count,
            round(r.duration_sum, 6),
        )
        for r in flushed.filter(F.col("service_name") != "__flush__")
        .groupBy("service_name", "span_name", "status_code", "le")
        .agg(
            F.sum("bucket_count").alias("bucket_count"),
            F.sum("duration_sum").alias("duration_sum"),
        )
        .collect()
    }
    assert got == want


def test_streaming_interval_rejects_calendar_grains(spark):
    import pytest as _pytest

    from opentelemetry_collector_contrib_spark.streaming.metrics import (
        streaming_interval_last,
    )

    df = spark.createDataFrame([], "metric string, ts timestamp, value double")
    with _pytest.raises(ValueError, match="batch-only"):
        streaming_interval_last(df, interval="1 month")
