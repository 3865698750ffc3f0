"""intervalprocessor goldens, from the reference's testdata
(processor/intervalprocessor/testdata/*/{input,next,output}.yaml) and
the ConsumeMetrics type dispatch (processor.go:104-146): cumulative
monotonic streams hold the NEWEST point per interval; gauges,
summaries, non-monotonic sums, and delta-temporality metrics pass
straight through.
"""

from __future__ import annotations

import datetime as dt

from opentelemetry_collector_contrib_spark.processors.metrics_state import (
    IntervalProcessor,
)

SCHEMA = (
    "metric string, metric_type string, temporality string, monotonic boolean,"
    " ts timestamp, value double, labels map<string,string>"
)

PASSTHROUGH = (
    "metric_type IN ('gauge', 'summary')"
    " OR NOT monotonic OR temporality = 'delta'"
)


def t(n):
    # the reference testdata uses tiny raw nanos (20/50/80); scale to
    # milliseconds so the points order within one 1-minute interval
    return dt.datetime(2026, 1, 1) + dt.timedelta(milliseconds=n)


def run(spark, rows):
    df = spark.createDataFrame(rows, SCHEMA)
    # stream identity: metric name + canonical label key (maps are not
    # directly partitionable)
    from pyspark.sql import functions as F

    df = df.withColumn("label_key", F.to_json("labels"))
    proc = IntervalProcessor(
        interval="1 minute",
        stream_keys=["metric", "label_key"],
        passthrough=PASSTHROUGH,
    )
    return sorted(
        (r.metric, r.value, r.interval_start is not None) for r in proc(df).collect()
    )


def test_basic_aggregation_keeps_newest(spark):
    """testdata/basic_aggregation: points at t=50,20,80 ns on one
    cumulative monotonic stream -> only the newest (444 at t=80)."""
    rows = [
        ("cumulative.monotonic.sum", "sum", "cumulative", True, t(50), 333.0, {"aaa": "bbb"}),
        ("cumulative.monotonic.sum", "sum", "cumulative", True, t(20), 222.0, {"aaa": "bbb"}),
        ("cumulative.monotonic.sum", "sum", "cumulative", True, t(80), 444.0, {"aaa": "bbb"}),
    ]
    assert run(spark, rows) == [("cumulative.monotonic.sum", 444.0, True)]


def test_gauges_are_passed_through(spark):
    rows = [
        ("test.gauge", "gauge", "cumulative", False, t(50), 345.0, {}),
        ("test.gauge", "gauge", "cumulative", False, t(20), 258.0, {}),
    ]
    # both emitted, no interval bucket
    assert run(spark, rows) == [("test.gauge", 258.0, False), ("test.gauge", 345.0, False)]


def test_delta_metrics_are_passed_through(spark):
    rows = [
        ("delta.sum", "sum", "delta", True, t(50), 3.0, {}),
        ("delta.sum", "sum", "delta", True, t(60), 5.0, {}),
    ]
    assert run(spark, rows) == [("delta.sum", 3.0, False), ("delta.sum", 5.0, False)]


def test_non_monotonic_sums_are_passed_through(spark):
    rows = [
        ("updown", "sum", "cumulative", False, t(50), 10.0, {}),
        ("updown", "sum", "cumulative", False, t(60), -4.0, {}),
    ]
    assert run(spark, rows) == [("updown", -4.0, False), ("updown", 10.0, False)]


def test_summaries_are_passed_through(spark):
    rows = [
        ("test.summary", "summary", "cumulative", True, t(50), 9.9, {}),
    ]
    assert run(spark, rows) == [("test.summary", 9.9, False)]


def test_mixed_streams_split_correctly(spark):
    rows = [
        ("cum", "sum", "cumulative", True, t(10), 1.0, {}),
        ("cum", "sum", "cumulative", True, t(90), 2.0, {}),
        ("g", "gauge", "cumulative", False, t(10), 7.0, {}),
    ]
    assert run(spark, rows) == [("cum", 2.0, True), ("g", 7.0, False)]


def test_histograms_are_aggregated_keep_newest(spark):
    """testdata/histograms_are_aggregated: cumulative histograms hold
    the NEWEST datapoint per interval; the out-of-order point (ts 20
    after ts 50) is ignored. Bucket arrays ride along row-level."""
    from pyspark.sql import functions as F

    rows = [
        # (metric, ts_ms, buckets) — the reference's 50/20/80 nanos
        ("cumulative.histogram.test", 50, [4, 7, 9, 6, 25]),
        ("cumulative.histogram.test", 20, [2, 3, 7, 4, 20]),
        ("cumulative.histogram.test", 80, [9, 12, 17, 8, 34]),
    ]
    df = spark.createDataFrame(
        [(m, t(ms), b) for m, ms, b in rows],
        "metric string, ts timestamp, buckets array<long>",
    )
    proc = IntervalProcessor(interval="1 minute", stream_keys=["metric"],
                             value_col="buckets")
    out = proc(df).collect()
    assert len(out) == 1
    assert list(out[0]["buckets"]) == [9, 12, 17, 8, 34]


def test_exp_histograms_are_aggregated_keep_newest(spark):
    """testdata/exp_histograms_are_aggregated: same keep-newest rule
    for exponential histograms (scale/offset/counts columns)."""
    rows = [
        ("expo.test", 50, 2, 1, [4, 7, 9]),
        ("expo.test", 20, 2, 1, [2, 3, 7]),
        ("expo.test", 80, 2, 0, [9, 12, 17, 8]),
    ]
    df = spark.createDataFrame(
        [(m, t(ms), s, o, c) for m, ms, s, o, c in rows],
        "metric string, ts timestamp, scale int, offset int, counts array<long>",
    )
    proc = IntervalProcessor(interval="1 minute", stream_keys=["metric"],
                             value_col="counts")
    out = proc(df).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["scale"], r["offset"], list(r["counts"])) == (2, 0, [9, 12, 17, 8])
