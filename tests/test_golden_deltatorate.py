"""Golden port of the deltatorate processor table
(processor/deltatorateprocessor/processor_test.go:37-115): rate =
value / (timestamp - start_timestamp) per datapoint, only for
configured DELTA metrics; nil config converts nothing; cumulative
passes through; non-positive window -> rate 0."""

from __future__ import annotations

import datetime as dt

import pytest

from opentelemetry_collector_contrib_spark.processors.metrics_state import (
    DeltaToRate,
)

T0 = dt.datetime(2026, 1, 1)


def _frame(spark, per_metric, delta_seconds):
    """per_metric: {name: (values, temporality)}"""
    rows = []
    for name, (values, temp) in per_metric.items():
        for i, v in enumerate(values):
            rows.append(
                (name, T0, T0 + dt.timedelta(seconds=delta_seconds), float(v), temp, i)
            )
    return spark.createDataFrame(
        rows, "metric string, start timestamp, ts timestamp, value double,"
        " temporality string, dp int"
    )


def _run(spark, per_metric, delta_seconds, metrics):
    proc = DeltaToRate(
        stream_keys=["metric"], order_col="ts", start_col="start",
        metrics=metrics, temporality_col="temporality",
    )
    out = proc(_frame(spark, per_metric, delta_seconds)).collect()
    got = {}
    for r in sorted(out, key=lambda r: (r["metric"], r["dp"])):
        got.setdefault(r["metric"], []).append(r["rate"])
    return got


def test_expect_same_when_unconfigured(spark):
    got = _run(spark, {"metric_1": ([100], "delta"), "metric_2": ([4], "delta")},
               120, metrics=None)
    assert got == {"metric_1": [100.0], "metric_2": [4.0]}


def test_one_positive(spark):
    got = _run(spark, {"metric_1": ([120, 240, 360], "delta"),
                       "metric_2": ([360], "delta")},
               120, metrics=["metric_1", "metric_2"])
    assert got == {"metric_1": [1.0, 2.0, 3.0], "metric_2": [3.0]}


def test_cumulative_passes_through(spark):
    got = _run(spark, {"metric_1": ([100], "cumulative"),
                       "metric_2": ([4], "cumulative")},
               120, metrics=["metric_1", "metric_2"])
    assert got == {"metric_1": [100.0], "metric_2": [4.0]}


def test_zero_window_yields_zero(spark):
    got = _run(spark, {"metric_1": ([120, 240, 360], "delta"),
                       "metric_2": ([360], "delta")},
               0, metrics=["metric_1", "metric_2"])
    assert got == {"metric_1": [0.0, 0.0, 0.0], "metric_2": [0.0]}


def test_int_values_one_positive(spark):
    got = _run(spark, {"metric_1": ([120, 240, 360], "delta"),
                       "metric_2": ([360], "delta")},
               120, metrics=["metric_1", "metric_2"])
    assert got["metric_1"] == [1.0, 2.0, 3.0]


def test_legacy_lag_mode_unchanged(spark):
    df = spark.createDataFrame(
        [("m", T0, 5.0), ("m", T0 + dt.timedelta(seconds=10), 20.0)],
        "metric string, ts timestamp, value double",
    )
    out = DeltaToRate(stream_keys=["metric"], order_col="ts")(df).collect()
    assert len(out) == 1 and out[0]["rate"] == 2.0
