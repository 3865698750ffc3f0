"""spanmetrics buildKey/metric-name goldens, from the reference's
connector_test.go: TestBuildKeyExcludeDimensionsAll:519-530,
TestBuildKeyExcludeWrongDimensions:532-543,
TestBuildKeyWithDimensions:545-622, TestBuildMetricName:1309-1324.
The null-separated string key becomes the grouped column tuple here;
the cases assert the same dimension resolution and exclusion rules.
"""

from __future__ import annotations

import pytest

from opentelemetry_collector_contrib_spark.connectors.spanmetrics import (
    SpanMetricsConnector,
    build_metric_name,
)

SCHEMA = (
    "service_name string, span_name string, span_kind string, status_code string,"
    " duration_ms double, attributes map<string,string>"
)

ROW = ("ab", "c", "SPAN_KIND_UNSPECIFIED", "STATUS_CODE_UNSET", 3.0, {})


def calls_row(spark, conn, rows):
    df = spark.createDataFrame(rows, SCHEMA)
    out = conn.calls(df).collect()
    assert len(out) == 1
    return out[0]


@pytest.mark.parametrize(
    "namespace,metric,expected",
    [("", "metric", "metric"), ("ns", "metric", "ns.metric"),
     ("longer_namespace", "metric", "longer_namespace.metric")],
)
def test_build_metric_name(namespace, metric, expected):
    assert build_metric_name(namespace, metric) == expected


def test_calls_default_key(spark):
    r = calls_row(spark, SpanMetricsConnector(duration_col="duration_ms"), [ROW])
    assert (r.service_name, r.span_name, r.span_kind, r.status_code) == (
        "ab", "c", "SPAN_KIND_UNSPECIFIED", "STATUS_CODE_UNSET"
    )
    assert r.calls == 1
    assert r.metric_name == "calls"


def test_exclude_dimensions_all(spark):
    conn = SpanMetricsConnector(
        duration_col="duration_ms",
        exclude_dimensions=["span.kind", "service.name", "span.name", "status.code"],
    )
    r = calls_row(spark, conn, [ROW])
    # key is empty: only the count remains
    assert r.asDict() == {"calls": 1, "metric_name": "calls"}


def test_exclude_wrong_dimension_keeps_others(spark):
    conn = SpanMetricsConnector(
        duration_col="duration_ms",
        exclude_dimensions=["span.kind", "service.name.wrong.name", "span.name", "status.code"],
    )
    r = calls_row(spark, conn, [ROW])
    assert r.service_name == "ab"
    assert "span_kind" not in r.asDict()


def test_dimension_default_applies_when_missing(spark):
    conn = SpanMetricsConnector(
        duration_col="duration_ms",
        dimensions=["foo"],
        dimension_defaults={"foo": "bar"},
    )
    r = calls_row(spark, conn, [ROW])
    assert r.foo == "bar"


def test_dimension_no_default_stays_null(spark):
    conn = SpanMetricsConnector(duration_col="duration_ms", dimensions=["foo"])
    r = calls_row(spark, conn, [ROW])
    assert r.foo is None


def test_dimension_from_span_attributes(spark):
    conn = SpanMetricsConnector(duration_col="duration_ms", dimensions=["foo"])
    row = ("ab", "c", "SPAN_KIND_UNSPECIFIED", "STATUS_CODE_UNSET", 3.0, {"foo": "99"})
    r = calls_row(spark, conn, [row])
    assert r.foo == "99"


def test_namespace_prefixes_calls(spark):
    conn = SpanMetricsConnector(duration_col="duration_ms", namespace="ns")
    r = calls_row(spark, conn, [ROW])
    assert r.metric_name == "ns.calls"


def test_calls_single_scan_plan(spark):
    df = spark.createDataFrame([ROW], SCHEMA)
    plan = (
        SpanMetricsConnector(duration_col="duration_ms")
        .calls(df)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Exchange") == 1  # one shuffle, map-side combine
