"""GrafanaCloudConnector tests.

Reference: connector/grafanacloudconnector/connector.go:66-81,
host_metrics.go:42-71, connector_test.go (TestConsumeTraces expects one
traces_host_info gauge point per distinct host with grafana.host.id).
"""

from __future__ import annotations

import datetime as dt

from opentelemetry_collector_contrib_spark.connectors import GrafanaCloudConnector

SCHEMA = "attributes map<string,string>, ts timestamp"
T0 = dt.datetime(2026, 1, 1, 0, 0, 0)


def _rows(*attr_maps, minutes_apart=0):
    return [
        (m, T0 + dt.timedelta(minutes=i * minutes_apart))
        for i, m in enumerate(attr_maps)
    ]


def test_distinct_hosts_value_one(spark):
    df = spark.createDataFrame(
        _rows({"host.id": "foo"}, {"host.id": "foo"}, {"host.id": "bar"}),
        SCHEMA,
    )
    got = sorted(
        (r.metric_name, r.host_id, r.value)
        for r in GrafanaCloudConnector()(df).collect()
    )
    assert got == [
        ("traces_host_info", "bar", 1),
        ("traces_host_info", "foo", 1),
    ]


def test_first_present_identifier_wins(spark):
    conn = GrafanaCloudConnector(host_identifiers=["host.id", "host.name", "k8s.node.uid"])
    df = spark.createDataFrame(
        _rows(
            {"host.name": "by-name", "k8s.node.uid": "by-uid"},  # host.id absent
            {"host.id": "by-id", "host.name": "ignored"},
            {"k8s.node.uid": "by-uid"},
        ),
        SCHEMA,
    )
    got = sorted(r.host_id for r in conn(df).collect())
    assert got == ["by-id", "by-name", "by-uid"]


def test_resources_without_any_identifier_emit_nothing(spark):
    df = spark.createDataFrame(_rows({"service.name": "svc"}, {}), SCHEMA)
    assert GrafanaCloudConnector()(df).count() == 0  # host_metrics.go:49-50


def test_flush_interval_windows(spark):
    conn = GrafanaCloudConnector(flush_interval="10 minutes")
    df = spark.createDataFrame(
        _rows({"host.id": "foo"}, {"host.id": "foo"}, {"host.id": "foo"}, minutes_apart=7),
        SCHEMA,
    )
    # ts = 0, 7, 14 min -> two windows: [0,10) has foo twice (deduped), [10,20) once
    out = conn(df).collect()
    assert len(out) == 2
    assert all(r.value == 1 and r.host_id == "foo" for r in out)
    counts = conn.host_count(df).collect()
    assert sorted(r.host_count for r in counts) == [1, 1]


def test_host_count_whole_batch(spark):
    df = spark.createDataFrame(
        _rows({"host.id": "a"}, {"host.id": "b"}, {"host.id": "a"}),
        SCHEMA,
    )
    assert GrafanaCloudConnector().host_count(df).collect()[0].host_count == 2


def test_partial_aggregation_plan(spark):
    """The distinct must partial-aggregate map-side: shuffle rows are
    O(distinct hosts), not O(spans)."""
    df = spark.createDataFrame(_rows({"host.id": "x"}), SCHEMA)
    plan = (
        GrafanaCloudConnector()(df)._jdf.queryExecution().executedPlan().toString()
    )
    # two HashAggregates around ONE exchange = map-side dedup before shuffle
    assert plan.count("HashAggregate") == 2
    assert plan.count("Exchange") == 1
