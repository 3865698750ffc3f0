"""metricstransform + metricsgeneration processors
(processor/metricstransformprocessor, processor/metricsgenerationprocessor)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from opentelemetry_collector_contrib_spark.processors import (
    GenerationRule,
    MetricOp,
    MetricTransform,
    MetricsGeneration,
    MetricsTransform,
)


@pytest.fixture(scope="module")
def metrics(spark):
    rows = [
        ("http.requests", 10.0, {"method": "get", "code": "200"}),
        ("http.requests", 4.0, {"method": "get", "code": "500"}),
        ("http.requests", 6.0, {"method": "post", "code": "200"}),
        ("http.errors", 4.0, {"method": "get", "code": "500"}),
        ("mem.used", 512.0, {"host": "a"}),
        ("mem.total", 1024.0, {"host": "a"}),
    ]
    return spark.createDataFrame(
        rows, "metric_name string, value double, labels map<string,string>"
    )


def _by_name(df, name):
    return [r for r in df.collect() if r.metric_name == name]


def test_update_rename_and_scale(metrics):
    mt = MetricsTransform([
        MetricTransform(
            include="mem.used", action="update", new_name="mem.used.mib",
            operations=[MetricOp("experimental_scale_value", scale=1 / 512)],
        )
    ])
    out = mt(metrics)
    assert not _by_name(out, "mem.used")
    got = _by_name(out, "mem.used.mib")
    assert len(got) == 1 and got[0].value == 1.0


def test_insert_keeps_original(metrics):
    mt = MetricsTransform([
        MetricTransform(
            include="^http\\.", match_type="regexp", action="insert",
            new_name="http.all",
            operations=[MetricOp("aggregate_labels", label_set=[], aggregation_type="sum")],
        )
    ])
    out = mt(metrics)
    assert len(_by_name(out, "http.requests")) == 3  # originals intact
    got = _by_name(out, "http.all")
    assert {r.value for r in got} == {20.0, 4.0}  # per-source-name rollup


def test_combine_matches_into_one_metric(metrics):
    mt = MetricsTransform([
        MetricTransform(
            include="^http\\.", match_type="regexp", action="combine",
            new_name="http.combined", aggregation_type="sum",
        )
    ])
    out = mt(metrics)
    assert not _by_name(out, "http.requests") and not _by_name(out, "http.errors")
    got = _by_name(out, "http.combined")
    # (get,500) points from requests AND errors collapse: 4 + 4 = 8
    vals = {tuple(sorted(r.labels.items())): r.value for r in got}
    assert vals[(("code", "500"), ("method", "get"))] == 8.0
    assert vals[(("code", "200"), ("method", "get"))] == 10.0


def test_label_ops(metrics):
    mt = MetricsTransform([
        MetricTransform(
            include="http.requests", action="update",
            operations=[
                MetricOp("add_label", label="env", new_value="prod"),
                MetricOp("update_label", label="method", new_label="verb",
                         value_actions={"get": "GET"}),
                MetricOp("delete_label_value", label="code", label_value="500"),
            ],
        )
    ])
    got = _by_name(mt(metrics), "http.requests")
    assert len(got) == 2  # the code=500 point is dropped
    for r in got:
        assert r.labels["env"] == "prod"
        assert "method" not in r.labels
    verbs = {r.labels["verb"] for r in got}
    assert verbs == {"GET", "post"}  # value_actions renamed only 'get'


def test_aggregate_labels_mean(metrics):
    mt = MetricsTransform([
        MetricTransform(
            include="http.requests", action="update",
            operations=[MetricOp("aggregate_labels", label_set=["method"],
                                 aggregation_type="mean")],
        )
    ])
    got = {r.labels["method"]: r.value for r in _by_name(mt(metrics), "http.requests")}
    assert got == {"get": 7.0, "post": 6.0}


def test_aggregate_label_values(metrics):
    mt = MetricsTransform([
        MetricTransform(
            include="http.requests", action="update",
            operations=[MetricOp("aggregate_label_values", label="code",
                                 aggregated_values=["200", "500"],
                                 new_value="all", aggregation_type="sum")],
        )
    ])
    got = _by_name(mt(metrics), "http.requests")
    vals = {tuple(sorted(r.labels.items())): r.value for r in got}
    assert vals[(("code", "all"), ("method", "get"))] == 14.0
    assert vals[(("code", "all"), ("method", "post"))] == 6.0


def test_generation_calculate_and_scale(metrics):
    mg = MetricsGeneration([
        GenerationRule(name="mem.utilization", type="calculate",
                       metric1="mem.used", metric2="mem.total",
                       operation="percent"),
        GenerationRule(name="mem.used.kib", type="scale",
                       metric1="mem.used", scale_by=2.0),
    ])
    out = mg(metrics)
    assert len(_by_name(out, "mem.used")) == 1  # originals intact
    util = _by_name(out, "mem.utilization")
    assert len(util) == 1 and util[0].value == 50.0
    assert util[0].labels["host"] == "a"
    kib = _by_name(out, "mem.used.kib")
    assert kib[0].value == 1024.0


def test_generation_no_fanout_on_duplicate_label_sets(spark):
    # metric2 carries two points with the SAME label set: the pairing
    # must stay 1:1 (deterministic min-value pick), never fan out m1
    df = spark.createDataFrame(
        [("a", 10.0, {"k": "x"}), ("b", 4.0, {"k": "x"}), ("b", 2.0, {"k": "x"})],
        "metric_name string, value double, labels map<string,string>",
    )
    mg = MetricsGeneration([
        GenerationRule(name="r", type="calculate", metric1="a", metric2="b",
                       operation="add")
    ])
    got = _by_name(mg(df), "r")
    assert len(got) == 1 and got[0].value == 12.0  # 10 + min(4, 2)


def test_generation_divide_by_zero_drops_point(spark):
    df = spark.createDataFrame(
        [("a", 1.0, {"k": "x"}), ("b", 0.0, {"k": "x"})],
        "metric_name string, value double, labels map<string,string>",
    )
    mg = MetricsGeneration([
        GenerationRule(name="r", type="calculate", metric1="a", metric2="b",
                       operation="divide")
    ])
    assert not _by_name(mg(df), "r")


def test_config_validation():
    with pytest.raises(ValueError):
        MetricsTransform([MetricTransform(include="x", action="group")])
    with pytest.raises(ValueError):
        MetricsTransform([MetricTransform(include="x",
                                          operations=[MetricOp("bogus")])])
    with pytest.raises(ValueError):
        GenerationRule(name="r", type="calculate", metric1="a")
    with pytest.raises(ValueError):
        GenerationRule(name="r", type="scale", metric1="a", operation="xor")
