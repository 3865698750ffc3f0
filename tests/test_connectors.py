"""Routing + count connector golden tests — fixtures mirror
connector/routingconnector/testdata/config_logs.yaml routing cases and
connector/countconnector/testdata/logs/*.yaml variants (FIXTURES.md 4-5)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from opentelemetry_collector_contrib_spark.connectors import (
    CountConnector,
    MetricDef,
    Route,
    RoutingConnector,
)


@pytest.fixture(scope="module")
def df(spark):
    return spark.createDataFrame(
        [
            (1, "ERROR", "exec", "user"),
            (2, "INFO", "exec", "assistant"),
            (3, "ERROR", "retrieval", "user"),
            (4, "DEBUG", "none", "tool"),
        ],
        "id int, level string, tool_category string, role string",
    )


ROUTES = [
    Route("level = 'ERROR'", "sink_errors"),
    Route("tool_category = 'exec'", "sink_exec"),
]


def test_match_once_first_wins(df):
    rc = RoutingConnector(ROUTES, default_sinks=["sink_default"], match_once=True)
    out = {r["id"]: r["route"] for r in rc(df).collect()}
    # id=1 matches BOTH -> first route in table order wins (logs.go:84-90)
    assert out == {1: "sink_errors", 2: "sink_exec", 3: "sink_errors", 4: "sink_default"}


def test_multi_match_duplicates(df):
    rc = RoutingConnector(ROUTES, default_sinks=["sink_default"], match_once=False)
    out = rc(df).groupBy("id").agg(F.sort_array(F.collect_list("route")).alias("r"))
    got = {r["id"]: list(r["r"]) for r in out.collect()}
    # id=1 lands in BOTH sinks (match_once=false fan-out, logs.go:62-103)
    assert got == {
        1: ["sink_errors", "sink_exec"],
        2: ["sink_exec"],
        3: ["sink_errors"],
        4: ["sink_default"],
    }


def test_multi_default_sinks(df):
    rc = RoutingConnector(
        [Route("level = 'FATAL'", "s")], default_sinks=["d1", "d2"], match_once=False
    )
    out = rc(df)
    assert out.count() == 8  # every row duplicated to both default sinks


def test_split_row_equality(df):
    rc = RoutingConnector(ROUTES, default_sinks=["sink_default"], match_once=True)
    parts = rc.split(df)
    assert {r["id"] for r in parts["sink_errors"].collect()} == {1, 3}
    assert {r["id"] for r in parts["sink_exec"].collect()} == {2}
    assert {r["id"] for r in parts["sink_default"].collect()} == {4}
    # routed-row union equals input (no loss, no duplication)
    total = sum(p.count() for p in parts.values())
    assert total == df.count()


def test_error_condition_routes_to_default(df):
    # error_mode=ignore: an error-ing condition (null comparison) -> default
    rc = RoutingConnector(
        [Route("cast(level as int) > 0", "weird")], default_sinks=["d"], match_once=True
    )
    assert {r["route"] for r in rc(df).collect()} == {"d"}


# --- count connector (countconnector/testdata/logs/*.yaml variants) ---------

def test_count_zero_conditions(df):
    out = CountConnector()(df).collect()
    assert len(out) == 1
    assert out[0]["metric_name"] == "log.record.count"
    assert out[0]["count"] == 4 and out[0]["attrs"] == {}


def test_count_one_condition(df):
    out = CountConnector([MetricDef("errors", conditions=["level = 'ERROR'"])])(df).collect()
    assert out[0]["count"] == 2


def test_count_multiple_conditions_or(df):
    out = CountConnector(
        [MetricDef("m", conditions=["level = 'ERROR'", "role = 'tool'"])]
    )(df).collect()
    assert out[0]["count"] == 3  # OR semantics


def test_count_one_attribute(df):
    out = CountConnector([MetricDef("by_role", attributes=[("role", None)])])(df)
    got = {r["attrs"]["role"]: r["count"] for r in out.collect()}
    assert got == {"user": 2, "assistant": 1, "tool": 1}


def test_count_multiple_attributes(df):
    out = CountConnector(
        [MetricDef("m", attributes=[("role", None), ("level", None)])]
    )(df)
    got = {(r["attrs"]["role"], r["attrs"]["level"]): r["count"] for r in out.collect()}
    assert got == {("user", "ERROR"): 2, ("assistant", "INFO"): 1, ("tool", "DEBUG"): 1}


def test_count_default_attribute_value(spark):
    df = spark.createDataFrame(
        [(1, "a"), (2, None), (3, None)], "id int, k string"
    )
    # with default: missing -> default bucket
    out = CountConnector([MetricDef("m", attributes=[("k", "unknown")])])(df)
    got = {r["attrs"]["k"]: r["count"] for r in out.collect()}
    assert got == {"a": 1, "unknown": 2}
    # without default: missing -> row EXCLUDED (counter.go:70-73)
    out = CountConnector([MetricDef("m", attributes=[("k", None)])])(df)
    got = {r["attrs"]["k"]: r["count"] for r in out.collect()}
    assert got == {"a": 1}


def test_count_condition_and_attribute(df):
    out = CountConnector(
        [MetricDef("m", conditions=["level = 'ERROR'"], attributes=[("role", None)])]
    )(df)
    got = {r["attrs"]["role"]: r["count"] for r in out.collect()}
    assert got == {"user": 2}


def test_count_multiple_metrics_one_pass(df):
    out = CountConnector(
        [
            MetricDef("total"),
            MetricDef("errors", conditions=["level = 'ERROR'"]),
            MetricDef("by_role", attributes=[("role", None)]),
        ]
    )(df)
    rows = out.collect()
    by_name = {}
    for r in rows:
        by_name.setdefault(r["metric_name"], []).append(r)
    assert by_name["total"][0]["count"] == 4
    assert by_name["errors"][0]["count"] == 2
    assert len(by_name["by_role"]) == 3


def test_count_from_attributes_map(spark):
    df = spark.createDataFrame(
        [({"env": "prod"},), ({"env": "dev"},), ({},)],
        "attributes map<string,string>",
    )
    out = CountConnector([MetricDef("m", attributes=[("env", "none")])])(df)
    got = {r["attrs"]["env"]: r["count"] for r in out.collect()}
    assert got == {"prod": 1, "dev": 1, "none": 1}


def test_routing_ottl_conditions_tenant_table(spark):
    """The reference routingconnector's config_logs.yaml table shape:
    `route() where attributes["X-Tenant"] == "acme"` — OTTL verbatim."""
    from opentelemetry_collector_contrib_spark.connectors import Route, RoutingConnector

    df = spark.createDataFrame(
        [("r1", {"X-Tenant": "acme"}), ("r2", {"X-Tenant": "globex"}),
         ("r3", {"X-Tenant": "other"}), ("r4", None)],
        "body string, attributes map<string,string>",
    )
    rc = RoutingConnector(
        [
            Route('attributes["X-Tenant"] == "acme"', "logs/otlp-acme"),
            Route('attributes["X-Tenant"] == "globex"', "logs/otlp-globex"),
        ],
        default_sinks=["logs/otlp-all"],
        language="ottl",
    )
    got = {r.body: r.route for r in rc(df).collect()}
    assert got == {
        "r1": "logs/otlp-acme",
        "r2": "logs/otlp-globex",
        "r3": "logs/otlp-all",
        "r4": "logs/otlp-all",
    }
    import pytest

    with pytest.raises(ValueError):
        RoutingConnector([], language="yaml")


# --- exceptions connector (connector/exceptionsconnector) -------------------


@pytest.fixture(scope="module")
def span_df(spark):
    """Span frame shaped like the reference's test trace
    (exceptionsconnector connector_test.go buildSampleTrace): spans with
    an events array; some events are exceptions, some are not, one span
    has no service name (skipped), one has two exception events."""
    rows = [
        # (trace, span, service, name, kind, status, attrs, events)
        ("t1", "s1", "svc-a", "op-read", "SPAN_KIND_CLIENT", "STATUS_CODE_ERROR",
         {"peer": "db"},
         [("exception", {"exception.type": "IOError",
                         "exception.message": "disk gone",
                         "exception.stacktrace": "st1"})]),
        ("t1", "s2", "svc-a", "op-read", "SPAN_KIND_CLIENT", "STATUS_CODE_ERROR",
         {},
         [("exception", {"exception.type": "IOError",
                         "exception.message": "disk gone"})]),
        ("t2", "s3", "svc-b", "op-write", "SPAN_KIND_SERVER", "STATUS_CODE_OK",
         {"exception.type": "SpanWins"},   # span attr takes precedence
         [("exception", {"exception.type": "EventLoses",
                         "exception.message": "m1"}),
          ("exception", {"exception.type": "EventLoses",
                         "exception.message": "m2"}),
          ("checkpoint", {})]),            # non-exception event ignored
        ("t3", "s4", None, "op-skip", "SPAN_KIND_INTERNAL", "STATUS_CODE_OK",
         {}, [("exception", {"exception.type": "Lost",
                             "exception.message": "no service"})]),
        ("t4", "s5", "svc-a", "op-clean", "SPAN_KIND_INTERNAL", "STATUS_CODE_OK",
         {}, []),                          # no events at all
    ]
    data = [
        (t, s, svc, n, k, st, attrs,
         [{"name": en, "ts": None, "attributes": ea} for en, ea in evs])
        for t, s, svc, n, k, st, attrs, evs in rows
    ]
    return spark.createDataFrame(
        data,
        "trace_id string, span_id string, service_name string, "
        "span_name string, span_kind string, status_code string, "
        "attributes map<string,string>, "
        "events array<struct<name string, ts timestamp, "
        "attributes map<string,string>>>",
    )


def test_exceptions_metrics_counts_and_dimension_precedence(span_df):
    from opentelemetry_collector_contrib_spark.connectors import (
        ExceptionsConnector,
    )

    out = ExceptionsConnector().metrics(span_df).collect()
    by_key = {
        (r.service_name, r.span_name, r.exception_type, r.exception_message): r["count"]
        for r in out
    }
    # two IOError events on svc-a spans with identical dims -> one dp of 2
    assert by_key[("svc-a", "op-read", "IOError", "disk gone")] == 2
    # span attribute beats event attribute (connector.go:50-55); the two
    # events differ only in message -> two dps of 1 with type=SpanWins
    assert by_key[("svc-b", "op-write", "SpanWins", "m1")] == 1
    assert by_key[("svc-b", "op-write", "SpanWins", "m2")] == 1
    # nil-service span skipped; checkpoint event ignored; no-event span absent
    assert len(out) == 3


def test_exceptions_metrics_default_dimension_and_exemplars(span_df):
    from opentelemetry_collector_contrib_spark.connectors import (
        ExcDimension,
        ExceptionsConnector,
    )

    c = ExceptionsConnector(
        dimensions=[ExcDimension("deploy.env", default="prod")],
        exemplars=True,
    )
    out = {r.span_name: r for r in c.metrics(span_df).collect()}
    # missing attr falls back to the configured default (connector.go:58-60)
    assert out["op-read"].deploy_env == "prod"
    ex = out["op-read"].exemplars
    assert {(e.trace_id, e.span_id) for e in ex} == {("t1", "s1"), ("t1", "s2")}


def test_exceptions_logs_one_record_per_event(span_df):
    from opentelemetry_collector_contrib_spark.connectors import (
        ExceptionsConnector,
    )

    logs = ExceptionsConnector().logs(span_df).collect()
    assert len(logs) == 4  # s1, s2, s3 x2 (checkpoint + nil-service dropped)
    assert all(r.severity_text == "ERROR" and r.severity_number == 17 for r in logs)
    by_span = {}
    for r in logs:
        by_span.setdefault(r.span_id, []).append(r)
    # stacktrace copied when present, '' otherwise (connector_logs.go getValue)
    assert by_span["s1"][0].exception_stacktrace == "st1"
    assert by_span["s2"][0].exception_stacktrace == ""
    # span attributes carried alongside (connector_logs.go:105-107)
    assert dict(by_span["s1"][0].span_attributes) == {"peer": "db"}
    assert sorted(r.exception_message for r in by_span["s3"]) == ["m1", "m2"]


def test_exceptions_reserved_dimension_rejected():
    import pytest as _pytest

    from opentelemetry_collector_contrib_spark.connectors import (
        ExcDimension,
        ExceptionsConnector,
    )

    with _pytest.raises(ValueError):
        ExceptionsConnector(dimensions=[ExcDimension("span.kind")])
    with _pytest.raises(ValueError):
        ExceptionsConnector(
            dimensions=[ExcDimension("x"), ExcDimension("x")]
        )
