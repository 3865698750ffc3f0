"""Reference routingconnector golden cases, ported verbatim.

Sources:
- connector/routingconnector/logs_test.go:79-467 (the OTTL split /
  match-once / attribute-drop tables)
- connector/routingconnector/testdata/config_logs.yaml (X-Tenant table)

Each reference sub-test builds plog payloads with an X-Tenant resource
attribute and asserts which sinks receive which record counts; here the
payload is a DataFrame with an ``attributes`` map and the sinks are the
per-route row sets of the tagged frame.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from opentelemetry_collector_contrib_spark.connectors import Route, RoutingConnector

# the multi-match table from TestLogsAreCorrectlySplitPerResourceAttributeWithOTTL
# (logs_test.go:84-100), statements verbatim
SPLIT_TABLE = [
    Route.from_statement(
        'route() where IsMatch(attributes["X-Tenant"], ".*acme") == true', ["logs_0"]
    ),
    Route.from_statement(
        'route() where IsMatch(attributes["X-Tenant"], "_acme") == true', ["logs_1"]
    ),
    Route.from_statement(
        'route() where attributes["X-Tenant"] == "ecorp"', ["logs_default", "logs_0"]
    ),
]


def _consume(spark, rc, tenants):
    df = spark.createDataFrame(
        [(i, {"X-Tenant": t}) for i, t in enumerate(tenants)],
        "rec int, attributes map<string,string>",
    )
    out = rc(df)
    sinks = {s: 0 for s in rc.sinks()}
    for r in out.groupBy("route").count().collect():
        sinks[r["route"]] = r["count"]
    return sinks, out


@pytest.fixture()
def split_rc():
    return RoutingConnector(
        SPLIT_TABLE,
        default_sinks=["logs_default"],
        match_once=False,
        language="ottl",
    )


@pytest.fixture()
def once_rc():
    return RoutingConnector(
        SPLIT_TABLE,
        default_sinks=["logs_default"],
        match_once=True,
        language="ottl",
    )


class TestLogsAreCorrectlySplitPerResourceAttributeWithOTTL:
    # logs_test.go:130-143
    def test_matched_by_no_expressions(self, spark, split_rc):
        sinks, _ = _consume(spark, split_rc, ["something-else"])
        assert sinks == {"logs_0": 0, "logs_1": 0, "logs_default": 1}

    # logs_test.go:145-159
    def test_matched_one_expression(self, spark, split_rc):
        sinks, _ = _consume(spark, split_rc, ["xacme"])
        assert sinks == {"logs_0": 1, "logs_1": 0, "logs_default": 0}

    # logs_test.go:161-184: both records match both expressions; each
    # sink receives BOTH records and the deliveries are identical
    def test_matched_by_two_expressions(self, spark, split_rc):
        sinks, out = _consume(spark, split_rc, ["x_acme", "_acme"])
        assert sinks == {"logs_0": 2, "logs_1": 2, "logs_default": 0}
        s0 = {r.rec for r in out.filter("route = 'logs_0'").collect()}
        s1 = {r.rec for r in out.filter("route = 'logs_1'").collect()}
        assert s0 == s1 == {0, 1}

    # logs_test.go:186-211
    def test_one_matched_multiple_expressions_other_none(self, spark, split_rc):
        sinks, out = _consume(spark, split_rc, ["_acme", "something-else"])
        assert sinks == {"logs_0": 1, "logs_1": 1, "logs_default": 1}
        # the routing attribute must survive on the defaulted record
        kept = out.filter("route = 'logs_default'").collect()
        assert kept[0]["attributes"]["X-Tenant"] == "something-else"

    # logs_test.go:213-235: one statement, two pipelines -> both receive it
    def test_matched_one_expression_multiple_pipelines(self, spark, split_rc):
        sinks, out = _consume(spark, split_rc, ["ecorp"])
        assert sinks == {"logs_0": 1, "logs_1": 0, "logs_default": 1}
        d = out.filter("route = 'logs_default'").collect()
        s0 = out.filter("route = 'logs_0'").collect()
        assert [r.rec for r in d] == [r.rec for r in s0] == [0]


class TestLogsAreCorrectlyMatchOnceWithOTTL:
    # logs_test.go:289-298
    def test_matched_by_no_expressions(self, spark, once_rc):
        sinks, _ = _consume(spark, once_rc, ["something-else"])
        assert sinks == {"logs_0": 0, "logs_1": 0, "logs_default": 1}

    # logs_test.go:300-314
    def test_matched_one_expression(self, spark, once_rc):
        sinks, _ = _consume(spark, once_rc, ["xacme"])
        assert sinks == {"logs_0": 1, "logs_1": 0, "logs_default": 0}

    # logs_test.go:316-336: both records match both expressions but each
    # sinks ONLY to the first statement's pipeline
    def test_matched_by_two_expressions_sinks_to_one(self, spark, once_rc):
        sinks, out = _consume(spark, once_rc, ["x_acme", "_acme"])
        assert sinks == {"logs_0": 2, "logs_1": 0, "logs_default": 0}
        assert out.filter("route = 'logs_0'").count() == 2

    # logs_test.go:338-361
    def test_one_matched_multiple_expressions_other_none(self, spark, once_rc):
        sinks, out = _consume(spark, once_rc, ["_acme", "something-else"])
        assert sinks == {"logs_0": 1, "logs_1": 0, "logs_default": 1}
        kept = out.filter("route = 'logs_default'").collect()
        assert kept[0]["attributes"]["X-Tenant"] == "something-else"

    # logs_test.go:363-385: first-match statement carries TWO pipelines
    def test_matched_one_expression_multiple_pipelines(self, spark, once_rc):
        sinks, out = _consume(spark, once_rc, ["ecorp"])
        assert sinks == {"logs_0": 1, "logs_1": 0, "logs_default": 1}
        d = [r.rec for r in out.filter("route = 'logs_default'").collect()]
        s0 = [r.rec for r in out.filter("route = 'logs_0'").collect()]
        assert d == s0 == [0]


def test_logs_resource_attribute_dropped_by_ottl(spark):
    """logs_test.go:388-437: `delete_key(attributes, "X-Tenant") where
    attributes["X-Tenant"] == "acme"` routes the record to the
    non-default pipeline AND removes only the routing attribute."""
    rc = RoutingConnector(
        [
            Route.from_statement(
                'delete_key(attributes, "X-Tenant") where '
                'attributes["X-Tenant"] == "acme"',
                ["logs_other"],
            )
        ],
        default_sinks=["logs_default"],
        language="ottl",
    )
    df = spark.createDataFrame(
        [(0, {"X-Tenant": "acme", "attr": "acme"})],
        "rec int, attributes map<string,string>",
    )
    out = rc(df)
    rows = out.collect()
    assert len(rows) == 1 and rows[0]["route"] == "logs_other"
    attrs = dict(rows[0]["attributes"])
    assert "X-Tenant" not in attrs  # routing attribute dropped
    assert attrs["attr"] == "acme"  # non-routing attribute kept
    assert out.filter("route = 'logs_default'").count() == 0


def test_config_logs_yaml_table(spark):
    """testdata/config_logs.yaml: acme/globex tenants to their own otlp
    pipelines, everything else to logs/otlp-all (the default)."""
    rc = RoutingConnector(
        [
            Route.from_statement(
                'route() where attributes["X-Tenant"] == "acme"', ["logs/otlp-acme"]
            ),
            Route.from_statement(
                'route() where attributes["X-Tenant"] == "globex"',
                ["logs/otlp-globex"],
            ),
        ],
        default_sinks=["logs/otlp-all"],
        language="ottl",
    )
    sinks, _ = _consume(spark, rc, ["acme", "globex", "other", "acme"])
    assert sinks == {
        "logs/otlp-acme": 2,
        "logs/otlp-globex": 1,
        "logs/otlp-all": 1,
    }


def test_no_default_pipelines_drops_unmatched(spark):
    rc = RoutingConnector(
        [Route.from_statement('route() where attributes["X-Tenant"] == "acme"', ["o"])],
        default_sinks=[],
        language="ottl",
    )
    df = spark.createDataFrame(
        [(0, {"X-Tenant": "acme"}), (1, {"X-Tenant": "nope"})],
        "rec int, attributes map<string,string>",
    )
    out = rc(df)
    assert [r.rec for r in out.collect()] == [0]
    assert dict(out.dtypes)["route"] == "string"
