"""span processor goldens from processor/spanprocessor/span_test.go.

Transcribed tables:
- TestSpanProcessor_Values (:119) — from_attributes single key over
  string/int/double/bool typed values
- TestSpanProcessor_MissingKeys (:219) — any missing key leaves the
  name untouched; all-present joins with '::'
- TestSpanProcessor_Separator / NoSeparator / SeparatorMultipleKeys
- TestSpanProcessor_ToAttributes (:419) — the 5-case rule table
  including rule chaining and break_after_match
- TestSpanProcessor_setStatusCode / setStatusCodeConditionally (:582)

Attribute values ride the string map (the engine's attributes column);
Go typed-value formatting (FormatBool/FormatInt/FormatFloat 'f' -1) is
exactly the plain string rendering used when the fixtures put the
values into the map.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from opentelemetry_collector_contrib_spark.processors import SpanProcessor

SCHEMA = "span_name string, attributes map<string,string>"


def _run(spark, proc, name, attrs):
    df = spark.createDataFrame([(name, attrs)], SCHEMA)
    return proc(df).collect()[0]


# --- Values + MissingKeys (from_attributes) ---------------------------
FOUR_KEYS = {"key1": "bob", "key2": "123", "key3": "234.129312", "key4": "true"}

FROM_ATTR_CASES = [
    # (keys, separator, input_name, attrs, expected_name)
    (["key1"], "::", "", None, ""),
    (["key1"], "::", "nil-attributes", None, "nil-attributes"),
    (["key1"], "::", "empty-attributes", {}, "empty-attributes"),
    (["key1"], "::", "string-type", {"key1": "bob"}, "bob"),
    (["key1"], "::", "int-type", {"key1": "123"}, "123"),
    (["key1", "key2", "key3", "key4"], "::", "first-keys-missing",
     {k: v for k, v in FOUR_KEYS.items() if k != "key1"}, "first-keys-missing"),
    (["key1", "key2", "key3", "key4"], "::", "middle-key-missing",
     {k: v for k, v in FOUR_KEYS.items() if k != "key3"}, "middle-key-missing"),
    (["key1", "key2", "key3", "key4"], "::", "last-key-missing",
     {k: v for k, v in FOUR_KEYS.items() if k != "key4"}, "last-key-missing"),
    (["key1", "key2", "key3", "key4"], "::", "all-keys-exists", FOUR_KEYS,
     "bob::123::234.129312::true"),
    # separator variants
    (["key1"], "", "no-separator", {"key1": "bob"}, "bob"),
    (["key1", "key2"], "", "no-separator-multi", {"key1": "bob", "key2": "123"},
     "bob123"),
    (["key1", "key2"], "-", "dash", {"key1": "bob", "key2": "123"}, "bob-123"),
]


@pytest.mark.parametrize(
    "keys,sep,name,attrs,expected", FROM_ATTR_CASES,
    ids=[c[2] or "empty-name" for c in FROM_ATTR_CASES],
)
def test_from_attributes(spark, keys, sep, name, attrs, expected):
    proc = SpanProcessor(from_attributes=keys, separator=sep)
    assert _run(spark, proc, name, attrs)["span_name"] == expected


# --- ToAttributes rule table ------------------------------------------
def test_to_attributes_single_group(spark):
    proc = SpanProcessor(
        to_attributes=[r"^\/api\/v1\/document\/(?P<documentId>.*)\/update\/1$"]
    )
    r = _run(spark, proc, "/api/v1/document/321083210/update/1", {})
    assert r["span_name"] == "/api/v1/document/{documentId}/update/1"
    assert r["attributes"] == {"documentId": "321083210"}


def test_to_attributes_two_groups(spark):
    proc = SpanProcessor(
        to_attributes=[r"^\/api\/(?P<version>.*)\/document\/(?P<documentId>.*)\/update\/2$"]
    )
    r = _run(spark, proc, "/api/v1/document/321083210/update/2", {})
    assert r["span_name"] == "/api/{version}/document/{documentId}/update/2"
    assert r["attributes"] == {"documentId": "321083210", "version": "v1"}


def test_to_attributes_rule_chaining(spark):
    proc = SpanProcessor(
        to_attributes=[
            r"^\/api\/.*\/document\/(?P<documentId>.*)\/update\/3$",
            r"^\/api\/(?P<version>.*)\/document\/.*\/update\/3$",
        ],
        break_after_match=False,
    )
    r = _run(spark, proc, "/api/v1/document/321083210/update/3", {})
    assert r["span_name"] == "/api/{version}/document/{documentId}/update/3"
    assert r["attributes"] == {"documentId": "321083210", "version": "v1"}


def test_to_attributes_break_after_match(spark):
    proc = SpanProcessor(
        to_attributes=[
            r"^\/api\/v1\/document\/(?P<documentId>.*)\/update\/4$",
            r"^\/api\/(?P<version>.*)\/document\/(?P<documentId>.*)\/update\/4$",
        ],
        break_after_match=True,
    )
    r = _run(spark, proc, "/api/v1/document/321083210/update/4", {})
    assert r["span_name"] == "/api/v1/document/{documentId}/update/4"
    assert r["attributes"] == {"documentId": "321083210"}


def test_to_attributes_empty_name_skipped(spark):
    proc = SpanProcessor(to_attributes=[r"(?P<rule>rule)"])
    r = _run(spark, proc, "", {})
    assert r["span_name"] == "" and r["attributes"] == {}


# --- set_status --------------------------------------------------------
def test_set_status_error_with_description(spark):
    df = spark.createDataFrame(
        [("op", {}, "UNSET")], SCHEMA + ", status_code string"
    )
    proc = SpanProcessor(status_code="Error", status_description="Set custom error message")
    r = proc(df).collect()[0]
    assert r["status_code"] == "ERROR"
    assert r["status_description"] == "Set custom error message"


def test_set_status_ok_drops_description(spark):
    df = spark.createDataFrame(
        [("op", {}, "ERROR")], SCHEMA + ", status_code string"
    )
    proc = SpanProcessor(status_code="Ok", status_description="ignored for Ok")
    r = proc(df).collect()[0]
    assert r["status_code"] == "OK"
    assert "status_description" not in proc(df).columns


def test_set_status_conditionally(spark):
    # include gate: only spans with http.status_code=400 get the status
    df = spark.createDataFrame(
        [
            ("a", {"http.status_code": "400"}, "OK"),
            ("b", {}, "OK"),
        ],
        SCHEMA + ", status_code string",
    )
    proc = SpanProcessor(
        status_code="Error", status_description="custom error message",
        include_condition="element_at(attributes, 'http.status_code') = '400'",
    )
    rows = {r["span_name"]: r for r in proc(df).collect()}
    assert rows["a"]["status_code"] == "ERROR"
    assert rows["a"]["status_description"] == "custom error message"
    assert rows["b"]["status_code"] == "OK"
    assert rows["b"]["status_description"] is None


def test_skip_span_gate_on_to_attributes(spark):
    # TestSpanProcessor_skipSpan posture: exclude gate leaves the span
    # untouched
    proc = SpanProcessor(
        to_attributes=[r"(?P<operation_website>.*?)$"],
        exclude_condition="span_name NOT LIKE '%/%'",
    )
    rows = {
        r["span_name"]
        for r in proc(
            spark.createDataFrame(
                [("www.test.com/code", {}), ("noslasheshere", {})], SCHEMA
            )
        ).collect()
    }
    assert "{operation_website}" in rows
    assert "noslasheshere" in rows


def test_zero_shuffle_plan(spark):
    df = spark.createDataFrame([("n", {})], SCHEMA)
    proc = SpanProcessor(
        from_attributes=["key1"],
        to_attributes=[r"(?P<g>\d+)"],
        status_code="Error",
        status_description="d",
    )
    plan = proc(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
