"""Verbatim port of the json parser's reference test table.

Reference: pkg/stanza/operator/parser/json/parser_test.go:70-165
(TestParser: simple/nested/with_timestamp/with_scope) +
TestParserStringFailure/TestParserInvalidType (non-JSON input is a
parse error). The embedded time/scope sub-parser configs compose as
chained stages here (the stanza ParserConfig embeds them; the columnar
pipeline chains them — same output shape).
"""

from __future__ import annotations

from datetime import datetime

from opentelemetry_collector_contrib_spark.operators.parsers import (
    JsonParser,
    ScopeNameParser,
    TimeParser,
)


def test_simple_empty_object(spark):
    df = spark.createDataFrame([("{}",)], "body string")
    r = JsonParser()(df).collect()[0]
    assert dict(r.parsed) == {}


def test_nested_keys_promote(spark):
    df = spark.createDataFrame([('{"superkey":"superval"}',)], "body string")
    r = JsonParser()(df).collect()[0]
    assert dict(r.parsed) == {"superkey": "superval"}


def test_with_timestamp_subparser(spark):
    # TestParser "with_timestamp": epoch-s timestamp attribute feeds the
    # embedded TimeParser
    df = spark.createDataFrame(
        [('{"superkey":"superval","timestamp":1136214245}',)], "body string"
    )
    parsed = JsonParser(parse_to="attributes")(df)
    out = TimeParser(
        parse_from="attributes.timestamp", layout="s", layout_type="epoch"
    )(parsed).collect()[0]
    assert out.ts == datetime(2006, 1, 2, 15, 4, 5)
    assert out.attributes["superkey"] == "superval"


def test_with_scope_subparser(spark):
    df = spark.createDataFrame(
        [('{"superkey":"superval","logger_name":"logger"}',)], "body string"
    )
    parsed = JsonParser(parse_to="attributes")(df)
    out = ScopeNameParser(parse_from="attributes.logger_name")(parsed).collect()[0]
    assert out.scope == "logger"


def test_string_failure(spark):
    # TestParserStringFailure: 'invalid' is not JSON -> parse error
    df = spark.createDataFrame([("invalid",)], "body string")
    assert JsonParser()(df).collect()[0].parsed is None
    assert JsonParser(on_error="drop")(df).count() == 0
