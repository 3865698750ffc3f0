"""Verbatim port of the trace parser's reference test table.

Reference: pkg/stanza/operator/parser/trace/parser_test.go:99-295
(TestProcess + TestTraceParserParse): independent per-field hex
decode, invalid fields stay unset while valid siblings parse, default
trace_id/span_id/trace_flags sources.
"""

from __future__ import annotations

from opentelemetry_collector_contrib_spark.operators import TraceParser

SPAN_HEX = "480140f3d770a5ae32f0a22b6a812cff"
TRACE_HEX = "92c3792d54ba94f3"


def test_all_fields_custom_sources(spark):
    # TestProcess "all": custom parse_from per field
    df = spark.createDataFrame(
        [(SPAN_HEX, TRACE_HEX, "01")],
        "app_span_id string, app_trace_id string, trace_flags_field string",
    )
    r = TraceParser(
        span_from="app_span_id", trace_from="app_trace_id",
        flags_from="trace_flags_field",
    )(df).collect()[0]
    assert bytes(r.span_id) == bytes.fromhex(SPAN_HEX)
    assert bytes(r.trace_id) == bytes.fromhex(TRACE_HEX)
    assert bytes(r.trace_flags) == b"\x01"


def test_default_sources(spark):
    # TestTraceParserParse "AllFields": default field names
    df = spark.createDataFrame(
        [(TRACE_HEX, SPAN_HEX, "01")],
        "trace_id string, span_id string, trace_flags string",
    )
    r = TraceParser()(df).collect()[0]
    assert bytes(r.trace_id) == bytes.fromhex(TRACE_HEX)
    assert bytes(r.span_id) == bytes.fromhex(SPAN_HEX)


def test_wrong_field_names_noop(spark):
    # "WrongFields": camelCase names don't match the defaults -> nils
    df = spark.createDataFrame(
        [(TRACE_HEX, SPAN_HEX, "01")],
        "traceId string, spanId string, traceFlags string",
    )
    r = TraceParser()(df).collect()[0]
    assert "trace_id" not in r.asDict()


def test_only_trace_id(spark):
    df = spark.createDataFrame([(TRACE_HEX,)], "trace_id string")
    r = TraceParser()(df).collect()[0]
    assert bytes(r.trace_id) == bytes.fromhex(TRACE_HEX)


def test_wrong_trace_id_format_keeps_siblings(spark):
    # "WrongTraceIdFormat": trace stays nil, span + flags still parse,
    # and the row is a parse error (drop mode removes it)
    df = spark.createDataFrame(
        [("foo_bar", TRACE_HEX, "01")],
        "trace_id string, span_id string, trace_flags string",
    )
    r = TraceParser()(df).collect()[0]
    assert r.trace_id is None
    assert bytes(r.span_id) == bytes.fromhex(TRACE_HEX)
    assert bytes(r.trace_flags) == b"\x01"
    assert TraceParser(on_error="drop")(df).count() == 0


def test_wrong_trace_flags_format(spark):
    # "WrongTraceFlagFormat"
    df = spark.createDataFrame(
        [(SPAN_HEX, TRACE_HEX, "foo_bar")],
        "trace_id string, span_id string, trace_flags string",
    )
    r = TraceParser()(df).collect()[0]
    assert bytes(r.trace_id) == bytes.fromhex(SPAN_HEX)
    assert bytes(r.span_id) == bytes.fromhex(TRACE_HEX)
    assert r.trace_flags is None
