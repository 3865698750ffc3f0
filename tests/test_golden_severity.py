"""Verbatim port of the severity parser's reference test table.

Reference: pkg/stanza/operator/parser/severity/parser_test.go:29-253
(TestSeverityParser — 28 cases over helper/severity_builder.go mapping
expansion: alias strings, ints, lists, {min,max} ranges incl. reversed
bounds, HTTP Nxx buckets, case-insensitive keys and values, empty-
string aliases, and the 'none' preset). Samples arrive as strings in
the columnar frame (the reference stringifies ints/bytes the same way,
severity_builder.go validateValue).
"""

from __future__ import annotations

import pytest

from opentelemetry_collector_contrib_spark.operators.parsers import SeverityParser

# entry.Severity numbers (entry/severity.go)
DEFAULT, TRACE2, INFO, ERROR, FATAL2 = 0, 2, 9, 17, 22

ALL_THE_THINGS = {
    "info": "3xx",
    "error3": "4xx",
    "debug4": "5xx",
    "trace2": ["ttttttracer", "ddd", {"min": 1111, "max": 1234}],
    "fatal2": "",
}

# (name, sample, mapping, preset, expected severity number)
CASES = [
    ("unknown", "blah", None, "default", DEFAULT),
    ("error", "error", None, "default", ERROR),
    ("error-capitalized", "Error", None, "default", ERROR),
    ("error-all-caps", "ERROR", None, "default", ERROR),
    ("custom-string", "NOOOOOOO", {"error": "NOOOOOOO"}, "default", ERROR),
    ("custom-int", "1234", {"error": 1234}, "default", ERROR),
    ("mixed-list-string", "ThiS Is BaD",
     {"error": ["NOOOOOOO", "this is bad", 1234]}, "default", ERROR),
    ("mixed-list-int", "1234",
     {"error": ["NOOOOOOO", "this is bad", 1234]}, "default", ERROR),
    ("in-range", "123", {"error": {"min": 120, "max": 125}}, "default", ERROR),
    ("in-range-min", "120", {"error": {"min": 120, "max": 125}}, "default", ERROR),
    ("in-range-max", "125", {"error": {"min": 120, "max": 125}}, "default", ERROR),
    ("out-of-range-min-minus", "119",
     {"error": {"min": 120, "max": 125}}, "default", DEFAULT),
    ("out-of-range-max-plus", "126",
     {"error": {"min": 120, "max": 125}}, "default", DEFAULT),
    ("range-out-of-order", "123",
     {"error": {"min": 125, "max": 120}}, "default", ERROR),
    ("Http2xx-hit", "201", {"error": "2xx"}, "default", ERROR),
    ("Http2xx-miss", "301", {"error": "2xx"}, "default", DEFAULT),
    ("Http3xx-hit", "301", {"error": "3xx"}, "default", ERROR),
    ("Http4xx-hit", "404", {"error": "4xx"}, "default", ERROR),
    ("Http5xx-hit", "555", {"error": "5xx"}, "default", ERROR),
    ("Http-All", "301",
     {"debug": "2xx", "info": "3xx", "error": "4xx", "warn": "5xx"},
     "default", INFO),
    ("all-the-things-midrange", "1234", ALL_THE_THINGS, "default", TRACE2),
    ("all-the-things-bytes", "ddd", ALL_THE_THINGS, "default", TRACE2),
    ("all-the-things-empty", "", ALL_THE_THINGS, "default", FATAL2),
    ("all-the-things-3xx", "399", ALL_THE_THINGS, "default", INFO),
    ("all-the-things-miss", "miss", ALL_THE_THINGS, "default", DEFAULT),
    ("base-mapping-none", "error", None, "none", DEFAULT),
]


@pytest.mark.parametrize("name,sample,mapping,preset,expected", CASES,
                         ids=[c[0] for c in CASES])
def test_severity_reference_case(spark, name, sample, mapping, preset, expected):
    df = spark.createDataFrame([(sample,)], "sev string")
    parser = SeverityParser(
        parse_from="sev", stanza_mapping=mapping, preset=preset
    )
    row = parser(df).collect()[0]
    assert row["severity_number"] == expected, name
    # non-root twin: same value behind a different field
    df2 = spark.createDataFrame([(sample, "x")], "sev string, other string")
    row2 = SeverityParser(
        parse_from="sev", stanza_mapping=mapping, preset=preset
    )(df2).collect()[0]
    assert row2["severity_number"] == expected, (name, "non-root")


def test_custom_key_capitalized():
    # "custom-string-caps-key": mapping keys are lowercased severity
    # names; 'ErRoR' is not a valid severity name in our strict
    # expansion — the reference lowercases it in the builder
    from opentelemetry_collector_contrib_spark.operators.parsers import (
        expand_stanza_severity_mapping,
    )

    assert expand_stanza_severity_mapping({"ErRoR": "NOOOOOOO"}) == {
        "NOOOOOOO": "error"
    }


def test_unknown_preset_rejected():
    with pytest.raises(ValueError):
        SeverityParser(preset="nope")
