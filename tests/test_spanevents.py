"""OTTL span-event context: transform + filter over nested span events.

Reference: pkg/ottl/contexts/ottlspanevent/span_events.go parsePath
(event name/time/attributes + span.* / resource.* namespaces) driven
through the transformprocessor (context: spanevent) and
filterprocessor (traces.spanevent) shapes.
"""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from opentelemetry_collector_contrib_spark.processors.spanevents import (
    SpanEventFilter,
    SpanEventTransform,
)

TS = dt.datetime(2024, 1, 1, 12, 0, 0)
SCHEMA = (
    "trace_id string, span_id string, span_name string, span_kind string, "
    "status_code string, attributes map<string,string>, "
    "events array<struct<name:string, ts:timestamp, "
    "attributes:map<string,string>>>"
)


@pytest.fixture(scope="module")
def spans(spark):
    rows = [
        (
            "t1", "s1", "turn-user", "SPAN_KIND_CLIENT", "STATUS_CODE_OK",
            {"turn": "1"},
            [
                ("exception", TS, {"exception.type": "E1"}),
                ("checkpoint", TS, {"k": "v"}),
            ],
        ),
        (
            "t1", "s2", "turn-tool", "SPAN_KIND_SERVER", "STATUS_CODE_ERROR",
            {"turn": "2"},
            [("checkpoint", TS, {"k": "v"})],
        ),
        # span with NO events must survive regroup with an empty array
        ("t2", "s3", "turn-sys", "SPAN_KIND_INTERNAL", "STATUS_CODE_OK",
         {"turn": "3"}, []),
    ]
    return spark.createDataFrame(rows, SCHEMA)


def _events(df, tid, sid):
    r = df.filter(
        (F.col("trace_id") == tid) & (F.col("span_id") == sid)
    ).collect()[0]
    return r["events"]


def test_spanevent_set_from_span_namespace(spans):
    # span.* delegates to the enclosing span (internal/span.go
    # SpanPathGetSetter) — stamp the span name onto each event
    out = SpanEventTransform(
        ['set(attributes["parent"], span.name)']
    )(spans)
    evs = _events(out, "t1", "s1")
    assert [e["attributes"]["parent"] for e in evs] == [
        "turn-user", "turn-user",
    ]
    # span-level columns untouched
    assert out.filter(F.col("span_id") == "s1").collect()[0]["span_name"] == "turn-user"


def test_spanevent_guarded_statement_and_order(spans):
    out = SpanEventTransform(
        ['set(name, "exception.renamed") where name == "exception"']
    )(spans)
    evs = _events(out, "t1", "s1")
    # order preserved: exception first, checkpoint second
    assert [e["name"] for e in evs] == ["exception.renamed", "checkpoint"]
    assert [e["name"] for e in _events(out, "t1", "s2")] == ["checkpoint"]


def test_spanevent_status_namespace(spans):
    out = SpanEventTransform(
        ['set(attributes["code"], span.status.code)']
    )(spans)
    assert _events(out, "t1", "s2")[0]["attributes"]["code"] == (
        "STATUS_CODE_ERROR"
    )


def test_spanevent_empty_span_kept(spans):
    out = SpanEventTransform(['set(attributes["x"], "y")'])(spans)
    assert out.count() == 3
    assert _events(out, "t2", "s3") == []


def test_spanevent_filter_drops_matching_events(spans):
    out = SpanEventFilter(['name == "checkpoint"'])(spans)
    assert [e["name"] for e in _events(out, "t1", "s1")] == ["exception"]
    # span whose ONLY event matched keeps the span with an empty array
    assert _events(out, "t1", "s2") == []
    assert out.count() == 3


def test_spanevent_filter_no_conditions_identity(spans):
    out = SpanEventFilter([])(spans)
    got = {
        (r["trace_id"], r["span_id"]): [e["name"] for e in r["events"]]
        for r in out.collect()
    }
    assert got[("t1", "s1")] == ["exception", "checkpoint"]
    assert got[("t2", "s3")] == []


def test_spanevent_plan_no_python(spans):
    out = SpanEventTransform(['set(attributes["p"], span.name)'])(spans)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEval" not in plan
