"""Verbatim port of the exceptions connector's reference tests.

Reference: connector/exceptionsconnector/connector_test.go:45-113
(buildSampleTrace: service-a server+client error spans, service-b
server error span, one ``exception`` event each, trace/span id 0x2a),
connector_metrics_test.go:41-246 (the 11-dimension config, cumulative
double consumption, wantDimensions, notInSpanAttrName1 exclusion,
exemplars) and connector_logs_test.go + testdata/logs.yml (one ERROR
log per exception event carrying span attrs + reserved keys + dims +
stacktrace).

pdata typed attribute values flatten to their canonical string forms in
the columnar map<string,string> frame (int 99 -> '99', double 99.99 ->
'99.99', bool -> 'true', empty value -> '', empty map/slice -> '{}' /
'[]') — the dimension-resolution ORDER under test (span attrs beat
event attrs beat defaults; present-but-empty beats the default,
connector.go:50-62) is representation-independent.
"""

from __future__ import annotations

import pytest

from opentelemetry_collector_contrib_spark.connectors import (
    ExcDimension,
    ExceptionsConnector,
)

TRACE_ID = "2a000000000000000000000000000000"
SPAN_ID = "2a00000000000000"

# initSpan attrs (connector_test.go:90-101), string-flattened
SPAN_ATTRS = {
    "stringAttrName": "stringAttrValue",
    "intAttrName": "99",
    "doubleAttrName": "99.99",
    "boolAttrName": "true",
    "nullAttrName": "",
    "mapAttrName": "{}",
    "arrayAttrName": "[]",
}
EXC_ATTRS = {
    "exception.type": "Exception",
    "exception.message": "Exception message",
    "exception.stacktrace": "Exception stacktrace",
}

# buildSampleTrace spans: (service, name, kind, status)
SAMPLE_SPANS = [
    ("service-a", "svc-a-ep1", "SPAN_KIND_SERVER", "STATUS_CODE_ERROR"),
    ("service-a", "svc-a-ep2", "SPAN_KIND_CLIENT", "STATUS_CODE_ERROR"),
    ("service-b", "svc-b-ep1", "SPAN_KIND_SERVER", "STATUS_CODE_ERROR"),
]

SCHEMA = (
    "trace_id string, span_id string, service_name string, "
    "span_name string, span_kind string, status_code string, "
    "attributes map<string,string>, "
    "events array<struct<name string, ts timestamp, "
    "attributes map<string,string>>>"
)


@pytest.fixture(scope="module")
def sample_trace(spark):
    rows = [
        (TRACE_ID, SPAN_ID, svc, name, kind, status, SPAN_ATTRS,
         [{"name": "exception", "ts": None, "attributes": EXC_ATTRS}])
        for svc, name, kind, status in SAMPLE_SPANS
    ]
    return spark.createDataFrame(rows, SCHEMA)


def _test_connector() -> ExceptionsConnector:
    # newTestMetricsConnector's dimension table verbatim
    # (connector_metrics_test.go:126-151)
    return ExceptionsConnector(
        dimensions=[
            ExcDimension("stringAttrName"),
            ExcDimension("intAttrName"),
            ExcDimension("doubleAttrName"),
            ExcDimension("boolAttrName"),
            ExcDimension("mapAttrName"),
            ExcDimension("arrayAttrName"),
            ExcDimension("nullAttrName", default="defaultNullValue"),
            ExcDimension("shouldBeInMetric", default="defaultNotInSpanAttrVal"),
            ExcDimension("shouldNotBeInMetric"),
            ExcDimension("exception.type"),
            ExcDimension("exception.message"),
        ],
        exemplars=True,
    )


# verifyMetricLabels wantDimensions (string-flattened)
WANT_DIMENSIONS = {
    "stringAttrName": "stringAttrValue",
    "intAttrName": "99",
    "doubleAttrName": "99.99",
    "boolAttrName": "true",
    "nullAttrName": "",          # present-but-empty beats the default
    "arrayAttrName": "[]",
    "mapAttrName": "{}",
    "shouldBeInMetric": "defaultNotInSpanAttrVal",
    "exception_type": "Exception",
    "exception_message": "Exception message",
}


def test_single_consumption_three_spans(sample_trace):
    """verifyConsumeMetricsInputCumulative: 3 dps, one per span, each 1."""
    out = _test_connector().metrics(sample_trace).collect()
    assert len(out) == 3
    seen = set()
    for r in out:
        assert r["count"] == 1
        for key, want in WANT_DIMENSIONS.items():
            got = r[key.replace(".", "_").replace("Name", "Name")]
            assert got == want, (key, got)
        # "Leave the default value unset to test that this dimension
        # should not be added to the metric" — columnar twin: null
        assert r["shouldNotBeInMetric"] is None
        mid = (r.service_name, r.span_name, r.span_kind, r.status_code)
        assert mid not in seen, "Service/kind should be a unique metric"
        seen.add(mid)
        # exemplars: one (trace, span) sample per dp
        assert [(e.trace_id, e.span_id) for e in r.exemplars] == [
            (TRACE_ID, SPAN_ID)
        ]
    assert {(s, n) for s, n, _, _ in SAMPLE_SPANS} == {
        (r[0], r[1]) for r in seen
    }


def test_two_consumptions_accumulate(sample_trace):
    """verifyMultipleCumulativeConsumptions: the cumulative value after
    N consumptions is N per dp (our batch twin: union of N batches)."""
    both = sample_trace.unionByName(sample_trace)
    out = _test_connector().metrics(both).collect()
    assert len(out) == 3
    assert all(r["count"] == 2 for r in out)


def test_logs_golden(sample_trace):
    """testdata/logs.yml: one severity-17 ERROR record per exception
    event, carrying span attrs, reserved keys, dims, and stacktrace."""
    conn = ExceptionsConnector()  # default dims: exception.type/message
    logs = {r.span_name: r for r in conn.logs(sample_trace).collect()}
    assert set(logs) == {"svc-a-ep1", "svc-a-ep2", "svc-b-ep1"}
    r = logs["svc-a-ep1"]
    assert r.severity_number == 17 and r.severity_text == "ERROR"
    assert r.trace_id == TRACE_ID and r.span_id == SPAN_ID
    assert r.service_name == "service-a"
    assert r.span_kind == "SPAN_KIND_SERVER"
    assert r.status_code == "STATUS_CODE_ERROR"
    assert r.exception_type == "Exception"
    assert r.exception_message == "Exception message"
    assert r.exception_stacktrace == "Exception stacktrace"
    assert dict(r.span_attributes) == SPAN_ATTRS


def test_bad_sample_trace_no_exception(spark):
    """buildBadSampleTrace / verifyBadMetricsOkay: a trace with zeroed
    timestamps still counts (the connector never crashes on it)."""
    rows = [
        (TRACE_ID, SPAN_ID, svc, name, kind, status, SPAN_ATTRS,
         [{"name": "exception", "ts": None, "attributes": EXC_ATTRS}])
        for svc, name, kind, status in SAMPLE_SPANS
    ]
    df = spark.createDataFrame(rows, SCHEMA)
    out = _test_connector().metrics(df).collect()
    assert len(out) == 3
