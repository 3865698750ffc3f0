"""Tail-sampling policy goldens from the reference's own test tables.

Transcribed verbatim from
processor/tailsamplingprocessor/internal/sampling/:
- string_tag_filter_test.go TestStringTagFilter (all 27 cases)
- span_count_sampler_test.go (min-only 3,0 / max-only 0,20 /
  min+max 3,20 tables)
- numeric_tag_filter_test.go semantics (range + invert)
- trace_state_filter_test.go semantics
- and_test.go (4 decision cases)
- rate_limiting_test.go TestRateLimiter
- composite_test.go TestCompositeEvaluatorThrottling /
  2SubpolicyThrottling

Each Go case evaluates one policy over one in-memory trace and asserts
a Decision enum; here the trace is rows sharing a conv_id and the
decision code comes from TailSampling.decisions().
"""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from opentelemetry_collector_contrib_spark.processors import TailPolicy, TailSampling
from opentelemetry_collector_contrib_spark.processors.tail_sampling import (
    INVERT_NOT_SAMPLED,
    INVERT_SAMPLED,
    NOT_SAMPLED,
    SAMPLED,
)

T0 = dt.datetime(2024, 1, 1, 0, 0, 0)


def _decide(spark, policy: TailPolicy, rows, schema):
    df = spark.createDataFrame(rows, schema)
    dec = TailSampling(policies=[policy]).decisions(df).collect()
    assert len(dec) == 1
    return dec[0][f"policy_{policy.name}"]


# --- string_tag_filter_test.go TestStringTagFilter --------------------
# (attrs, cfg(values, regex, invert), expected) — "node attribute" and
# "span attribute" collapse to the same flattened attributes map
STRING_CASES = [
    ("nonmatching key", {"non_matching": "value"}, ["value"], False, False, NOT_SAMPLED),
    ("nonmatching value", {"example": "non_matching"}, ["value"], False, False, NOT_SAMPLED),
    ("matching", {"example": "value"}, ["value"], False, False, SAMPLED),
    ("matching regex", {"example": "grpc.health.v1.HealthCheck"}, ["v[0-9]+.HealthCheck$"], True, False, SAMPLED),
    ("nonmatching regex", {"example": "grpc.health.v1.HealthCheck"}, ["v[a-z]+.HealthCheck$"], True, False, NOT_SAMPLED),
    ("plain text in regex", {"example": "value"}, ["value"], True, False, SAMPLED),
    ("empty filter list", {"example": "grpc.health.v1.HealthCheck"}, [], True, False, NOT_SAMPLED),
    ("invert nonmatching key", {"non_matching": "value"}, ["value"], False, True, INVERT_SAMPLED),
    ("invert nonmatching value", {"example": "non_matching"}, ["value"], False, True, INVERT_SAMPLED),
    ("invert nonmatching list", {"example": "non_matching"}, ["first_value", "value", "last_value"], False, True, INVERT_SAMPLED),
    ("invert matching", {"example": "value"}, ["value"], False, True, INVERT_NOT_SAMPLED),
    ("invert matching list", {"example": "value"}, ["first_value", "value", "last_value"], False, True, INVERT_NOT_SAMPLED),
    ("invert matching regex", {"example": "grpc.health.v1.HealthCheck"}, ["v[0-9]+.HealthCheck$"], True, True, INVERT_NOT_SAMPLED),
    ("invert matching regex list", {"example": "grpc.health.v1.HealthCheck"}, ["^http", "v[0-9]+.HealthCheck$", "metrics$"], True, True, INVERT_NOT_SAMPLED),
    ("invert nonmatching regex", {"example": "grpc.health.v1.HealthCheck"}, ["v[a-z]+.HealthCheck$"], True, True, INVERT_SAMPLED),
    ("invert nonmatching regex list", {"example": "grpc.health.v1.HealthCheck"}, ["^http", "v[a-z]+.HealthCheck$", "metrics$"], True, True, INVERT_SAMPLED),
    ("invert plain text in regex", {"example": "value"}, ["value"], True, True, INVERT_NOT_SAMPLED),
    ("invert empty filter list", {"example": "grpc.health.v1.HealthCheck"}, [], True, True, INVERT_SAMPLED),
]


@pytest.mark.parametrize(
    "name,attrs,values,regex,invert,expected",
    STRING_CASES,
    ids=[c[0] for c in STRING_CASES],
)
def test_string_tag_filter(spark, name, attrs, values, regex, invert, expected):
    p = TailPolicy(
        "sa", "string_attribute", key="example", values=values,
        enabled_regex_matching=regex, invert_match=invert,
    )
    got = _decide(
        spark, p, [("t1", 0, attrs, T0)],
        "conv_id string, turn_idx int, attributes map<string,string>, ts timestamp",
    )
    assert got == expected


# --- span_count_sampler_test.go ---------------------------------------
SPAN_COUNT_CASES = [
    # (min, max, n_spans, expected) — batch totals; the reference's
    # "across multiple batches" cases sum to the same totals
    (3, 0, 1, NOT_SAMPLED),
    (3, 0, 3, SAMPLED),
    (3, 0, 4, SAMPLED),
    (3, 0, 2, NOT_SAMPLED),
    (3, 0, 6, SAMPLED),
    (0, 20, 21, NOT_SAMPLED),
    (0, 20, 20, SAMPLED),
    (0, 20, 19, SAMPLED),
    (3, 20, 2, NOT_SAMPLED),
    (3, 20, 21, NOT_SAMPLED),
    (3, 20, 10, SAMPLED),
    (3, 20, 3, SAMPLED),
    (3, 20, 20, SAMPLED),
]


@pytest.mark.parametrize("mn,mx,n,expected", SPAN_COUNT_CASES)
def test_span_count(spark, mn, mx, n, expected):
    p = TailPolicy("sc", "span_count", min_spans=mn, max_spans=mx)
    rows = [("t1", i, T0) for i in range(n)]
    got = _decide(spark, p, rows, "conv_id string, turn_idx int, ts timestamp")
    assert got == expected


# --- numeric_tag_filter_test.go semantics -----------------------------
NUMERIC_CASES = [
    ({"example": "50"}, False, SAMPLED),      # in range
    ({"example": "500"}, False, NOT_SAMPLED),  # above max
    ({"other": "50"}, False, NOT_SAMPLED),     # key missing
    ({"example": "50"}, True, NOT_SAMPLED),    # invert: in range
    ({"example": "500"}, True, SAMPLED),       # invert: out of range
    ({"other": "50"}, True, SAMPLED),          # invert: key missing
]


@pytest.mark.parametrize("attrs,invert,expected", NUMERIC_CASES)
def test_numeric_tag_filter(spark, attrs, invert, expected):
    p = TailPolicy(
        "na", "numeric_attribute", key="example",
        min_value=0, max_value=100, invert_match=invert,
    )
    got = _decide(
        spark, p, [("t1", 0, attrs, T0)],
        "conv_id string, turn_idx int, attributes map<string,string>, ts timestamp",
    )
    assert got == expected


# --- trace_state_filter_test.go semantics -----------------------------
TRACE_STATE_CASES = [
    ("key=value", ["value"], SAMPLED),
    ("key=other", ["value"], NOT_SAMPLED),
    ("other=value", ["value"], NOT_SAMPLED),
    ("key=value,second=x", ["value"], SAMPLED),
    ("key=value", [""], NOT_SAMPLED),       # empty values dropped
    ("key=" + "v" * 300, ["v" * 300], NOT_SAMPLED),  # 256-char k=v cap
]


@pytest.mark.parametrize("state,values,expected", TRACE_STATE_CASES)
def test_trace_state_filter(spark, state, values, expected):
    p = TailPolicy("ts", "trace_state", key="key", values=values)
    got = _decide(
        spark, p, [("t1", 0, state, T0)],
        "conv_id string, turn_idx int, trace_state string, ts timestamp",
    )
    assert got == expected


# --- and_test.go -------------------------------------------------------
def _and_policy(values, invert):
    return TailPolicy(
        "and", "and",
        sub_policies=[
            TailPolicy("n1", "string_attribute", key="attribute_name",
                       values=values, invert_match=invert),
            TailPolicy("n2", "status_code", status_codes=["ERROR"]),
        ],
    )


AND_SCHEMA = (
    "conv_id string, turn_idx int, attributes map<string,string>, "
    "status_code string, ts timestamp"
)


def test_and_not_sampled(spark):
    # span has ERROR status but no matching attribute -> NotSampled
    p = TailPolicy(
        "and", "and",
        sub_policies=[
            TailPolicy("n1", "string_attribute", key="name", values=["value"]),
            TailPolicy("n2", "status_code", status_codes=["ERROR"]),
        ],
    )
    got = _decide(spark, p, [("t1", 0, {}, "ERROR", T0)], AND_SCHEMA)
    assert got == NOT_SAMPLED


def test_and_sampled(spark):
    p = _and_policy(["attribute_value"], invert=False)
    got = _decide(
        spark, p,
        [("t1", 0, {"attribute_name": "attribute_value"}, "ERROR", T0)],
        AND_SCHEMA,
    )
    assert got == SAMPLED


def test_and_string_invert_sampled(spark):
    # inverted no_match filter votes InvertSampled -> not blocking
    p = _and_policy(["no_match"], invert=True)
    got = _decide(
        spark, p,
        [("t1", 0, {"attribute_name": "attribute_value"}, "ERROR", T0)],
        AND_SCHEMA,
    )
    assert got == SAMPLED


def test_and_string_invert_not_sampled(spark):
    p = _and_policy(["attribute_value"], invert=True)
    got = _decide(
        spark, p,
        [("t1", 0, {"attribute_name": "attribute_value"}, "ERROR", T0)],
        AND_SCHEMA,
    )
    assert got == INVERT_NOT_SAMPLED


# --- rate_limiting_test.go TestRateLimiter ----------------------------
def test_rate_limiter(spark):
    # spans_per_second=3: a 10-span trace and a 3-span trace are
    # NotSampled (not strictly below), 2-span and 0-span... a 2-span
    # trace fits. Event-time seconds separate the traces so each gets a
    # fresh budget window, mirroring one Evaluate call per second.
    rows = []
    for sec, n in [(0, 10), (1, 3), (2, 2)]:
        t = T0 + dt.timedelta(seconds=sec)
        rows += [(f"t{sec}", i, t) for i in range(n)]
    df = spark.createDataFrame(rows, "conv_id string, turn_idx int, ts timestamp")
    ts = TailSampling(
        policies=[TailPolicy("rl", "rate_limiting", spans_per_second=3)]
    )
    dec = {r["conv_id"]: r["policy_rl"] for r in ts.decisions(df).collect()}
    assert dec == {"t0": NOT_SAMPLED, "t1": NOT_SAMPLED, "t2": SAMPLED}
    # keep path drops whole traces accordingly
    assert ts(df).count() == 2


def test_rate_limiter_budget_within_second(spark):
    # three 1-span traces in ONE second with budget 3: greedy strict-<
    # admits the first two (1, then 2 < 3), rejects the third
    rows = [(f"t{i}", 0, T0) for i in range(3)]
    df = spark.createDataFrame(rows, "conv_id string, turn_idx int, ts timestamp")
    ts = TailSampling(
        policies=[TailPolicy("rl", "rate_limiting", spans_per_second=3)]
    )
    dec = ts.decisions(df)
    assert dec.filter("sampled").count() == 2


# --- composite_test.go -------------------------------------------------
def test_composite_throttling(spark):
    # one always-sample sub with allocation 10 = total: 20 one-span
    # traces in second 0 -> first 10 sampled; 10 more in second 1 ->
    # sampled again (budget resets per second)
    rows = []
    for i in range(20):
        rows.append((f"s0-{i:02d}", 0, T0))
    for i in range(10):
        rows.append((f"s1-{i:02d}", 0, T0 + dt.timedelta(seconds=1)))
    df = spark.createDataFrame(rows, "conv_id string, turn_idx int, ts timestamp")
    p = TailPolicy(
        "comp", "composite", max_total_spans_per_second=10,
        sub_policies=[TailPolicy("always", "always", spans_per_second=10)],
    )
    ts = TailSampling(policies=[p])
    dec = ts.decisions(df)
    assert dec.filter("sampled").count() == 20  # 10 in s0 + 10 in s1
    s0 = dec.filter(F.col("conv_id").startswith("s0")).filter("sampled").count()
    assert s0 == 10


def test_composite_two_subpolicy_throttling(spark):
    # numeric sub (alloc 5) + always sub (alloc 5), total 10: 5 traces
    # matching the numeric filter claim its budget; 5 more claimed by
    # always; the rest NotSampled
    rows = []
    for i in range(5):
        rows.append((f"num-{i}", 0, {"tag": "50"}, T0))
    for i in range(10):
        rows.append((f"plain-{i}", 0, {}, T0))
    df = spark.createDataFrame(
        rows,
        "conv_id string, turn_idx int, attributes map<string,string>, ts timestamp",
    )
    p = TailPolicy(
        "comp", "composite", max_total_spans_per_second=10,
        sub_policies=[
            TailPolicy("num", "numeric_attribute", key="tag",
                       min_value=0, max_value=100, spans_per_second=5),
            TailPolicy("always", "always", spans_per_second=5),
        ],
    )
    dec = TailSampling(policies=[p]).decisions(df)
    assert dec.filter("sampled").count() == 10
    # all 5 numeric-matching traces fit their 5-span allocation
    assert (
        dec.filter(F.col("conv_id").startswith("num")).filter("sampled").count()
        == 5
    )


# --- decision combination (processor.go:287-326) ----------------------
def test_invert_not_sampled_vetoes_sampled(spark):
    rows = [("t1", 0, {"example": "value"}, T0)]
    df = spark.createDataFrame(
        rows,
        "conv_id string, turn_idx int, attributes map<string,string>, ts timestamp",
    )
    ts = TailSampling(
        policies=[
            TailPolicy("keep", "always"),
            TailPolicy("inv", "string_attribute", key="example",
                       values=["value"], invert_match=True),
        ]
    )
    assert ts(df).count() == 0  # InvertNotSampled wins over Sampled


def test_invert_sampled_blocked_by_not_sampled(spark):
    rows = [("t1", 0, {"example": "other"}, T0)]
    df = spark.createDataFrame(
        rows,
        "conv_id string, turn_idx int, attributes map<string,string>, ts timestamp",
    )
    # inverted filter votes InvertSampled; latency policy votes
    # NotSampled -> InvertSampled promotion is blocked
    ts = TailSampling(
        policies=[
            TailPolicy("inv", "string_attribute", key="example",
                       values=["value"], invert_match=True),
            TailPolicy("slow", "latency", threshold_ms=10_000_000),
        ]
    )
    assert ts(df).count() == 0
    # without the NotSampled vote, InvertSampled keeps the trace
    ts2 = TailSampling(
        policies=[
            TailPolicy("inv", "string_attribute", key="example",
                       values=["value"], invert_match=True),
        ]
    )
    assert ts2(df).count() == 1


def test_ottl_condition_policy(spark):
    rows = [("t1", 0, "bash", T0), ("t2", 0, "none", T0)]
    df = spark.createDataFrame(rows, "conv_id string, turn_idx int, tool string, ts timestamp")
    ts = TailSampling(
        policies=[
            TailPolicy("ottl", "ottl_condition",
                       ottl_conditions=['tool == "bash"'])
        ]
    )
    kept = {r["conv_id"] for r in ts(df).collect()}
    assert kept == {"t1"}


def test_window_path_single_shuffle(spark):
    # predicate-only policies must keep the one-scan window plan:
    # exactly ONE shuffle exchange, no join
    rows = [("t1", 0, "bash", T0), ("t2", 0, "none", T0)]
    df = spark.createDataFrame(rows, "conv_id string, turn_idx int, tool string, ts timestamp")
    ts = TailSampling(
        policies=[
            TailPolicy("slow", "latency", threshold_ms=1),
            TailPolicy("sc", "span_count", min_spans=1),
        ]
    )
    plan = ts(df)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1
    assert "Join" not in plan


def test_greedy_admit_matches_sequential_reference():
    """_greedy_admit (cumsum prefix + scalar tail) == the plain
    sequential loop for random span sequences, both comparison modes;
    a rejected trace must not consume budget (rate_limiting.go:38)."""
    import numpy as np

    from opentelemetry_collector_contrib_spark.processors.tail_sampling import (
        _greedy_admit,
    )

    rng = np.random.default_rng(7)
    for strict in (True, False):
        for cap in (0, 1, 7, 50, 10**6):
            for _ in range(20):
                spans = rng.integers(1, 12, size=rng.integers(1, 60))
                counted, want = 0, []
                for sc in spans:
                    c = counted + int(sc)
                    if (c < cap) if strict else (c <= cap):
                        counted = c
                        want.append(True)
                    else:
                        want.append(False)
                got = _greedy_admit(spans, cap, strict=strict)
                assert list(got) == want, (strict, cap, list(spans))
