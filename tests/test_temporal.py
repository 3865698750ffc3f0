"""Temporal operators: as-of join + hypertable rollup.

Semantics pinned here: backward-inclusive as-of matching with an
explicit total order (DuckDB ``ASOF JOIN ON l.ts >= r.ts`` parity,
checked live against the ``duck`` fixture), tolerance windows,
null-time behavior on both sides, multi-grain GROUPING SETS rollup
with grain decoding via grouping_id (never bucket-null coalescing).
Plan guards keep the scale posture honest: no inequality-join
(BroadcastNestedLoopJoin / CartesianProduct) anywhere in the as-of
plan, and the rollup stays a single Expand + partial/final aggregate.
"""

from __future__ import annotations

from datetime import datetime

import pytest
from pyspark.sql import functions as F

from opentelemetry_collector_contrib_spark.operators import (
    hypertable_rollup,
    join_asof,
    join_range,
)

from tests.conftest import assert_frames_equal


def _ts(s: str) -> datetime:
    return datetime.fromisoformat(s)


@pytest.fixture()
def asof_frames(spark):
    left = spark.createDataFrame(
        [
            (1, "a", _ts("2024-01-01 01:00:00"), 10.0),
            (2, "a", _ts("2024-01-01 02:00:00"), 20.0),
            (3, "a", _ts("2024-01-01 00:10:00"), 30.0),  # before any right row
            (4, "b", _ts("2024-01-01 01:30:00"), 40.0),  # key with no timeline
            (5, "a", None, 50.0),  # null ts: matches nothing
        ],
        "event_id long, user_id string, ts timestamp, value double",
    )
    right = spark.createDataFrame(
        [
            ("a", _ts("2024-01-01 00:30:00"), 100, 1.5),
            ("a", _ts("2024-01-01 01:00:00"), 101, 2.5),  # ties left row 1 exactly
            ("a", _ts("2024-01-01 01:45:00"), 102, 3.5),
            ("a", None, 103, 9.9),  # null ts timeline rows never match
        ],
        "user_id string, ts timestamp, event_id long, value double",
    )
    return left, right


def test_asof_backward_inclusive(spark, asof_frames):
    left, right = asof_frames
    out = {
        r["event_id"]: r
        for r in join_asof(left, right, "user_id", "ts", ["event_id", "value"]).collect()
    }
    # exact-ts tie is inclusive: row 1 matches the 01:00:00 timeline row
    assert out[1]["ref_event_id"] == 101 and out[1]["ref_value"] == 2.5
    # most recent at-or-before, not just any earlier row
    assert out[2]["ref_event_id"] == 102
    # left row before every timeline row: unmatched
    assert out[3]["ref_event_id"] is None and out[3]["ref_ts"] is None
    # key with no timeline rows: unmatched
    assert out[4]["ref_event_id"] is None
    # null-ts left row: unmatched (DuckDB: l.ts >= r.ts never true)
    assert out[5]["ref_event_id"] is None
    # left columns pass through untouched
    assert out[2]["value"] == 20.0 and len(out) == 5


def test_asof_tolerance(spark, asof_frames):
    left, right = asof_frames
    out = {
        r["event_id"]: r
        for r in join_asof(
            left, right, "user_id", "ts", ["event_id"], tolerance_seconds=900
        ).collect()
    }
    # row 2 (02:00) matched 01:45 -> 15 min, inside a 15-min tolerance
    assert out[2]["ref_event_id"] == 102
    # row 1 (01:00) matched 01:00 -> 0 s, kept
    assert out[1]["ref_event_id"] == 101
    out5 = {
        r["event_id"]: r
        for r in join_asof(
            left, right, "user_id", "ts", ["event_id"], tolerance_seconds=300
        ).collect()
    }
    # 15 min > 5-min tolerance: match nulled, row kept
    assert out5[2]["ref_event_id"] is None
    assert out5[1]["ref_event_id"] == 101


def test_asof_deterministic_across_partitioning(spark, asof_frames):
    left, right = asof_frames
    a = sorted(
        join_asof(left, right, "user_id", "ts", ["event_id"]).collect(),
        key=lambda r: r["event_id"],
    )
    b = sorted(
        join_asof(
            left.repartition(7), right.repartition(3), "user_id", "ts", ["event_id"]
        ).collect(),
        key=lambda r: r["event_id"],
    )
    assert [tuple(r) for r in a] == [tuple(r) for r in b]


def test_asof_plan_no_inequality_join(spark, asof_frames):
    left, right = asof_frames
    plan = (
        join_asof(left, right, "user_id", "ts", ["event_id"])
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "Window" in plan


def test_asof_oracle_parity(spark, sf_dir, duck):
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    left = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", "value"
    )
    timeline = (
        ev.filter(F.col("event_type") == "click")
        .groupBy("user_id", "ts")
        .agg(
            F.max("event_id").alias("event_id"),
            F.max_by("value", "event_id").alias("value"),
        )
    )
    out = join_asof(left, timeline, "user_id", "ts", ["event_id", "value"])
    rel = duck.sql(
        """
        WITH l AS (SELECT event_id, user_id, ts, value FROM events
                   WHERE event_type = 'purchase'),
        t AS (SELECT user_id, ts, max(event_id) AS event_id,
                     max_by(value, event_id) AS value
              FROM events WHERE event_type = 'click' GROUP BY user_id, ts)
        SELECT l.event_id, l.user_id, l.ts, l.value, t.ts AS ref_ts,
               t.event_id AS ref_event_id, t.value AS ref_value
        FROM l ASOF LEFT JOIN t ON l.user_id = t.user_id AND l.ts >= t.ts
        """
    )
    assert_frames_equal(out, rel)


# ------------------------------------------------------------ range join


@pytest.fixture()
def range_frames(spark):
    facts = spark.createDataFrame(
        [
            (1, "a", _ts("2024-01-01 01:00:00")),  # == start: inclusive
            (2, "a", _ts("2024-01-01 01:30:00")),  # inside
            (3, "a", _ts("2024-01-01 02:00:00")),  # == end: exclusive
            (4, "a", _ts("2024-01-01 05:00:00")),  # inside no window
            (5, "b", _ts("2024-01-01 01:30:00")),  # key without intervals
            (6, "a", _ts("2024-01-03 00:30:00")),  # inside the long window
        ],
        "event_id long, user_id string, ts timestamp",
    )
    intervals = spark.createDataFrame(
        [
            ("a", _ts("2024-01-01 01:00:00"), _ts("2024-01-01 02:00:00"), 10),
            # overlaps the first window: fact 2 matches both
            ("a", _ts("2024-01-01 01:15:00"), _ts("2024-01-01 01:45:00"), 11),
            # degenerate end <= start: matches nothing
            ("a", _ts("2024-01-01 03:00:00"), _ts("2024-01-01 03:00:00"), 12),
            # spans many granularity buckets (2024-01-02 .. 2024-01-04)
            ("a", _ts("2024-01-02 00:00:00"), _ts("2024-01-04 00:00:00"), 13),
        ],
        "user_id string, start_ts timestamp, end_ts timestamp, win_id long",
    )
    return facts, intervals


def test_range_join_containment(spark, range_frames):
    facts, intervals = range_frames
    out = join_range(
        facts, intervals, "user_id", "ts", "start_ts", "end_ts", 3600
    )
    pairs = sorted((r["event_id"], r["win_id"]) for r in out.collect())
    # 1: inclusive start; 2: both overlapping windows; 3: exclusive end;
    # 4/5: no window; 6: the multi-bucket window
    assert pairs == [(1, 10), (2, 10), (2, 11), (6, 13)]
    # fact columns pass through, interval payload columns appended
    assert set(out.columns) == {
        "event_id", "user_id", "ts", "start_ts", "end_ts", "win_id"
    }


def test_range_join_bucket_cap_drops_monster_interval(spark, range_frames):
    facts, intervals = range_frames
    out = join_range(
        facts,
        intervals,
        "user_id",
        "ts",
        "start_ts",
        "end_ts",
        3600,
        max_buckets_per_interval=24,  # the 48h window explodes past this
    )
    pairs = sorted((r["event_id"], r["win_id"]) for r in out.collect())
    assert pairs == [(1, 10), (2, 10), (2, 11)]


def test_range_join_plan_no_inequality_join(spark, range_frames):
    facts, intervals = range_frames
    plan = (
        join_range(facts, intervals, "user_id", "ts", "start_ts", "end_ts", 3600)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_range_join_oracle_parity(spark, sf_dir, duck):
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    facts = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", "value"
    )
    ivs = ev.filter(F.col("event_type") == "signup").select(
        "user_id",
        F.col("ts").alias("start_ts"),
        (F.col("ts") + F.expr("INTERVAL 1 HOUR")).alias("end_ts"),
        F.col("event_id").alias("signup_event_id"),
    )
    out = join_range(facts, ivs, "user_id", "ts", "start_ts", "end_ts", 3600)
    rel = duck.sql(
        """
        WITH f AS (SELECT event_id, user_id, ts, value FROM events
                   WHERE event_type = 'purchase'),
        s AS (SELECT user_id, ts AS start_ts, ts + INTERVAL 1 HOUR AS end_ts,
                     event_id AS signup_event_id
              FROM events WHERE event_type = 'signup')
        SELECT f.event_id, f.user_id, f.ts, f.value,
               s.start_ts, s.end_ts, s.signup_event_id
        FROM f JOIN s ON f.user_id = s.user_id
                     AND f.ts >= s.start_ts AND f.ts < s.end_ts
        """
    )
    assert_frames_equal(out, rel)


# ------------------------------------------------- property tests


from datetime import timedelta

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_SET = settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
_BASE = _ts("2024-01-01 00:00:00")


@given(
    facts=st.lists(
        st.tuples(st.sampled_from("ab"), st.integers(0, 50_000)),
        min_size=1,
        max_size=12,
    ),
    ivs=st.lists(
        st.tuples(
            st.sampled_from("ab"), st.integers(0, 50_000), st.integers(-10, 20_000)
        ),
        min_size=1,
        max_size=8,
    ),
    gran=st.sampled_from([7, 60, 3600]),
)
@_SET
def test_range_join_matches_naive_reference(spark, facts, ivs, gran):
    """join_range == the literal nested-loop containment scan, for any
    bucket granularity (bucket boundaries can't add or lose matches)."""
    fdf = spark.createDataFrame(
        [(i, k, _BASE + timedelta(seconds=o)) for i, (k, o) in enumerate(facts)],
        "event_id long, k string, ts timestamp",
    )
    idf = spark.createDataFrame(
        [
            (j, k, _BASE + timedelta(seconds=s), _BASE + timedelta(seconds=s + ln))
            for j, (k, s, ln) in enumerate(ivs)
        ],
        "win_id long, k string, start_ts timestamp, end_ts timestamp",
    )
    got = sorted(
        (r["event_id"], r["win_id"])
        for r in join_range(fdf, idf, "k", "ts", "start_ts", "end_ts", gran).collect()
    )
    want = sorted(
        (i, j)
        for i, (fk, fo) in enumerate(facts)
        for j, (ik, s, ln) in enumerate(ivs)
        if fk == ik and s <= fo < s + ln
    )
    assert got == want


@given(
    facts=st.lists(
        st.tuples(st.sampled_from("ab"), st.integers(0, 1000)),
        min_size=1,
        max_size=10,
    ),
    timeline=st.lists(
        st.tuples(st.sampled_from("ab"), st.integers(0, 1000)),
        min_size=1,
        max_size=10,
        unique=True,  # one row per (key, ts): the op's documented contract
    ),
)
@_SET
def test_asof_matches_naive_reference(spark, facts, timeline):
    """join_asof == 'the greatest timeline ts <= fact ts per key'."""
    fdf = spark.createDataFrame(
        [(i, k, _BASE + timedelta(seconds=o)) for i, (k, o) in enumerate(facts)],
        "event_id long, k string, ts timestamp",
    )
    tdf = spark.createDataFrame(
        [(k, _BASE + timedelta(seconds=o), 100 + j) for j, (k, o) in enumerate(timeline)],
        "k string, ts timestamp, ref_id long",
    )
    got = {
        r["event_id"]: r["ref_ref_id"]
        for r in join_asof(fdf, tdf, "k", "ts", ["ref_id"]).collect()
    }
    for i, (fk, fo) in enumerate(facts):
        cands = [(o, 100 + j) for j, (k, o) in enumerate(timeline) if k == fk and o <= fo]
        want = max(cands)[1] if cands else None
        assert got[i] == want, (i, fk, fo, cands)


# ---------------------------------------------------------------- rollup


@pytest.fixture()
def rollup_frame(spark):
    return spark.createDataFrame(
        [
            (_ts("2024-01-01 01:10:00"), "click", 1.25),
            (_ts("2024-01-01 01:40:00"), "click", 2.00),
            (_ts("2024-01-01 02:05:00"), "click", 4.00),
            (_ts("2024-01-02 01:10:00"), "view", 8.00),
            (None, "view", 16.00),  # null ts: null bucket per grain
        ],
        "ts timestamp, event_type string, value double",
    )


GRAINS = [("1h", "hour"), ("1d", "day")]
AGGS = lambda: [  # noqa: E731
    F.count(F.lit(1)).alias("n_events"),
    (F.sum(F.round(F.col("value") * 100).cast("bigint")) / F.lit(100.0)).alias(
        "sum_value"
    ),
]


def test_rollup_grains_and_buckets(spark, rollup_frame):
    out = hypertable_rollup(rollup_frame, "ts", GRAINS, ["event_type"], AGGS())
    rows = {
        (r["grain"], r["bucket"], r["event_type"]): (r["n_events"], r["sum_value"])
        for r in out.collect()
    }
    # hourly: two clicks in the 01:00 bucket, one in 02:00
    assert rows[("1h", _ts("2024-01-01 01:00:00"), "click")] == (2, 3.25)
    assert rows[("1h", _ts("2024-01-01 02:00:00"), "click")] == (1, 4.00)
    # daily: all three clicks roll into 2024-01-01
    assert rows[("1d", _ts("2024-01-01 00:00:00"), "click")] == (3, 7.25)
    assert rows[("1d", _ts("2024-01-02 00:00:00"), "view")] == (1, 8.00)
    # null ts contributes a null bucket IN EACH GRAIN (per-grain GROUP BY
    # semantics, not a grouping-set artifact)
    assert rows[("1h", None, "view")] == (1, 16.00)
    assert rows[("1d", None, "view")] == (1, 16.00)
    # 4 hourly groups (3 non-null + null) + 3 daily (2 non-null + null)
    assert len(rows) == 4 + 3


def test_rollup_single_scan_plan(spark, rollup_frame):
    plan = (
        hypertable_rollup(rollup_frame, "ts", GRAINS, ["event_type"], AGGS())
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Expand") == 1  # one scan multiplied, not one scan per grain
    assert "HashAggregate" in plan
    assert "Join" not in plan


def test_rollup_null_dim_is_its_own_group(spark):
    # a null dim value is a real group in every grain (SQL GROUP BY
    # semantics), distinct from any non-null group
    df = spark.createDataFrame(
        [
            (_ts("2024-01-01 01:10:00"), None, 1.0),
            (_ts("2024-01-01 01:20:00"), None, 2.0),
            (_ts("2024-01-01 01:30:00"), "click", 4.0),
        ],
        "ts timestamp, event_type string, value double",
    )
    out = hypertable_rollup(df, "ts", GRAINS, ["event_type"], AGGS())
    rows = {
        (r["grain"], r["event_type"]): r["n_events"] for r in out.collect()
    }
    assert rows[("1h", None)] == 2 and rows[("1h", "click")] == 1
    assert rows[("1d", None)] == 2 and rows[("1d", "click")] == 1


def test_rollup_oracle_parity(spark, sf_dir, duck):
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    out = hypertable_rollup(ev, "ts", GRAINS, ["event_type"], AGGS())
    rel = duck.sql(
        """
        WITH b AS (SELECT event_type, value, date_trunc('hour', ts) AS b1h,
                          date_trunc('day', ts) AS b1d FROM events)
        SELECT '1h' AS grain, b1h AS bucket, event_type,
               count(*)::BIGINT AS n_events,
               (sum(CAST(round(value * 100, 0) AS BIGINT)) / 100.0)::DOUBLE AS sum_value
        FROM b GROUP BY b1h, event_type
        UNION ALL
        SELECT '1d', b1d, event_type, count(*)::BIGINT,
               (sum(CAST(round(value * 100, 0) AS BIGINT)) / 100.0)::DOUBLE
        FROM b GROUP BY b1d, event_type
        """
    )
    assert_frames_equal(out, rel)


def test_asof_null_key_never_matches(spark):
    # SQL's l.key = r.key is never true for null, but a window
    # partitionBy groups null WITH null — the operator must drop
    # null-key timeline rows so a null-key fact gets null refs
    from opentelemetry_collector_contrib_spark.operators import join_asof

    left = spark.createDataFrame(
        [
            (1, None, _ts("2024-01-01 02:00:00"), 1.0),
            (2, "a", _ts("2024-01-01 02:00:00"), 2.0),
        ],
        "event_id long, user_id string, ts timestamp, value double",
    )
    right = spark.createDataFrame(
        [
            (None, _ts("2024-01-01 01:00:00"), 900, 9.0),
            ("a", _ts("2024-01-01 01:00:00"), 100, 1.5),
        ],
        "user_id string, ts timestamp, event_id long, value double",
    )
    out = {
        r.event_id: r.ref_event_id
        for r in join_asof(
            left, right, "user_id", "ts", ["event_id", "value"]
        ).collect()
    }
    assert out[1] is None  # null-key fact: no match, row preserved
    assert out[2] == 100
