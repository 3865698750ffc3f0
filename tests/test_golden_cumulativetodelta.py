"""Golden port of the reference cumulativetodelta processor tests.

Case tables transcribed from
processor/cumulativetodeltaprocessor/processor_test.go:57-441
(sum cases) and the histogram cases in the same table. Each input
metric's datapoints become one row per point, ordered by ``ts``; the
expected output lists the surviving datapoint values per metric (the
reference's generateTestSumMetrics/generateTestHistogramMetrics pairs).

Flags: ``nv`` marks pmetric's WithNoRecordedValue(true) points.
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from opentelemetry_collector_contrib_spark.processors.metrics_state import (
    CumulativeToDelta,
    CumulativeToDeltaHistogram,
)

NAN = float("nan")


def _sum_frame(spark, metrics):
    """metrics: {name: (values, monotonic, flags_or_None)}"""
    rows = []
    for name, (values, monotonic, flags) in metrics.items():
        for i, v in enumerate(values):
            rows.append(
                Row(
                    metric=name,
                    ts=i,
                    value=float(v),
                    monotonic=monotonic,
                    novalue=bool(flags[i]) if flags else False,
                )
            )
    return spark.createDataFrame(rows)


def _collect_sums(df):
    out = {}
    for r in df.orderBy("metric", "ts").collect():
        out.setdefault(r["metric"], []).append(r["delta"])
    return out


def _assert_values(got, expected):
    assert set(got) == set(expected)
    for name, vals in expected.items():
        g = got[name]
        assert len(g) == len(vals), f"{name}: {g} vs {vals}"
        for a, b in zip(g, vals):
            if isinstance(b, float) and math.isnan(b):
                assert math.isnan(a), f"{name}: {g} vs {vals}"
            else:
                assert a == pytest.approx(b), f"{name}: {g} vs {vals}"


# (name, include(list, match), exclude(list, match),
#  in {metric: (values, monotonic, flags)}, expected {metric: [values]})
SUM_CASES = [
    (  # processor_test.go "cumulative_to_delta_convert_nothing"
        "convert_nothing",
        None,
        ([".*"], "regexp"),
        {"metric_1": ([100], True, None), "metric_2": ([4], True, None)},
        {"metric_1": [100], "metric_2": [4]},
    ),
    (  # "cumulative_to_delta_one_positive"
        "one_positive",
        (["metric_1"], "strict"),
        None,
        {"metric_1": ([0, 100, 200, 500], True, None), "metric_2": ([4], True, None)},
        {"metric_1": [100, 100, 300], "metric_2": [4]},
    ),
    (  # "cumulative_to_delta_nan_value" — unanchored regexp "_1"
        "nan_value",
        (["_1"], "regexp"),
        None,
        {"metric_1": ([0, 100, 200, NAN], True, None), "metric_2": ([4], True, None)},
        {"metric_1": [100, 100, NAN], "metric_2": [4]},
    ),
    (  # "cumulative_to_delta_nodata" — no matchers => all scoped
        "nodata",
        None,
        None,
        {
            "metric_1": ([0, 100, 0, 200, 400], True, [0, 0, 1, 0, 0]),
            "metric_2": ([0, 100, 0, 0, 400], True, [0, 0, 1, 1, 0]),
        },
        {"metric_1": [100, 100, 200], "metric_2": [100, 300]},
    ),
    (  # "cumulative_to_delta_exclude_precedence"
        "exclude_precedence",
        ([".*"], "regexp"),
        ([".*"], "regexp"),
        {"metric_1": ([100], True, None), "metric_2": ([4], True, None)},
        {"metric_1": [100], "metric_2": [4]},
    ),
    (  # "cumulative_to_delta_all"
        "all",
        ([".*"], "regexp"),
        None,
        {
            "metric_1": ([0, 100, 200, 500], True, None),
            "metric_2": ([0, 4, 5], True, None),
        },
        {"metric_1": [100, 100, 300], "metric_2": [4, 1]},
    ),
    (  # "cumulative_to_delta_remove_metric_1" — strict exclude
        "remove_metric_1",
        ([".*"], "regexp"),
        (["metric_1"], "strict"),
        {
            "metric_1": ([100, 200, 500], True, None),
            "metric_2": ([0, 4, 5], True, None),
        },
        {"metric_1": [100, 200, 500], "metric_2": [4, 1]},
    ),
    (  # "cumulative_to_delta_remove_non_monotonic"
        "remove_non_monotonic",
        ([".*"], "regexp"),
        None,
        {
            "metric_1": ([0, 100, 200, 500], True, None),
            "metric_2": ([4, 5], False, None),
        },
        {"metric_1": [100, 100, 300], "metric_2": [4, 5]},
    ),
    (  # "cumulative_to_delta_restart_detected" — drop, re-reference
        "restart_detected",
        ([".*"], "regexp"),
        None,
        {"metric_1": ([100, 105, 120, 100, 110], True, None)},
        {"metric_1": [5, 15, 10]},
    ),
]


@pytest.mark.parametrize(
    "name,include,exclude,inp,expected",
    SUM_CASES,
    ids=[c[0] for c in SUM_CASES],
)
def test_reference_sum_cases(spark, name, include, exclude, inp, expected):
    proc = CumulativeToDelta(
        stream_keys=["metric"],
        order_col="ts",
        metric_col="metric",
        include=include[0] if include else None,
        include_match=include[1] if include else "strict",
        exclude=exclude[0] if exclude else None,
        exclude_match=exclude[1] if exclude else "strict",
        monotonic_col="monotonic",
        novalue_col="novalue",
    )
    got = _collect_sums(proc(_sum_frame(spark, inp)))
    _assert_values(got, expected)


def _hist_frame(spark, metrics):
    """metrics: {name: (counts, sums_or_None, buckets, mins, maxes, flags)}"""
    rows = []
    for name, (counts, sums, buckets, mins, maxes, flags) in metrics.items():
        for i in range(len(counts)):
            rows.append(
                Row(
                    metric=name,
                    ts=i,
                    count=counts[i],
                    hsum=float(sums[i]) if sums is not None else None,
                    buckets=list(buckets[i]),
                    hmin=float(mins[i]) if mins is not None else None,
                    hmax=float(maxes[i]) if maxes is not None else None,
                    novalue=bool(flags[i]) if flags else False,
                )
            )
    schema = (
        "metric string, ts int, count long, hsum double, buckets array<long>,"
        " hmin double, hmax double, novalue boolean"
    )
    return spark.createDataFrame(rows, schema)


def _collect_hists(df):
    out = {}
    for r in df.orderBy("metric", "ts").collect():
        out.setdefault(r["metric"], []).append(
            (r["count"], r["hsum"], tuple(r["buckets"]), r["hmin"], r["hmax"])
        )
    return out


def _hproc(include=None):
    return CumulativeToDeltaHistogram(
        min_col="hmin",
        max_col="hmax",
        stream_keys=["metric"],
        order_col="ts",
        metric_col="metric",
        include=include,
        include_match="strict",
        novalue_col="novalue",
    )


class TestHistogramCases:
    def test_min_and_max_removed_on_conversion(self, spark):
        # processor_test.go "cumulative_to_delta_histogram_min_and_max"
        inp = {
            "metric_1": (
                [0, 100, 200, 500],
                [0, 100, 200, 500],
                [[0, 0, 0], [50, 25, 25], [100, 50, 50], [250, 125, 125]],
                [0, 5.0, 2.0, 3.0],
                [0, 800.0, 825.0, 800.0],
                None,
            ),
            "metric_2": ([4], [4], [[4, 4, 4]], [2.0], [3.0], None),
        }
        got = _collect_hists(_hproc(include=["metric_1"])(_hist_frame(spark, inp)))
        assert got["metric_1"] == [
            (100, 100.0, (50, 25, 25), None, None),
            (100, 100.0, (50, 25, 25), None, None),
            (300, 300.0, (150, 75, 75), None, None),
        ]
        assert got["metric_2"] == [(4, 4.0, (4, 4, 4), 2.0, 3.0)]

    def test_nan_sum_keeps_reference(self, spark):
        # "cumulative_to_delta_histogram_nan_sum"
        inp = {
            "metric_1": (
                [0, 100, 200, 500],
                [0, 100, NAN, 500],
                [[0, 0, 0], [50, 25, 25], [100, 50, 50], [250, 125, 125]],
                None,
                None,
                None,
            ),
        }
        got = _collect_hists(_hproc(include=["metric_1"])(_hist_frame(spark, inp)))
        m1 = got["metric_1"]
        assert [(c, b) for c, _s, b, _mn, _mx in m1] == [
            (100, (50, 25, 25)),
            (100, (50, 25, 25)),
            (300, (150, 75, 75)),
        ]
        sums = [s for _c, s, _b, _mn, _mx in m1]
        assert sums[0] == 100.0 and math.isnan(sums[1]) and sums[2] == 400.0

    def test_novalue_points_dropped_and_ignored(self, spark):
        # "cumulative_to_delta_histogram_novalue"
        inp = {
            "metric_1": (
                [0, 100, 0, 500],
                [0, 100, 0, 500],
                [[0, 0, 0], [50, 25, 25], [0, 0, 0], [250, 125, 125]],
                None,
                None,
                [0, 0, 1, 0],
            ),
            "metric_2": (
                [0, 2, 0, 0, 16],
                [0, 3, 0, 0, 81],
                [[0, 0, 0], [1, 1, 1], [0, 0, 0], [0, 0, 0], [21, 40, 20]],
                None,
                None,
                [0, 0, 1, 1, 0],
            ),
        }
        got = _collect_hists(_hproc()(_hist_frame(spark, inp)))
        assert [(c, s, b) for c, s, b, _mn, _mx in got["metric_1"]] == [
            (100, 100.0, (50, 25, 25)),
            (400, 400.0, (200, 100, 100)),
        ]
        assert [(c, s, b) for c, s, b, _mn, _mx in got["metric_2"]] == [
            (2, 3.0, (1, 1, 1)),
            (14, 78.0, (20, 39, 19)),
        ]

    def test_absent_sums_stay_absent(self, spark):
        # "cumulative_to_delta_histogram_one_positive_without_sums"
        inp = {
            "metric_1": (
                [0, 100, 200, 500],
                None,
                [[0, 0, 0], [50, 25, 25], [100, 50, 50], [250, 125, 125]],
                None,
                None,
                None,
            ),
        }
        got = _collect_hists(_hproc(include=["metric_1"])(_hist_frame(spark, inp)))
        assert [(c, s, b) for c, s, b, _mn, _mx in got["metric_1"]] == [
            (100, None, (50, 25, 25)),
            (100, None, (50, 25, 25)),
            (300, None, (150, 75, 75)),
        ]


def test_legacy_plain_lagdiff_unchanged(spark):
    """With only the basic fields, behavior stays the oracle-gated
    lag-diff: negative deltas are emitted (no restart handling)."""
    df = spark.createDataFrame(
        [("m", 0, 10.0), ("m", 1, 4.0), ("m", 2, 9.0)], "metric string, ts int, value double"
    )
    out = CumulativeToDelta(stream_keys=["metric"], order_col="ts")(df)
    assert [r["delta"] for r in out.orderBy("ts").collect()] == [-6.0, 5.0]


class TestDeltaAccumulatorGuards:
    """delta.go:28-57 sample guards on DeltaToCumulative."""

    def test_older_start_and_out_of_order_drop(self, spark):
        from opentelemetry_collector_contrib_spark.processors.metrics_state import (
            DeltaToCumulative,
        )

        rows = [
            # (metric, ts, start, value, arrival)
            ("m", 1, 10, 1.0, 0),   # series head: start 10
            ("m", 2, 10, 2.0, 1),   # ok -> cum 3
            ("m", 2, 10, 7.0, 2),   # duplicate ts, later arrival -> drop
            ("m", 3, 5, 100.0, 3),  # older start -> drop, no state change
            ("m", 4, 12, 4.0, 4),   # newer start = gap, accepted -> cum 7
        ]
        df = spark.createDataFrame(
            rows, "metric string, ts int, start int, value double, arr int"
        )
        out = DeltaToCumulative(
            stream_keys=["metric"], order_col="ts",
            start_col="start", tiebreak_col="arr",
        )(df)
        got = [(r["ts"], r["cumulative"]) for r in out.orderBy("ts").collect()]
        assert got == [(1, 1.0), (2, 3.0), (4, 7.0)]

    def test_head_with_oldest_start_defines_series(self, spark):
        from opentelemetry_collector_contrib_spark.processors.metrics_state import (
            DeltaToCumulative,
        )

        rows = [("m", 1, -5, 1.0, 0), ("m", 2, 0, 2.0, 1)]
        df = spark.createDataFrame(
            rows, "metric string, ts int, start int, value double, arr int"
        )
        out = DeltaToCumulative(
            stream_keys=["metric"], order_col="ts",
            start_col="start", tiebreak_col="arr",
        )(df)
        assert out.count() == 2  # start 0 >= series start -5
