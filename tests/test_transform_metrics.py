"""Metric-context OTTL editors (transform processor).

Behavioral port of processor/transformprocessor/internal/metrics test
tables (func_extract_count_metric_test.go, func_extract_sum_metric_
test.go, func_convert_*_test.go, func_copy_metric_test.go) onto the
typed datapoint frame of processors/transform_metrics.py.
"""

from __future__ import annotations

import pytest
from pyspark.sql import Row

from opentelemetry_collector_contrib_spark.processors.transform_metrics import (
    convert_gauge_to_sum,
    convert_summary_count_val_to_sum,
    convert_summary_sum_val_to_sum,
    convert_sum_to_gauge,
    copy_metric,
    extract_count_metric,
    extract_sum_metric,
)

SCHEMA = (
    "metric_name string, metric_type string, temporality string,"
    " is_monotonic boolean, unit string, description string,"
    " value double, count long, hsum double"
)


@pytest.fixture(scope="module")
def metrics(spark):
    rows = [
        # a sum, a gauge, a delta histogram (one dp without sum), a
        # cumulative expo histogram, and a summary
        Row("req.total", "sum", "cumulative", True, "1", "requests", 10.0, None, None),
        Row("cpu.usage", "gauge", None, None, "%", "usage", 0.5, None, None),
        Row("latency", "histogram", "delta", None, "ms", "lat", None, 7, 21.5),
        Row("latency", "histogram", "delta", None, "ms", "lat", None, 3, None),
        Row("sizes", "exponential_histogram", "cumulative", None, "By", "sz", None, 11, 99.0),
        Row("rt", "summary", None, None, "s", "rt summary", None, 5, 12.5),
    ]
    return spark.createDataFrame(rows, SCHEMA).cache()


def _by_name(df):
    out = {}
    for r in df.collect():
        out.setdefault(r["metric_name"], []).append(r.asDict())
    return out


class TestConvert:
    def test_sum_to_gauge(self, metrics):
        got = _by_name(convert_sum_to_gauge(metrics))
        m = got["req.total"][0]
        assert m["metric_type"] == "gauge"
        assert m["temporality"] is None and m["is_monotonic"] is None
        assert m["value"] == 10.0
        # non-sum rows untouched
        assert got["cpu.usage"][0]["metric_type"] == "gauge"
        assert got["latency"][0]["metric_type"] == "histogram"

    def test_gauge_to_sum(self, metrics):
        got = _by_name(convert_gauge_to_sum(metrics, "delta", True))
        m = got["cpu.usage"][0]
        assert m["metric_type"] == "sum"
        assert m["temporality"] == "delta" and m["is_monotonic"] is True
        assert got["req.total"][0]["metric_type"] == "sum"  # untouched

    def test_gauge_to_sum_bad_temporality(self, metrics):
        with pytest.raises(ValueError):
            convert_gauge_to_sum(metrics, "bogus", True)

    def test_where_gates(self, metrics):
        got = _by_name(
            convert_sum_to_gauge(metrics, where="metric_name = 'nope'")
        )
        assert got["req.total"][0]["metric_type"] == "sum"


class TestExtract:
    @pytest.mark.parametrize("monotonic", [False, True])
    def test_count_from_all_three_types(self, metrics, monotonic):
        got = _by_name(extract_count_metric(metrics, monotonic))
        # histogram: both dps extracted, temporality inherited (delta)
        lat = got["latency_count"]
        assert sorted(d["value"] for d in lat) == [3.0, 7.0]
        assert all(
            d["metric_type"] == "sum"
            and d["temporality"] == "delta"
            and d["is_monotonic"] is monotonic
            and d["unit"] == "1"
            and d["count"] is None
            for d in lat
        )
        # expo histogram inherits cumulative
        assert got["sizes_count"][0]["temporality"] == "cumulative"
        assert got["sizes_count"][0]["value"] == 11.0
        # summary counts as cumulative (OpenMetrics note)
        assert got["rt_count"][0]["temporality"] == "cumulative"
        assert got["rt_count"][0]["value"] == 5.0
        # gauge/sum rows are not extracted, originals kept
        assert "req.total_count" not in got and "cpu.usage_count" not in got
        assert len(got["latency"]) == 2

    def test_sum_keeps_unit_and_skips_sumless(self, metrics):
        got = _by_name(extract_sum_metric(metrics, True))
        lat = got["latency_sum"]
        # only the dp WITH a sum (HasSum gate)
        assert [d["value"] for d in lat] == [21.5]
        assert lat[0]["unit"] == "ms"  # original unit, unlike _count
        assert got["sizes_sum"][0]["value"] == 99.0
        assert got["rt_sum"][0]["value"] == 12.5

    def test_summary_datapoint_twins_use_caller_temporality(self, metrics):
        got = _by_name(convert_summary_count_val_to_sum(metrics, "delta", False))
        assert got["rt_count"][0]["temporality"] == "delta"
        assert got["rt_count"][0]["value"] == 5.0
        got = _by_name(convert_summary_sum_val_to_sum(metrics, "cumulative", True))
        assert got["rt_sum"][0]["value"] == 12.5
        assert got["rt_sum"][0]["is_monotonic"] is True


class TestCopy:
    def test_copy_with_overrides(self, metrics):
        got = _by_name(
            copy_metric(
                metrics,
                name="req.copy",
                unit="2",
                where="metric_name = 'req.total'",
            )
        )
        assert len(got["req.total"]) == 1
        c = got["req.copy"][0]
        assert c["unit"] == "2" and c["value"] == 10.0
        assert c["description"] == "requests"  # not overridden

    def test_copy_everything_doubles(self, metrics):
        before = metrics.count()
        assert copy_metric(metrics).count() == 2 * before
