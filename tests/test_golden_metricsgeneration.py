"""Golden port of the metricsgeneration processor table
(processor/metricsgenerationprocessor/processor_test.go:37-267):
scale multiply, all five calculate operations, missing metric1/metric2,
operand2 <= 0 rule skip (processor.go:64), unknown-operation no-op,
int-gauge add. Single-datapoint metrics, so the columnar per-label
pairing equals the reference's first-datapoint operand."""

from __future__ import annotations

import pytest

from opentelemetry_collector_contrib_spark.processors.metrics_transform import (
    GenerationRule,
    MetricsGeneration,
)

SCHEMA = "metric_name string, value double, labels map<string,string>"


def _frame(spark, values):
    return spark.createDataFrame(
        [(n, float(v), {"l": "x"}) for n, v in values.items()], SCHEMA
    )


def _run(spark, values, rules):
    out = MetricsGeneration(rules)(_frame(spark, values))
    return {r["metric_name"]: r["value"] for r in out.collect()}


CASES = [
    ("expect_all", {"metric_1": 100, "metric_2": 4}, [],
     {"metric_1": 100.0, "metric_2": 4.0}),
    ("rule_scale",
     {"metric_1": 100, "metric_2": 4},
     [GenerationRule(name="metric_1_scaled", type="scale", metric1="metric_1",
                     operation="multiply", scale_by=5)],
     {"metric_1": 100.0, "metric_2": 4.0, "metric_1_scaled": 500.0}),
    ("missing_first_metric",
     {"metric_1": 100, "metric_2": 4},
     [GenerationRule(name="new", type="scale", metric1="", operation="multiply",
                     scale_by=5)],
     {"metric_1": 100.0, "metric_2": 4.0}),
    ("calculate_divide",
     {"metric_1": 100, "metric_2": 4},
     [GenerationRule(name="metric_1_calculated_divide", type="calculate",
                     metric1="metric_1", metric2="metric_2", operation="divide")],
     {"metric_1": 100.0, "metric_2": 4.0, "metric_1_calculated_divide": 25.0}),
    ("calculate_multiply",
     {"metric_1": 100, "metric_2": 4},
     [GenerationRule(name="metric_1_calculated_multiply", type="calculate",
                     metric1="metric_1", metric2="metric_2", operation="multiply")],
     {"metric_1": 100.0, "metric_2": 4.0, "metric_1_calculated_multiply": 400.0}),
    ("calculate_add",
     {"metric_1": 100, "metric_2": 4},
     [GenerationRule(name="metric_1_calculated_add", type="calculate",
                     metric1="metric_1", metric2="metric_2", operation="add")],
     {"metric_1": 100.0, "metric_2": 4.0, "metric_1_calculated_add": 104.0}),
    ("calculate_subtract",
     {"metric_1": 100, "metric_2": 4},
     [GenerationRule(name="metric_1_calculated_subtract", type="calculate",
                     metric1="metric_1", metric2="metric_2", operation="subtract")],
     {"metric_1": 100.0, "metric_2": 4.0, "metric_1_calculated_subtract": 96.0}),
    ("calculate_percent",
     {"metric_1": 20, "metric_2": 200},
     [GenerationRule(name="metric_1_calculated_percent", type="calculate",
                     metric1="metric_1", metric2="metric_2", operation="percent")],
     {"metric_1": 20.0, "metric_2": 200.0, "metric_1_calculated_percent": 10.0}),
    ("calculate_missing_2nd_metric",
     {"metric_1": 100, "metric_2": 4},
     [GenerationRule(name="new", type="calculate", metric1="metric_1",
                     metric2="nope", operation="multiply")],
     {"metric_1": 100.0, "metric_2": 4.0}),
    ("calculate_divide_op2_zero",
     {"metric_1": 100, "metric_2": 0},
     [GenerationRule(name="new", type="calculate", metric1="metric_1",
                     metric2="metric_2", operation="divide")],
     {"metric_1": 100.0, "metric_2": 0.0}),
    ("int_gauge_add",
     {"metric_1": 100, "metric_2": 5},
     [GenerationRule(name="metric_calculated", type="calculate",
                     metric1="metric_1", metric2="metric_2", operation="add")],
     {"metric_1": 100.0, "metric_2": 5.0, "metric_calculated": 105.0}),
    # processor.go:64 also skips NEGATIVE operands (<= 0, not == 0)
    ("calculate_op2_negative_skipped",
     {"metric_1": 100, "metric_2": -4},
     [GenerationRule(name="new", type="calculate", metric1="metric_1",
                     metric2="metric_2", operation="add")],
     {"metric_1": 100.0, "metric_2": -4.0}),
]


@pytest.mark.parametrize("name,values,rules,expected", CASES,
                         ids=[c[0] for c in CASES])
def test_reference_generation_cases(spark, name, values, rules, expected):
    assert _run(spark, values, rules) == expected


def test_invalid_operation_rejected_at_construction():
    """config.go:163 — Validate rejects unknown operations; the Go test
    table's invalid-op case bypasses validation (factory direct), so
    construction-time rejection is the faithful config posture."""
    with pytest.raises(ValueError):
        GenerationRule(name="new", type="calculate", metric1="m1",
                       metric2="m2", operation="invalid")
