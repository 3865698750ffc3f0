"""Metric-context OTTL editors from the transform processor.

Reference: processor/transformprocessor/internal/metrics —
- func_convert_sum_to_gauge.go / func_convert_gauge_to_sum.go: retype a
  metric between Sum and Gauge; Gauge->Sum takes a temporality string
  ("delta" | "cumulative", anything else errors) and a monotonic flag;
  Sum->Gauge drops both.
- func_extract_count_metric.go / func_extract_sum_metric.go: from a
  Histogram / ExponentialHistogram / Summary metric, APPEND a new Sum
  metric named ``<name>_count`` (unit "1") or ``<name>_sum`` (original
  unit) whose datapoints carry the count / sum fields; temporality is
  inherited (Summaries count as cumulative per the OpenMetrics note,
  func_extract_sum_metric.go:111-114); the sum variant only emits
  datapoints that HAVE a sum; an empty extraction appends nothing.
- func_convert_summary_count_val_to_sum.go / _sum_val_: the datapoint-
  context twins for summaries with caller-chosen temporality.
- func_copy_metric.go: duplicate a metric with optional name /
  description / unit overrides.

Frame convention: one row per datapoint with metric-level columns
inlined — metric_name, metric_type ('gauge','sum','histogram',
'exponential_histogram','summary'), temporality ('delta','cumulative'
or null), is_monotonic (nullable bool), unit, description, plus the
datapoint fields (value; count/hsum for histogram & summary rows).
All editors take an optional ``where`` SQL predicate (the OTTL
statement condition): non-matching rows pass through untouched.

Every editor is a projection or a union of projections — zero
shuffles; the appended-metric editors scan the input once per branch
and Catalyst shares the scan under a union.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_TEMPORALITIES = ("delta", "cumulative")


def _gate(df: DataFrame, where: str | None):
    return F.expr(where) if where else F.lit(True)


def convert_sum_to_gauge(df: DataFrame, where: str | None = None) -> DataFrame:
    """Sum -> Gauge in place (datapoints unchanged); temporality and
    monotonicity do not apply to gauges and are nulled."""
    hit = _gate(df, where) & (F.col("metric_type") == "sum")
    return df.withColumns(
        {
            "metric_type": F.when(hit, "gauge").otherwise(F.col("metric_type")),
            "temporality": F.when(hit, F.lit(None).cast("string")).otherwise(
                F.col("temporality")
            ),
            "is_monotonic": F.when(hit, F.lit(None).cast("boolean")).otherwise(
                F.col("is_monotonic")
            ),
        }
    )


def convert_gauge_to_sum(
    df: DataFrame, temporality: str, monotonic: bool, where: str | None = None
) -> DataFrame:
    """Gauge -> Sum in place with the given temporality + monotonicity."""
    if temporality not in _TEMPORALITIES:
        raise ValueError(f'unknown aggregation temporality: "{temporality}"')
    hit = _gate(df, where) & (F.col("metric_type") == "gauge")
    return df.withColumns(
        {
            "metric_type": F.when(hit, "sum").otherwise(F.col("metric_type")),
            "temporality": F.when(hit, F.lit(temporality)).otherwise(
                F.col("temporality")
            ),
            "is_monotonic": F.when(hit, F.lit(monotonic)).otherwise(
                F.col("is_monotonic")
            ),
        }
    )


_EXTRACTABLE = ("histogram", "exponential_histogram", "summary")


def _inherited_temporality():
    # summaries are cumulative per the OpenMetrics note
    return F.when(F.col("metric_type") == "summary", "cumulative").otherwise(
        F.col("temporality")
    )


def extract_count_metric(
    df: DataFrame, monotonic: bool, where: str | None = None
) -> DataFrame:
    """Append ``<name>_count`` Sum metrics (unit "1") from histogram /
    expo-histogram / summary rows; originals are kept unchanged."""
    hit = _gate(df, where) & F.col("metric_type").isin(*_EXTRACTABLE)
    extracted = df.filter(hit).withColumns(
        {
            "metric_name": F.concat(F.col("metric_name"), F.lit("_count")),
            "metric_type": F.lit("sum"),
            "temporality": _inherited_temporality(),
            "is_monotonic": F.lit(monotonic),
            "unit": F.lit("1"),
            "value": F.col("count").cast("double"),
            "count": F.lit(None).cast("long"),
            "hsum": F.lit(None).cast("double"),
        }
    )
    return df.unionByName(extracted)


def extract_sum_metric(
    df: DataFrame, monotonic: bool, where: str | None = None
) -> DataFrame:
    """Append ``<name>_sum`` Sum metrics (original unit) from the sum
    field; datapoints WITHOUT a sum are skipped (HasSum gate)."""
    hit = (
        _gate(df, where)
        & F.col("metric_type").isin(*_EXTRACTABLE)
        & F.col("hsum").isNotNull()
    )
    extracted = df.filter(hit).withColumns(
        {
            "metric_name": F.concat(F.col("metric_name"), F.lit("_sum")),
            "metric_type": F.lit("sum"),
            "temporality": _inherited_temporality(),
            "is_monotonic": F.lit(monotonic),
            "value": F.col("hsum"),
            "count": F.lit(None).cast("long"),
            "hsum": F.lit(None).cast("double"),
        }
    )
    return df.unionByName(extracted)


def convert_summary_count_val_to_sum(
    df: DataFrame, temporality: str, monotonic: bool, where: str | None = None
) -> DataFrame:
    """Datapoint-context twin: append ``<name>_count`` Sum rows from
    summary datapoints with CALLER-chosen temporality."""
    if temporality not in _TEMPORALITIES:
        raise ValueError(f'unknown aggregation temporality: "{temporality}"')
    hit = _gate(df, where) & (F.col("metric_type") == "summary")
    extracted = df.filter(hit).withColumns(
        {
            "metric_name": F.concat(F.col("metric_name"), F.lit("_count")),
            "metric_type": F.lit("sum"),
            "temporality": F.lit(temporality),
            "is_monotonic": F.lit(monotonic),
            "value": F.col("count").cast("double"),
            "count": F.lit(None).cast("long"),
            "hsum": F.lit(None).cast("double"),
        }
    )
    return df.unionByName(extracted)


def convert_summary_sum_val_to_sum(
    df: DataFrame, temporality: str, monotonic: bool, where: str | None = None
) -> DataFrame:
    """Datapoint-context twin: append ``<name>_sum`` Sum rows from
    summary datapoints with CALLER-chosen temporality."""
    if temporality not in _TEMPORALITIES:
        raise ValueError(f'unknown aggregation temporality: "{temporality}"')
    hit = _gate(df, where) & (F.col("metric_type") == "summary")
    extracted = df.filter(hit).withColumns(
        {
            "metric_name": F.concat(F.col("metric_name"), F.lit("_sum")),
            "metric_type": F.lit("sum"),
            "temporality": F.lit(temporality),
            "is_monotonic": F.lit(monotonic),
            "value": F.col("hsum"),
            "count": F.lit(None).cast("long"),
            "hsum": F.lit(None).cast("double"),
        }
    )
    return df.unionByName(extracted)


def copy_metric(
    df: DataFrame,
    name: str | None = None,
    description: str | None = None,
    unit: str | None = None,
    where: str | None = None,
) -> DataFrame:
    """Append a duplicate of every matching metric's datapoints, with
    optional name / description / unit overrides (func_copy_metric.go)."""
    copied = df.filter(_gate(df, where))
    overrides = {}
    if name is not None:
        overrides["metric_name"] = F.lit(name)
    if description is not None:
        overrides["description"] = F.lit(description)
    if unit is not None:
        overrides["unit"] = F.lit(unit)
    if overrides:
        copied = copied.withColumns(overrides)
    return df.unionByName(copied)
