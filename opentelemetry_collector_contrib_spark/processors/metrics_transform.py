"""metricstransform + metricsgeneration processors.

Reference:
- processor/metricstransformprocessor/config.go:26-232 and
  metrics_transform_processor_otlp.go — select metrics by name
  (strict/regexp), then ``update`` in place / ``insert`` a transformed
  clone / ``combine`` matches into one metric; per-metric operations:
  add_label, update_label (+value_actions), delete_label_value,
  experimental_scale_value, aggregate_labels, aggregate_label_values,
  toggle_scalar_data_type.
- processor/metricsgenerationprocessor/config.go:20-60 — rules creating
  a NEW metric from one metric scaled by a constant (``scale``) or from
  two metrics combined pointwise (``calculate``: add / subtract /
  multiply / divide / percent), points paired by identical label sets.

Columnar restatement: the metric plane is a LONG frame
``(metric_name string, value double, labels map<string,string>)``.
Label-set grouping keys on ``sort_array(map_entries(labels))`` (maps
are not directly groupable/joinable; the sorted entry array is a
canonical, shuffle-stable key). Everything is Column expressions; the
only shuffles are the aggregate_labels / combine groupBys and the
calculate-rule equi-join — exactly the shuffles the semantics demand.
``group`` (resource re-grouping) is out of the log-pipeline slice.
"""

from __future__ import annotations

import re as _re
from dataclasses import dataclass, field
from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_AGG = {
    "sum": F.sum,
    "mean": F.mean,
    "min": F.min,
    "max": F.max,
    "count": F.count,
}


def _labels_key(labels: Column) -> Column:
    """Canonical groupable/joinable key for a label map."""
    return F.sort_array(F.map_entries(labels))


@dataclass
class MetricOp:
    """One operation inside a transform (config.go:100-140)."""

    action: str
    label: str | None = None
    new_label: str | None = None
    new_value: str | None = None
    label_value: str | None = None
    label_set: list[str] | None = None
    aggregation_type: str = "sum"
    scale: float | None = None
    value_actions: dict[str, str] | None = None  # old label value -> new
    aggregated_values: list[str] | None = None


@dataclass
class MetricTransform:
    """One transform entry (config.go:31-70)."""

    include: str
    match_type: str = "strict"       # strict | regexp
    action: str = "update"           # update | insert | combine
    new_name: str | None = None
    aggregation_type: str = "sum"    # for combine
    operations: list[MetricOp] = field(default_factory=list)

    def matches(self, name_col: Column) -> Column:
        if self.match_type == "regexp":
            return name_col.rlike(self.include)
        return name_col == self.include


@dataclass
class MetricsTransform:
    transforms: list[MetricTransform]
    name_col: str = "metric_name"
    value_col: str = "value"
    labels_col: str = "labels"

    def __post_init__(self):
        for t in self.transforms:
            if t.action not in ("update", "insert", "combine"):
                raise ValueError(f"unsupported transform action {t.action!r}")
            for op in t.operations:
                if op.action not in (
                    "add_label", "update_label", "delete_label_value",
                    "experimental_scale_value", "aggregate_labels",
                    "aggregate_label_values", "toggle_scalar_data_type",
                ):
                    raise ValueError(f"unsupported operation {op.action!r}")

    # --- operations ---------------------------------------------------------

    def _apply_op(self, df: DataFrame, op: MetricOp) -> DataFrame:
        name, val, lab = self.name_col, self.value_col, self.labels_col
        labels = F.col(lab)
        if op.action == "add_label":
            return df.withColumn(
                lab,
                F.map_concat(
                    F.map_filter(labels, lambda k, _: k != op.label),
                    F.create_map(F.lit(op.label), F.lit(op.new_value)),
                ),
            )
        if op.action == "update_label":
            renamed = F.map_from_entries(
                F.transform(
                    F.map_entries(labels),
                    lambda e: F.struct(
                        F.when(e.getField("key") == op.label, F.lit(op.new_label or op.label))
                        .otherwise(e.getField("key"))
                        .alias("key"),
                        e.getField("value").alias("value"),
                    ),
                )
            ) if op.new_label else labels
            out = df.withColumn(lab, renamed)
            if op.value_actions:
                key = op.new_label or op.label
                value_map = reduce(
                    lambda acc, kv: acc.when(
                        F.col(lab).getItem(key) == kv[0], F.lit(kv[1])
                    ),
                    op.value_actions.items(),
                    F.when(F.lit(False), F.lit(None)),
                ).otherwise(F.col(lab).getItem(key))
                out = out.withColumn(
                    lab,
                    F.map_concat(
                        F.map_filter(F.col(lab), lambda k, _: k != key),
                        F.map_filter(
                            F.create_map(F.lit(key), value_map),
                            lambda _, v: v.isNotNull(),
                        ),
                    ),
                )
            return out
        if op.action == "delete_label_value":
            return df.filter(
                ~F.coalesce(labels.getItem(op.label) == op.label_value, F.lit(False))
            )
        if op.action == "experimental_scale_value":
            return df.withColumn(val, F.col(val) * F.lit(op.scale))
        if op.action == "toggle_scalar_data_type":
            # the long frame carries doubles; int-typed points round-trip
            return df.withColumn(val, F.col(val).cast("double"))
        if op.action == "aggregate_labels":
            keep = op.label_set or []
            trimmed = df.withColumn(
                lab, F.map_filter(labels, lambda k, _: k.isin(keep))
            )
            return self._agg_by_labels(trimmed, op.aggregation_type)
        if op.action == "aggregate_label_values":
            vals = op.aggregated_values or []
            folded = df.withColumn(
                lab,
                F.when(
                    labels.getItem(op.label).isin(vals),
                    F.map_concat(
                        F.map_filter(labels, lambda k, _: k != op.label),
                        F.create_map(F.lit(op.label), F.lit(op.new_value)),
                    ),
                ).otherwise(labels),
            )
            return self._agg_by_labels(folded, op.aggregation_type)
        raise AssertionError(op.action)

    def _agg_by_labels(self, df: DataFrame, how: str) -> DataFrame:
        name, val, lab = self.name_col, self.value_col, self.labels_col
        passthrough = [c for c in df.columns if c not in (name, val, lab)]
        out = (
            df.groupBy(F.col(name), _labels_key(F.col(lab)).alias("__lk__"))
            .agg(
                _AGG[how](F.col(val)).cast("double").alias(val),
                *[F.min(c).alias(c) for c in passthrough],
            )
            .withColumn(lab, F.map_from_entries(F.col("__lk__")))
            .drop("__lk__")
        )
        return out.select(name, val, lab, *passthrough)

    # --- transform driver ---------------------------------------------------

    def __call__(self, df: DataFrame) -> DataFrame:
        name = self.name_col
        out = df
        for t in self.transforms:
            m = t.matches(F.col(name))
            matched = out.filter(m)
            if t.action == "combine":
                rest = out.filter(~F.coalesce(m, F.lit(False)))
                combined = matched.withColumn(name, F.lit(t.new_name))
                combined = self._agg_by_labels(combined, t.aggregation_type)
                for op in t.operations:
                    combined = self._apply_op(combined, op)
                out = rest.unionByName(combined)
                continue
            transformed = matched
            for op in t.operations:
                transformed = self._apply_op(transformed, op)
            if t.new_name:
                transformed = transformed.withColumn(name, F.lit(t.new_name))
            if t.action == "update":
                rest = out.filter(~F.coalesce(m, F.lit(False)))
                out = rest.unionByName(transformed)
            else:  # insert: keep originals, append the transformed clone
                out = out.unionByName(transformed)
        return out


@dataclass
class GenerationRule:
    name: str
    type: str                 # calculate | scale
    metric1: str
    metric2: str | None = None
    operation: str = "add"    # add|subtract|multiply|divide|percent
    scale_by: float = 1.0

    def __post_init__(self):
        if self.type not in ("calculate", "scale"):
            raise ValueError(f"unsupported generation type {self.type!r}")
        if self.type == "calculate" and not self.metric2:
            raise ValueError("calculate rules need metric2")
        if self.operation not in ("add", "subtract", "multiply", "divide", "percent"):
            raise ValueError(f"unsupported operation {self.operation!r}")


@dataclass
class MetricsGeneration:
    rules: list[GenerationRule]
    name_col: str = "metric_name"
    value_col: str = "value"
    labels_col: str = "labels"

    def __call__(self, df: DataFrame) -> DataFrame:
        name, val, lab = self.name_col, self.value_col, self.labels_col
        out = df
        for r in self.rules:
            m1 = df.filter(F.col(name) == r.metric1)
            if r.type == "scale":
                gen = m1.withColumn(name, F.lit(r.name)).withColumn(
                    val, F.col(val) * F.lit(r.scale_by)
                )
                out = out.unionByName(gen)
                continue
            # calculate: pair points of metric1/metric2 sharing a label
            # set. The reference pairs metric2's FIRST matching point;
            # list order has no stable columnar analog, so take min(value)
            # per label set — deterministic at any parallelism, and it
            # guarantees the join never fans metric1's points out when
            # metric2 carries duplicate label sets
            m2 = (
                df.filter(F.col(name) == r.metric2)
                .groupBy(_labels_key(F.col(lab)).alias("__lk__"))
                .agg(F.min(val).alias("__v2__"))
            )
            ops = {
                "add": lambda a, b: a + b,
                "subtract": lambda a, b: a - b,
                "multiply": lambda a, b: a * b,
                "divide": lambda a, b: F.when(b != 0, a / b),
                "percent": lambda a, b: F.when(b != 0, a / b * 100.0),
            }
            paired = m1.withColumn("__lk__", _labels_key(F.col(lab))).join(
                m2, "__lk__"
            )
            gen = (
                paired.withColumn(val, ops[r.operation](F.col(val), F.col("__v2__")))
                .filter(F.col(val).isNotNull())
                .withColumn(name, F.lit(r.name))
                .drop("__lk__", "__v2__")
            )
            out = out.unionByName(gen)
        return out
