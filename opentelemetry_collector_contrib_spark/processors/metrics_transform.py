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

Scale note: each transform splits the frame into filter branches
(matched / rest, combine adds the 1-row canBeCombined gate), and union
branches re-evaluate the upstream subtree — free when the upstream is a
pruned parquet scan, but when chaining transforms over an EXPENSIVE
derivation, ``df.persist()`` (or localCheckpoint) the input first so
the branches share one materialization.
"""

from __future__ import annotations

import re as _re
from dataclasses import dataclass, field
from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..envelope import try_element_at

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


def _jvm_pat(pattern: str) -> str:
    """JVM group names disallow '_' etc. — strip Go/Python named groups,
    extract by index (keeps lookbehind (?<= / (?<! intact)."""
    return _re.sub(r"\(\?P?<(?![=!])[^>]*>", "(", pattern)


_TPL_REF = _re.compile(r"\$(\{(\w+)\}|\w+)")


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
    """One transform entry (config.go:31-70).

    ``match_labels`` mirrors ``experimental_match_labels``
    (config.go:94-96): per-datapoint attribute matchers ANDed together,
    interpreted strict or regexp per ``match_type``. Missing-key rule
    (metrics_transform_processor_otlp.go matchAttrs:211-222): an absent
    key matches only when the matcher accepts the EMPTY string (strict
    value ``""`` or a regexp matching ``""``); regexp value matching is
    unanchored, like Go ``MatchString``.
    """

    include: str
    match_type: str = "strict"       # strict | regexp
    action: str = "update"           # update | insert | combine
    new_name: str | None = None
    aggregation_type: str = "sum"    # for combine
    operations: list[MetricOp] = field(default_factory=list)
    match_labels: dict[str, str] | None = None
    submatch_case: str | None = None  # upper | lower (combine, config.go:66-70)

    def matches(self, name_col: Column, labels: Column | None = None) -> Column:
        if self.match_type == "regexp":
            m = name_col.rlike(_jvm_pat(self.include))
        else:
            m = name_col == self.include
        if not self.match_labels or labels is None:
            return m
        for k, pat in self.match_labels.items():
            v = try_element_at(labels, k)
            if self.match_type == "regexp":
                present = v.rlike(_jvm_pat(pat))
                absent_ok = _re.search(pat, "") is not None
            else:
                present = v == pat
                absent_ok = pat == ""
            m = m & F.when(v.isNotNull(), present).otherwise(F.lit(absent_ok))
        return m

    def rename_expr(self, name_col: Column) -> Column:
        """New-name expression. Regexp filters expand ``$1`` / ``$name`` /
        ``${ref}`` capture references against the include pattern, like
        the reference's ``regexp.ExpandString``
        (metrics_transform_processor.go expand / NewName docs in
        config.go:56-60); non-participating groups expand empty."""
        if self.match_type != "regexp" or "$" not in (self.new_name or ""):
            return F.lit(self.new_name)
        groupindex = _re.compile(
            self.include.replace("(?<", "(?P<")
            .replace("(?P<=", "(?<=")
            .replace("(?P<!", "(?<!")
        ).groupindex
        jvm = _jvm_pat(self.include)
        parts: list[Column] = []
        pos = 0
        for m in _TPL_REF.finditer(self.new_name):
            if m.start() > pos:
                parts.append(F.lit(self.new_name[pos : m.start()]))
            ref = m.group(2) or m.group(1)
            idx = int(ref) if ref.isdigit() else groupindex.get(ref)
            if idx is None:
                parts.append(F.lit(""))  # unknown ref expands empty (Go Expand)
            else:
                parts.append(F.regexp_extract(name_col, jvm, idx))
            pos = m.end()
        if pos < len(self.new_name):
            parts.append(F.lit(self.new_name[pos:]))
        return F.concat(*parts) if parts else F.lit("")


@dataclass
class MetricsTransform:
    """``type_col`` (optional): a column holding ``'int'`` or
    ``'double'`` per datapoint. When present the int-typed arithmetic of
    the reference is reproduced: scale truncates toward zero for int
    points (operation_scale_value.go:33), toggle_scalar_data_type swaps
    the type and truncates double→int (operation_toggle_scalar_datatype.go:29-34),
    and aggregations over an all-int group use integer mean / keep the
    group type (operation_aggregate_labels.go mergeNumberDataPoints —
    the reference keys on the FIRST point's type; order has no columnar
    analog, so a group is int iff EVERY point is int)."""

    transforms: list[MetricTransform]
    name_col: str = "metric_name"
    value_col: str = "value"
    labels_col: str = "labels"
    type_col: str | None = None

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
            scaled = F.col(val) * F.lit(op.scale)
            if self._typed(df):
                scaled = F.when(
                    F.col(self.type_col) == "int",
                    scaled.cast("long").cast("double"),
                ).otherwise(scaled)
            return df.withColumn(val, scaled)
        if op.action == "toggle_scalar_data_type":
            if not self._typed(df):
                # untyped long frame carries doubles; toggle is a no-op
                return df.withColumn(val, F.col(val).cast("double"))
            is_int = F.col(self.type_col) == "int"
            return df.withColumn(
                val,
                # double -> int truncates toward zero (int64(dp.DoubleValue()))
                F.when(is_int, F.col(val)).otherwise(
                    F.col(val).cast("long").cast("double")
                ),
            ).withColumn(
                self.type_col, F.when(is_int, F.lit("double")).otherwise(F.lit("int"))
            )
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

    def _typed(self, df: DataFrame) -> bool:
        return self.type_col is not None and self.type_col in df.columns

    def _agg_by_labels(self, df: DataFrame, how: str) -> DataFrame:
        name, val, lab = self.name_col, self.value_col, self.labels_col
        typed = self._typed(df)
        passthrough = [
            c for c in df.columns
            if c not in (name, val, lab) and (not typed or c != self.type_col)
        ]
        aggs = [
            _AGG[how](F.col(val)).cast("double").alias(val),
            *[F.min(c).alias(c) for c in passthrough],
        ]
        if typed:
            aggs += [
                F.bool_and(F.col(self.type_col) == "int").alias("__all_int__"),
                F.sum(F.col(val)).alias("__sum__"),
                F.count(F.col(val)).alias("__cnt__"),
            ]
        out = (
            df.groupBy(F.col(name), _labels_key(F.col(lab)).alias("__lk__"))
            .agg(*aggs)
            .withColumn(lab, F.map_from_entries(F.col("__lk__")))
            .drop("__lk__")
        )
        if typed:
            if how == "mean":
                # int groups use integer division (mergeNumberDataPoints:
                # dp.SetIntValue(dp.IntValue() / int64(dps.Len())))
                out = out.withColumn(
                    val,
                    F.when(
                        F.col("__all_int__"),
                        (F.col("__sum__") / F.col("__cnt__"))
                        .cast("long")
                        .cast("double"),
                    ).otherwise(F.col(val)),
                )
            out = out.withColumn(
                self.type_col,
                F.when(F.col("__all_int__"), F.lit("int")).otherwise(F.lit("double")),
            ).drop("__all_int__", "__sum__", "__cnt__")
            return out.select(name, val, lab, self.type_col, *passthrough)
        return out.select(name, val, lab, *passthrough)

    # --- transform driver ---------------------------------------------------

    def __call__(self, df: DataFrame) -> DataFrame:
        name = self.name_col
        out = df
        for t in self.transforms:
            # row = datapoint: name + label matchers gate per row, which
            # reproduces matchAnyDps (any matching row transforms) and
            # extractMetricWithMatchingAttrs (insert clones only the
            # matching datapoints) in one predicate
            m = t.matches(F.col(name), F.col(self.labels_col))
            if t.match_labels and t.action == "update":
                out = self._update_partial(out, t, m)
                continue
            matched = out.filter(m)
            if t.action == "combine":
                rest = out.filter(~F.coalesce(m, F.lit(False)))
                combined = self._combine_labels(matched, t)
                combined = combined.withColumn(name, F.lit(t.new_name))
                combined = self._agg_by_labels(combined, t.aggregation_type)
                for op in t.operations:
                    combined = self._apply_op(combined, op)
                # canBeCombined (metrics_transform_processor_otlp.go:311-396):
                # matched metrics must share one label KEY set (and
                # metric_type / unit when the frame carries them) or the
                # whole transform no-ops. One tiny agg over the matched
                # subset, broadcast onto both branches — fully lazy.
                checks = [F.sort_array(F.map_keys(F.col(self.labels_col)))]
                for extra in ("metric_type", "unit"):
                    if extra in matched.columns:
                        # unset unit/type is Go's zero value "" — a null
                        # here must count as a distinct value, not vanish
                        # from count_distinct
                        checks.append(F.coalesce(F.col(extra), F.lit("")))
                cons = matched.agg(
                    (F.count_distinct(F.struct(*checks)) <= 1).alias("__cmb_ok__")
                )
                combined = (
                    combined.crossJoin(F.broadcast(cons))
                    .filter(F.col("__cmb_ok__"))
                    .drop("__cmb_ok__")
                )
                skipped = (
                    matched.crossJoin(F.broadcast(cons))
                    .filter(~F.col("__cmb_ok__"))
                    .drop("__cmb_ok__")
                )
                out = rest.unionByName(combined).unionByName(skipped)
                continue
            transformed = matched
            for op in t.operations:
                transformed = self._apply_op(transformed, op)
            if t.new_name:
                transformed = transformed.withColumn(name, t.rename_expr(F.col(name)))
            if t.action == "update":
                rest = out.filter(~F.coalesce(m, F.lit(False)))
                out = rest.unionByName(transformed)
            else:  # insert: keep originals, append the transformed clone
                out = out.unionByName(transformed)
        return out

    _DP_LEVEL_OPS = ("update_label", "toggle_scalar_data_type", "experimental_scale_value")

    def _update_partial(self, out: DataFrame, t: MetricTransform, m: Column) -> DataFrame:
        """Update with attr matchers (transformMetric, otlp.go:526-563):
        ``canChangeMetric = matchAllDps`` — rename and metric-level ops
        (aggregate_labels / aggregate_label_values / add_label /
        delete_label_value) apply only to metrics where EVERY datapoint
        matches; datapoint-level ops (update_label / toggle / scale)
        apply per matching datapoint regardless. One window keyed on the
        metric name computes the all-dps gate — the only shuffle, and
        only when match_labels is configured on an update."""
        from pyspark.sql import Window

        name = self.name_col
        name_m = t.matches(F.col(name))
        rest = out.filter(~F.coalesce(name_m, F.lit(False)))
        cand = out.filter(name_m)  # only matched metrics shuffle for the gate
        lab_m = t.matches(F.col(name), F.col(self.labels_col))
        gated = cand.withColumn("__dp__", lab_m).withColumn(
            "__full__", F.bool_and(lab_m).over(Window.partitionBy(F.col(name)))
        )

        # whole-metric branch: every op + rename
        whole = gated.filter(F.col("__full__")).drop("__full__", "__dp__")
        for op in t.operations:
            whole = self._apply_op(whole, op)
        if t.new_name:
            whole = whole.withColumn(name, t.rename_expr(F.col(name)))

        # partial metrics: dp-level ops on matching dps only, no rename
        partial_m = gated.filter(~F.col("__full__") & F.col("__dp__")).drop(
            "__full__", "__dp__"
        )
        for op in t.operations:
            if op.action in self._DP_LEVEL_OPS:
                partial_m = self._apply_op(partial_m, op)
        partial_u = gated.filter(~F.col("__full__") & ~F.col("__dp__")).drop(
            "__full__", "__dp__"
        )
        return (
            rest.unionByName(whole).unionByName(partial_m).unionByName(partial_u)
        )

    def _combine_labels(self, matched: DataFrame, t: MetricTransform) -> DataFrame:
        """Regexp combine turns each capture group of the include pattern
        into a label on every point: key = group name or ``$i``, value =
        that metric's submatch (case-folded per submatch_case); empty
        submatches are skipped (combine(), otlp.go:398-441)."""
        if t.match_type != "regexp":
            return matched
        compiled = _re.compile(
            t.include.replace("(?<", "(?P<")
            .replace("(?P<=", "(?<=")
            .replace("(?P<!", "(?<!")
        )
        ngroups = compiled.groups
        by_idx = {v: k for k, v in compiled.groupindex.items()}
        jvm = _jvm_pat(t.include)
        name, lab = self.name_col, self.labels_col
        out = matched
        for i in range(1, ngroups + 1):
            key = by_idx.get(i, f"${i}")
            sub = F.regexp_extract(F.col(name), jvm, i)
            if t.submatch_case == "upper":
                sub = F.upper(sub)
            elif t.submatch_case == "lower":
                sub = F.lower(sub)
            out = out.withColumn(
                lab,
                F.when(
                    sub != "",
                    F.map_concat(
                        F.map_filter(F.col(lab), lambda k, _: k != F.lit(key)),
                        F.create_map(F.lit(key), sub),
                    ),
                ).otherwise(F.col(lab)),
            )
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
            # processor.go:64 — a calculate rule whose second operand is
            # NOT strictly positive is skipped entirely (zero AND
            # negative operands; divide-by-zero never reaches the math)
            ops = {
                "add": lambda a, b: a + b,
                "subtract": lambda a, b: a - b,
                "multiply": lambda a, b: a * b,
                "divide": lambda a, b: a / b,
                "percent": lambda a, b: a / b * 100.0,
            }
            if r.operation not in ops:
                # runtime posture: an unknown operation generates nothing
                # (calculateValue's default; the test table's invalid-op
                # case expects the input to pass through unchanged)
                continue
            paired = m1.withColumn("__lk__", _labels_key(F.col(lab))).join(
                m2, "__lk__"
            )
            gen = (
                paired.withColumn(
                    val,
                    F.when(
                        F.col("__v2__") > 0,
                        ops[r.operation](F.col(val), F.col("__v2__")),
                    ),
                )
                .filter(F.col(val).isNotNull())
                .withColumn(name, F.lit(r.name))
                .drop("__lk__", "__v2__")
            )
            out = out.unionByName(gen)
        return out
