"""Exceptions connector: error metrics + logs from span exception events.

Reference: connector/exceptionsconnector —
- connector.go:12-21: reserved dimension keys (service.name, span.name,
  span.kind, status.code) and the ``exception`` event name.
- connector.go:43-62 (getDimensionValue): configured dimensions resolve
  span attributes first, then event attributes, then the configured
  default.
- config.go:47-61 (validateDimensions): configured dimensions must not
  collide with the reserved keys or each other.
- connector_metrics.go:74-106: every span event named ``exception`` on
  a span whose resource carries a service name contributes 1 to the
  ``exceptions`` monotonic sum keyed by (reserved keys + dimensions);
  exemplars (config.go Exemplars) attach (trace_id, span_id) samples.
- connector_logs.go:49-123: the logs signal emits ONE severity-ERROR
  log record per exception event carrying the span/trace ids, the
  reserved keys, the dimensions, and ``exception.stacktrace``.

Columnar restatement over a span frame where each row is a span and
``events`` is an ``array<struct<name, ts, attributes map>>`` (the pdata
shape): one ``explode(events)`` + filter on the event name feeds both
signals — ``metrics()`` is a single map-side-combined hash aggregation
(the reference's per-key map, one shuffle), ``logs()`` a zero-shuffle
projection. Exemplars are a bounded deterministic sample
(sort_array + slice) rather than the reference's unbounded per-batch
list — the 100 TB-safe analog of an exemplar reservoir.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..envelope import try_element_at

EVENT_NAME_EXC = "exception"  # connector.go:20
RESERVED_KEYS = ("service.name", "span.name", "span.kind", "status.code")


@dataclass
class ExcDimension:
    """config.go:14-17 Dimension: attribute name + optional default."""

    name: str
    default: str | None = None


def _default_dims() -> list[ExcDimension]:
    # factory.go default config: exception.type + exception.message
    return [ExcDimension("exception.type"), ExcDimension("exception.message")]


@dataclass
class ExceptionsConnector:
    dimensions: list[ExcDimension] = field(default_factory=_default_dims)
    exemplars: bool = False
    exemplar_cap: int = 5
    service_col: str = "service_name"
    span_name_col: str = "span_name"
    span_kind_col: str = "span_kind"
    status_code_col: str = "status_code"
    events_col: str = "events"
    attributes_col: str = "attributes"
    trace_id_col: str = "trace_id"
    span_id_col: str = "span_id"

    def __post_init__(self):
        # validateDimensions (config.go:47-61)
        seen = set(RESERVED_KEYS)
        for d in self.dimensions:
            if d.name in seen:
                raise ValueError(f"duplicate dimension name {d.name!r}")
            seen.add(d.name)

    # -- shared explode -----------------------------------------------------

    def _dim_value(self, df: DataFrame, d: ExcDimension) -> Column:
        """Span attrs -> event attrs -> default (connector.go:43-62)."""
        sources = []
        if self.attributes_col in df.columns:
            sources.append(try_element_at(F.col(self.attributes_col), d.name))
        sources.append(try_element_at(F.col("__event__.attributes"), d.name))
        if d.default is not None:
            sources.append(F.lit(d.default))
        return F.coalesce(*sources).alias(d.name.replace(".", "_"))

    def exceptions(self, df: DataFrame) -> DataFrame:
        """One row per exception event: the shared subtree of both
        signals. Spans without a service name are skipped
        (connector_metrics.go:78-82 ``continue``)."""
        exploded = df.filter(F.col(self.service_col).isNotNull()).select(
            "*", F.explode(self.events_col).alias("__event__")
        )
        return exploded.filter(F.col("__event__.name") == EVENT_NAME_EXC)

    # -- metrics signal -----------------------------------------------------

    def metrics(self, df: DataFrame) -> DataFrame:
        """``exceptions`` monotonic-sum data points: one row per
        (reserved keys + dimensions) with its event count
        (connector_metrics.go collectExceptions)."""
        exc = self.exceptions(df)
        keys = [
            F.col(self.service_col).alias("service_name"),
            F.col(self.span_name_col).alias("span_name"),
            F.col(self.span_kind_col).alias("span_kind"),
            F.col(self.status_code_col).alias("status_code"),
            *[self._dim_value(exc, d) for d in self.dimensions],
        ]
        sel = list(keys)
        group_names = [
            "service_name", "span_name", "span_kind", "status_code",
            *[d.name.replace(".", "_") for d in self.dimensions],
        ]
        if not self.exemplars:
            return (
                exc.select(*sel)
                .groupBy(*group_names)
                .agg(F.count(F.lit(1)).alias("count"))
            )
        # exemplars stay BOUNDED per group: rank (trace, span) within
        # the group and keep only exemplar_cap rows BEFORE any
        # collect_list — a hot exception class must never build an
        # unbounded array on one reducer (the previous
        # slice(sort(collect_list(ALL))) did exactly that). Same
        # deterministic result: the cap smallest (trace, span) pairs.
        proj = exc.select(
            *sel, F.col(self.trace_id_col).alias("__etid"),
            F.col(self.span_id_col).alias("__esid"),
        )
        w = Window.partitionBy(*group_names).orderBy("__etid", "__esid")
        ranked = proj.withColumn("__ern", F.row_number().over(w))
        # ONE aggregation: count sees every row, the conditional
        # collect_list skips the null it gets for rows past the cap —
        # bounded array, and null-valued group keys stay one group
        # (a counts-vs-exemplars join would drop them: null != null)
        return ranked.groupBy(*group_names).agg(
            F.count(F.lit(1)).alias("count"),
            F.sort_array(
                F.collect_list(
                    F.when(
                        F.col("__ern") <= self.exemplar_cap,
                        F.struct(
                            F.col("__etid").alias("trace_id"),
                            F.col("__esid").alias("span_id"),
                        ),
                    )
                )
            ).alias("exemplars"),
        )

    # -- logs signal --------------------------------------------------------

    def logs(self, df: DataFrame) -> DataFrame:
        """One severity-ERROR log record per exception event
        (connector_logs.go attrToLogRecord)."""
        exc = self.exceptions(df)
        cols = [
            F.col("__event__.ts").alias("ts"),
            F.lit("ERROR").alias("severity_text"),
            F.lit(17).alias("severity_number"),  # plog.SeverityNumberError
            F.col(self.trace_id_col).alias("trace_id"),
            F.col(self.span_id_col).alias("span_id"),
            F.col(self.service_col).alias("service_name"),
            F.col(self.span_name_col).alias("span_name"),
            F.col(self.span_kind_col).alias("span_kind"),
            F.col(self.status_code_col).alias("status_code"),
            *[self._dim_value(exc, d) for d in self.dimensions],
            # stacktrace always copied from the event, '' when absent
            # (connector_logs.go getValue)
            F.coalesce(
                try_element_at(F.col("__event__.attributes"), "exception.stacktrace"),
                F.lit(""),
            ).alias("exception_stacktrace"),
        ]
        if self.attributes_col in df.columns:
            cols.append(F.col(self.attributes_col).alias("span_attributes"))
        return exc.select(*cols)
