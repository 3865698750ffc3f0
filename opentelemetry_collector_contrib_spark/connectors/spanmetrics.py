"""spanmetrics-shaped connector: RED metrics from duration-bearing rows.

Reference: connector/spanmetricsconnector/config.go:35-83 — group by
(service, span.name, kind, status + configured dimensions), emit call
counts and an explicit-bounds latency histogram per group.

Columnar restatement: one hash aggregation. The histogram is computed
long-format — one output row per (dims x bucket) with the bucket's
count — via an explicit-bounds CASE bucketer (no percentile_approx:
explicit bounds are deterministic, mergeable across partitions, and
match the reference's explicit_buckets mode). Cumulative (Prometheus
`le`) form is a window cumsum the caller can apply; partial map-side
combine applies to the single groupBy.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass
class SpanMetricsConnector:
    duration_col: str                      # numeric duration (e.g. ms)
    dimensions: list[str] = field(default_factory=list)
    buckets: list[float] = field(
        default_factory=lambda: [2, 4, 6, 8, 10, 50, 100, 200, 400, 800, 1000, 1400, 2000, 5000, 10000, 15000]
    )  # reference default explicit bounds (ms), config.go histogram defaults

    def bucket_label(self, dur: Column) -> Column:
        expr = None
        for b in sorted(self.buckets):
            c = dur <= b
            lbl = F.lit(f"{b:g}")
            expr = F.when(c, lbl) if expr is None else expr.when(c, lbl)
        return expr.otherwise(F.lit("+Inf"))

    def __call__(self, df: DataFrame) -> DataFrame:
        dur = F.col(self.duration_col).cast("double")
        rows = df.filter(dur.isNotNull()).select(
            *self.dimensions, self.bucket_label(dur).alias("le"), dur.alias("__d")
        )
        return (
            rows.groupBy(*self.dimensions, "le")
            .agg(
                F.count(F.lit(1)).alias("bucket_count"),
                F.sum("__d").alias("duration_sum"),
            )
        )
