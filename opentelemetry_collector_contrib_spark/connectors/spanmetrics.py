"""spanmetrics-shaped connector: RED metrics from duration-bearing rows.

Reference: connector/spanmetricsconnector/config.go:35-83 — group by
(service, span.name, kind, status + configured dimensions), emit call
counts and a latency histogram per group, either ``explicit_buckets``
(default bounds) or ``exponential`` (base-2 scaled index buckets,
config.go HistogramConfig.Exponential).

Columnar restatement: one hash aggregation. The histogram is computed
long-format — one output row per (dims x bucket) with the bucket's
count. Explicit mode uses a CASE bucketer (deterministic, mergeable
across partitions — no percentile_approx); exponential mode computes
the OTel base-2 bucket index ``ceil(log2(v) * 2^scale) - 1`` per row
(data_model.md exponential histograms), also a pure projection, so both
modes are a single map-side-combined groupBy.
"""

from __future__ import annotations

import math
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
    histogram: str = "explicit_buckets"    # explicit_buckets | exponential
    scale: int = 0                         # exponential mode: OTel scale

    def __post_init__(self):
        if self.histogram not in ("explicit_buckets", "exponential"):
            raise ValueError(f"unknown histogram mode {self.histogram!r}")

    def bucket_label(self, dur: Column) -> Column:
        expr = None
        for b in sorted(self.buckets):
            c = dur <= b
            lbl = F.lit(f"{b:g}")
            expr = F.when(c, lbl) if expr is None else expr.when(c, lbl)
        return expr.otherwise(F.lit("+Inf"))

    def exp_index(self, dur: Column) -> Column:
        """OTel exponential-histogram bucket index at ``scale``: the
        bucket (idx] covers (base^idx, base^(idx+1)] with
        base = 2^(2^-scale); idx = ceil(log2(v) * 2^scale) - 1.
        Zero/negative durations land in the zero bucket (idx null)."""
        factor = float(1 << self.scale) if self.scale >= 0 else 1.0 / (1 << -self.scale)
        return F.when(
            dur > 0,
            F.ceil(F.log2(dur) * F.lit(factor)).cast("long") - 1,
        )

    def _dim(self, df: DataFrame, name: str) -> Column:
        # dimensions resolve like the reference's attribute lookup
        # (config.go Dimensions: span attribute else resource attribute):
        # top-level column first, else the attributes map
        if name in df.columns:
            return F.col(name).alias(name)
        if "attributes" in df.columns:
            return F.element_at(F.col("attributes"), name).alias(name)
        return F.lit(None).cast("string").alias(name)

    def __call__(self, df: DataFrame) -> DataFrame:
        dur = F.col(self.duration_col).cast("double")
        dims = [self._dim(df, d) for d in self.dimensions]
        names = list(self.dimensions)
        if self.histogram == "exponential":
            rows = df.filter(dur.isNotNull()).select(
                *dims,
                self.exp_index(dur).alias("bucket_idx"),
                dur.alias("__d"),
            )
            return rows.groupBy(*names, "bucket_idx").agg(
                F.count(F.lit(1)).alias("bucket_count"),
                F.sum("__d").alias("duration_sum"),
            )
        rows = df.filter(dur.isNotNull()).select(
            *dims, self.bucket_label(dur).alias("le"), dur.alias("__d")
        )
        return (
            rows.groupBy(*names, "le")
            .agg(
                F.count(F.lit(1)).alias("bucket_count"),
                F.sum("__d").alias("duration_sum"),
            )
        )
