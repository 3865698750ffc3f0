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

from ..envelope import try_element_at


# connector.go:39-41
METRIC_NAME_DURATION = "duration"
METRIC_NAME_CALLS = "calls"
METRIC_NAME_EVENTS = "events"

# the reserved buildKey dimensions (connector.go buildKey; they resolve
# from the standard span columns, not the attributes map)
DEFAULT_KEY_DIMENSIONS = ("service.name", "span.name", "span.kind", "status.code")


def build_metric_name(namespace: str, name: str) -> str:
    """connector.go:588-593 — ``ns.name`` when a namespace is set."""
    return f"{namespace}.{name}" if namespace else name


def explicit_bucket_label(value: Column, bounds: list[float], to_native=None):
    """Shared explicit-bounds CASE bucketer (spanmetrics histogram +
    servicegraph latency buckets use the identical chain; one copy so
    fixes cannot diverge). ``to_native`` maps a float bound into the
    value column's unit (e.g. seconds -> integer micros)."""
    if not bounds:
        raise ValueError("explicit histogram buckets must not be empty")
    expr = None
    for b in sorted(bounds):
        c = value <= (to_native(b) if to_native else b)
        lbl = F.lit(f"{b:g}")
        expr = F.when(c, lbl) if expr is None else expr.when(c, lbl)
    return expr.otherwise(F.lit("+Inf"))


@dataclass
class SpanMetricsConnector:
    duration_col: str                      # numeric duration (e.g. ms)
    dimensions: list[str] = field(default_factory=list)
    buckets: list[float] = field(
        default_factory=lambda: [2, 4, 6, 8, 10, 50, 100, 200, 400, 800, 1000, 1400, 2000, 5000, 10000, 15000]
    )  # reference default explicit bounds (ms), config.go histogram defaults
    histogram: str = "explicit_buckets"    # explicit_buckets | exponential
    scale: int = 0                         # exponential mode: OTel scale
    # config.go:79-80 Namespace, :61 ExcludeDimensions (may name the
    # reserved key dims, TestBuildKeyExcludeDimensionsAll), Dimensions
    # defaults (dimension.value fallback, TestBuildKeyWithDimensions)
    namespace: str = ""
    exclude_dimensions: list[str] = field(default_factory=list)
    dimension_defaults: dict[str, str] = field(default_factory=dict)

    def __post_init__(self):
        if self.histogram not in ("explicit_buckets", "exponential"):
            raise ValueError(f"unknown histogram mode {self.histogram!r}")
        if self.histogram == "explicit_buckets" and not self.buckets:
            raise ValueError("explicit_buckets needs a non-empty buckets list")
        # config.go validateDimensions: configured dimensions must not
        # collide with the reserved key dimensions (after sanitizing,
        # 'service.name' would alias the same output column)
        reserved = {d.replace(".", "_") for d in DEFAULT_KEY_DIMENSIONS}
        dup = [
            d for d in self.dimensions if d.replace(".", "_") in reserved
        ]
        if dup:
            raise ValueError(f"dimensions duplicate reserved keys: {dup}")
        # ...and must be unique among themselves after sanitizing:
        # validateDimensions (config.go:173-185) also rejects duplicate
        # configured dimensions — 'http.method' and 'http_method' would
        # silently alias one output column here otherwise
        seen: set[str] = set()
        for d in self.dimensions:
            s = d.replace(".", "_")
            if s in seen:
                raise ValueError(
                    f"duplicate dimension {d!r} (sanitized name {s!r} "
                    "collides with an earlier configured dimension)"
                )
            seen.add(s)

    def metric_names(self) -> dict[str, str]:
        return {
            k: build_metric_name(self.namespace, k)
            for k in (METRIC_NAME_CALLS, METRIC_NAME_DURATION, METRIC_NAME_EVENTS)
        }

    def bucket_label(self, dur: Column) -> Column:
        return explicit_bucket_label(dur, self.buckets)

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
        # (config.go Dimensions: span attribute else resource attribute
        # else the configured default): top-level column first, else the
        # attributes map, else the default
        if name in df.columns:
            expr = F.col(name)
        elif "attributes" in df.columns:
            expr = try_element_at(F.col("attributes"), name)
        else:
            expr = F.lit(None).cast("string")
        default = self.dimension_defaults.get(name)
        if default is not None:
            expr = F.coalesce(expr, F.lit(default))
        # dotted attribute names (the normal OTel form) must sanitize in
        # the OUTPUT column or groupBy resolves them as struct fields
        return expr.alias(name.replace(".", "_"))

    def _key_dims(self, df: DataFrame) -> tuple[list[Column], list[str]]:
        """Reserved key dims (minus exclusions) + configured dims."""
        wanted = [
            d for d in (*DEFAULT_KEY_DIMENSIONS, *self.dimensions)
            if d not in self.exclude_dimensions
        ]
        cols, names = [], []
        for d in wanted:
            # reserved dims read the standard span columns when present
            std = d.replace(".", "_")
            if d in DEFAULT_KEY_DIMENSIONS and std in df.columns:
                cols.append(F.col(std).alias(std))
                names.append(std)
            elif d in DEFAULT_KEY_DIMENSIONS:
                continue  # reserved dim without a standard column
            else:
                cols.append(self._dim(df, d))
                names.append(d.replace(".", "_"))
        return cols, names

    def calls(self, df: DataFrame) -> DataFrame:
        """The ``calls`` monotonic sum (connector.go:296-299): one count
        per key — the same single-scan map-side-combined aggregation."""
        cols, names = self._key_dims(df)
        return (
            df.select(*cols)
            .groupBy(*names)
            .agg(F.count(F.lit(1)).alias("calls"))
            .withColumn(
                "metric_name",
                F.lit(build_metric_name(self.namespace, METRIC_NAME_CALLS)),
            )
        )

    def __call__(self, df: DataFrame) -> DataFrame:
        # histogram keys on the SAME buildKey as calls(): reserved dims
        # (service/span.name/kind/status, minus exclusions) + configured
        # dims — the reference keys both metrics identically
        # (connector.go buildKey); keying on configured dims alone
        # merged every service/span into one bucket series
        dur = F.col(self.duration_col).cast("double")
        dims, names = self._key_dims(df)
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
