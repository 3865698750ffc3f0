"""Metrics-state processors: running-state transforms per stream identity.

Reference semantics (SURVEY.md 2.5 metrics row):
- ``delta_to_cumulative`` (processor/deltatocumulativeprocessor/config.go:15-24):
  running sum of delta datapoints keyed by stream identity; ``max_stale``
  eviction is a streaming concern (watermark) — in batch nothing goes
  stale.
- ``cumulative_to_delta`` (processor/cumulativetodeltaprocessor/config.go:17):
  adjacent-point difference per stream; the first point of a stream has
  no predecessor and is dropped (the reference emits nothing until it
  has two points).
- ``delta_to_rate`` (processor/deltatorateprocessor/config.go:11):
  delta value divided by the elapsed seconds since the previous point.
- ``interval`` (processor/intervalprocessor/config.go:20-31): aggregate
  datapoints per tumbling interval per stream, keeping the LAST point
  (the reference forwards the most recent datapoint per interval).

All four are one-shuffle window/group operations: partitionBy(stream
identity) is the only exchange, ordering is within-partition. Skew: a
hot stream serializes its window — salt upstream if a single identity
exceeds a task (same posture as recombine).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


@dataclass
class DeltaToCumulative:
    """Running sum per stream. With ``start_col`` set, applies the
    reference accumulator's sample guards
    (deltatocumulativeprocessor/internal/delta/delta.go:28-57):

    - a sample whose start timestamp is OLDER than the series start
      (the first sample's start) belongs to a different process's
      series and is dropped;
    - among remaining samples sharing one timestamp, only the first
      arrival is accepted (``dp.Timestamp() <= aggr.Timestamp()`` is
      out-of-order) — arrival order is ``tiebreak_col``;
    - dropped samples never update state (guards are evaluated against
      accepted rows only), and gaps merely warn in the reference, so
      they pass through here.
    """

    value_col: str = "value"
    stream_keys: list[str] = field(default_factory=lambda: ["metric"])
    order_col: str = "ts"
    out_col: str = "cumulative"
    start_col: str | None = None
    tiebreak_col: str | None = None

    def __call__(self, df: DataFrame) -> DataFrame:
        if self.start_col is not None:
            tb = self.tiebreak_col or self.start_col
            w0 = (
                Window.partitionBy(*self.stream_keys)
                .orderBy(self.order_col, tb)
                .rowsBetween(Window.unboundedPreceding, Window.currentRow)
            )
            series_start = F.first(self.start_col).over(w0)
            df = (
                df.withColumn("__ok__", F.col(self.start_col) >= series_start)
                .filter(F.col("__ok__"))
                .drop("__ok__")
            )
            dup = F.row_number().over(
                Window.partitionBy(*self.stream_keys, self.order_col).orderBy(tb)
            )
            df = df.withColumn("__dup__", dup).filter(F.col("__dup__") == 1).drop(
                "__dup__"
            )
        w = (
            Window.partitionBy(*self.stream_keys)
            .orderBy(self.order_col)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        return df.withColumn(self.out_col, F.sum(self.value_col).over(w))


def _name_match(name: Column, patterns: list[str], match_type: str) -> Column:
    """filterset matcher (internal/filter/filterset): ``strict`` is exact
    name equality over the pattern list, ``regexp`` is UNANCHORED
    (`regexp.MatchString` — the reference's "_1" matches "metric_1")."""
    if match_type == "regexp":
        m = F.lit(False)
        for p in patterns:
            m = m | name.rlike(p)
        return m
    return name.isin(patterns)


@dataclass
class CumulativeToDelta:
    """Adjacent-point difference per stream, with the reference
    tracker's full datapoint semantics
    (processor/cumulativetodeltaprocessor/processor.go:processMetrics,
    internal/tracking MetricTracker.Convert — observable in
    processor_test.go:57-441):

    - the FIRST point of a stream initializes state and is dropped;
    - ``include``/``exclude`` metric matchers (strict | regexp,
      exclude wins) scope the conversion; out-of-scope metrics pass
      through UNCHANGED (still cumulative);
    - when ``monotonic_col`` is given, non-monotonic sums are out of
      scope, and a scoped value BELOW the previous one is a counter
      RESTART: the point is dropped but becomes the new reference;
    - a NaN value is emitted as a NaN delta but does NOT update the
      reference (the next delta is taken against the last valid value);
    - points flagged no-recorded-value (``novalue_col``) are dropped
      and ignored for state.

    With only the four basic fields set this degrades to the plain
    lag-diff (first point dropped), the oracle-gated batch shape.
    """

    value_col: str = "value"
    stream_keys: list[str] = field(default_factory=lambda: ["metric"])
    order_col: str = "ts"
    out_col: str = "delta"
    metric_col: str | None = None
    include: list[str] | None = None
    include_match: str = "strict"
    exclude: list[str] | None = None
    exclude_match: str = "strict"
    monotonic_col: str | None = None
    novalue_col: str | None = None

    def scope_expr(self) -> Column:
        scope = F.lit(True)
        if self.metric_col is not None:
            name = F.col(self.metric_col)
            if self.include is not None:
                scope = scope & _name_match(name, self.include, self.include_match)
            if self.exclude is not None:
                scope = scope & ~_name_match(name, self.exclude, self.exclude_match)
        if self.monotonic_col is not None:
            scope = scope & F.col(self.monotonic_col)
        return scope

    def __call__(self, df: DataFrame) -> DataFrame:
        scope = self.scope_expr()
        val = F.col(self.value_col)
        nan = F.isnan(val.cast("double"))
        novalue = (
            F.coalesce(F.col(self.novalue_col), F.lit(False))
            if self.novalue_col is not None
            else F.lit(False)
        )
        w = (
            Window.partitionBy(*self.stream_keys)
            .orderBy(self.order_col)
            .rowsBetween(Window.unboundedPreceding, -1)
        )
        # reference value = last scoped, non-NaN, recorded point
        prev = F.last(F.when(scope & ~novalue & ~nan, val), ignorenulls=True).over(w)
        out = (
            F.when(~scope, val)  # pass-through keeps the cumulative value
            .when(nan, val)
            .otherwise(val - prev)
        )
        emit = prev.isNotNull()
        if self.monotonic_col is not None:
            emit = emit & (val >= prev)  # below previous => restart, drop
        keep = (~scope) | (~novalue & (nan | emit))
        # window exprs are not allowed in a filter: materialize first
        return (
            df.withColumns({self.out_col: out, "__keep__": keep})
            .filter(F.col("__keep__"))
            .drop("__keep__")
        )


@dataclass
class CumulativeToDeltaHistogram:
    """Histogram twin of :class:`CumulativeToDelta`
    (processor_test.go:224-441 histogram cases): count, sum and every
    bucket count difference pointwise per stream; min/max are nulled on
    converted points (a delta histogram has no running extrema); a NaN
    sum is emitted as NaN without updating the sum reference while the
    count/bucket references still advance; absent (null) sums stay
    absent; no-value points are dropped and ignored for state."""

    count_col: str = "count"
    sum_col: str = "hsum"
    buckets_col: str = "buckets"
    min_col: str | None = None
    max_col: str | None = None
    stream_keys: list[str] = field(default_factory=lambda: ["metric"])
    order_col: str = "ts"
    metric_col: str | None = None
    include: list[str] | None = None
    include_match: str = "strict"
    exclude: list[str] | None = None
    exclude_match: str = "strict"
    novalue_col: str | None = None
    monotonic_col: str | None = None  # unused; histograms carry no monotonicity

    def __call__(self, df: DataFrame) -> DataFrame:
        scope = CumulativeToDelta.scope_expr(self)  # same matcher fields
        cnt = F.col(self.count_col)
        hsum = F.col(self.sum_col)
        bkts = F.col(self.buckets_col)
        nan_sum = F.isnan(hsum.cast("double"))
        novalue = (
            F.coalesce(F.col(self.novalue_col), F.lit(False))
            if self.novalue_col is not None
            else F.lit(False)
        )
        w = (
            Window.partitionBy(*self.stream_keys)
            .orderBy(self.order_col)
            .rowsBetween(Window.unboundedPreceding, -1)
        )
        recorded = scope & ~novalue
        prev_cnt = F.last(F.when(recorded, cnt), ignorenulls=True).over(w)
        prev_sum = F.last(
            F.when(recorded & hsum.isNotNull() & ~nan_sum, hsum), ignorenulls=True
        ).over(w)
        prev_bkts = F.last(F.when(recorded, bkts), ignorenulls=True).over(w)
        d_sum = F.when(nan_sum, hsum).otherwise(hsum - prev_sum)
        cols = {
            self.count_col: F.when(~scope, cnt).otherwise(cnt - prev_cnt),
            self.sum_col: F.when(~scope, hsum).otherwise(d_sum),
            self.buckets_col: F.when(~scope, bkts).otherwise(
                F.zip_with(bkts, prev_bkts, lambda x, y: x - y)
            ),
        }
        for c in (self.min_col, self.max_col):
            if c is not None:
                cols[c] = F.when(~scope, F.col(c))  # converted => null
        cols["__keep__"] = (~scope) | (~novalue & prev_cnt.isNotNull())
        return df.withColumns(cols).filter(F.col("__keep__")).drop("__keep__")


@dataclass
class DeltaToRate:
    """Delta datapoints -> per-second rates.

    Two modes:

    - default (windowless batch variant): rate = value / seconds since
      the PREVIOUS point of the stream (first point dropped) — the
      natural form when datapoints carry no start timestamp.
    - ``start_col`` set (reference-faithful,
      deltatorateprocessor/processor.go:96-103): rate = value /
      (timestamp - start_timestamp) of the SAME datapoint; a
      non-positive window yields rate 0, not a drop. ``metrics``
      scopes conversion to the named metrics (nil = convert NOTHING —
      the processor only touches configured metrics), and only DELTA
      temporality rows convert (``temporality_col``); everything else
      passes through unchanged with the original value.
    """

    value_col: str = "value"
    stream_keys: list[str] = field(default_factory=lambda: ["metric"])
    order_col: str = "ts"  # timestamp column
    out_col: str = "rate"
    start_col: str | None = None
    metrics: list[str] | None = None
    metric_col: str = "metric"
    temporality_col: str | None = None

    def __call__(self, df: DataFrame) -> DataFrame:
        # unix_micros keeps sub-second precision (unix_timestamp
        # truncates to seconds); NTZ columns cast through TIMESTAMP in
        # the session zone (pinned UTC)
        def epoch(c: Column) -> Column:
            return F.unix_micros(c.cast("timestamp")) / 1e6

        if self.start_col is not None:
            scope = F.lit(True)
            if self.metrics is not None:
                scope = F.col(self.metric_col).isin(self.metrics)
            else:
                scope = F.lit(False)  # processor.go: no configured metrics
            if self.temporality_col is not None:
                scope = scope & (F.col(self.temporality_col) == "delta")
            dur = epoch(F.col(self.order_col)) - epoch(F.col(self.start_col))
            rate = F.when(dur > 0, F.col(self.value_col) / dur).otherwise(0.0)
            return df.withColumn(
                self.out_col,
                F.when(scope, rate).otherwise(F.col(self.value_col)),
            )
        w = Window.partitionBy(*self.stream_keys).orderBy(self.order_col)
        prev_ts = F.lag(self.order_col).over(w)
        elapsed = epoch(F.col(self.order_col)) - epoch(prev_ts)
        rate = F.when(elapsed > 0, F.col(self.value_col) / elapsed)
        return (
            df.withColumn(self.out_col, rate)
            .filter(F.col(self.out_col).isNotNull())
        )


# fixed-width units -> microseconds (month/year are not fixed-width and
# only support a count of 1 via date_trunc)
_UNIT_US = {
    "second": 1_000_000,
    "minute": 60_000_000,
    "hour": 3_600_000_000,
    "day": 86_400_000_000,
    "week": 7 * 86_400_000_000,
}


@dataclass
class IntervalProcessor:
    """Keep the LAST datapoint per (stream, tumbling interval).

    ``interval`` supports arbitrary fixed-width durations ("15 minutes",
    "90 seconds", ...) like the reference's ``time.Duration`` config
    (default 60s): the bucket is floor(unix_micros / interval_us) *
    interval_us, NOT a date_trunc by unit — "15 minutes" must yield
    15-minute buckets, not per-minute ones.
    """

    interval: str = "1 hour"
    value_col: str = "value"
    stream_keys: list[str] = field(default_factory=lambda: ["metric"])
    order_col: str = "ts"
    tiebreak_col: str | None = None  # deterministic pick on equal timestamps
    # SQL predicate marking rows the reference emits IMMEDIATELY instead
    # of holding for the interval flush (processor.go:104-123: gauges,
    # summaries, non-monotonic sums, delta temporality). Passed-through
    # rows carry a null interval_start.
    passthrough: str | None = None

    def __post_init__(self):
        parts = self.interval.split()
        count = int(parts[0]) if len(parts) > 1 and parts[0].lstrip("-").isdigit() else 1
        unit = parts[-1].rstrip("s").lower()
        if unit in _UNIT_US:
            if count < 1:
                raise ValueError(f"interval count must be >= 1: {self.interval!r}")
            self._interval_us: int | None = count * _UNIT_US[unit]
            self._trunc_unit = None
        elif unit in ("month", "year"):
            if count != 1:
                raise ValueError(
                    f"{unit!r} intervals only support a count of 1 (got {self.interval!r})"
                )
            self._interval_us = None
            self._trunc_unit = unit
        else:
            raise ValueError(f"unsupported interval unit in {self.interval!r}")

    def __call__(self, df: DataFrame) -> DataFrame:
        if self.passthrough:
            p = F.coalesce(F.expr(self.passthrough), F.lit(False))
            passed = df.filter(p).withColumn(
                "interval_start", F.lit(None).cast("timestamp")
            )
            held = IntervalProcessor(
                interval=self.interval,
                value_col=self.value_col,
                stream_keys=self.stream_keys,
                order_col=self.order_col,
                tiebreak_col=self.tiebreak_col,
            )(df.filter(~p))
            return held.unionByName(passed)
        ts = F.col(self.order_col).cast("timestamp")
        if self._interval_us is not None:
            ius = F.lit(self._interval_us)
            bucket = F.timestamp_micros(
                (F.floor(F.unix_micros(ts) / ius) * ius).cast("long")
            )
        else:
            bucket = F.date_trunc(self._trunc_unit, ts)
        order = [F.col(self.order_col).desc()]
        if self.tiebreak_col:
            order.append(F.col(self.tiebreak_col).desc())
        w = Window.partitionBy(*self.stream_keys, "__bucket").orderBy(*order)
        return (
            df.withColumn("__bucket", bucket)
            .withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .drop("__rn")
            .withColumnRenamed("__bucket", "interval_start")
        )
