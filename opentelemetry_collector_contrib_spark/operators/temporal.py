"""Temporal join/rollup operators: as-of join and hypertable rollup.

Two operators Spark's DataFrame API lacks as primitives but a log /
training pipeline needs constantly:

* ``join_asof`` — "for each fact row, the most recent timeline row
  at-or-before it, per key" (pandas ``merge_asof`` / DuckDB ``ASOF
  JOIN`` / kdb ``aj``). The naive formulation is an inequality join —
  ``BroadcastNestedLoopJoin`` or worse at scale. This one is the
  union-tag trick: tag both sides, sort once inside a per-key window,
  and carry the last non-null timeline payload forward with
  ``last(..., ignorenulls=True)``. ONE shuffle on the key, zero
  inequality joins, linear in rows.

* ``hypertable_rollup`` — a TimescaleDB-style continuous aggregate:
  the same input aggregated at several time grains (hour/day/...) in a
  SINGLE scan via GROUPING SETS. The Expand operator multiplies rows
  by the number of grains, but map-side partial aggregation caps every
  partition's shuffle output at (#buckets-in-range x #dims) rows — the
  output is sized by the time range and grain, never by the input row
  count. That is what makes a 100 TB -> dashboard rollup one pass.

Reference parity: the collector has no temporal-join processor; these
are the training/analytics extensions the task brief names ("as-of
join, range join, hypertable rollup"). Determinism contract matches
the rest of the repo: ties inside the timeline are broken by an
explicit total order (never Spark's ambient row order), and float
aggregation is scaled-integer before the sum so the result is
partition-order-proof (same posture as ``training/textstats.py``).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def join_asof(
    left: DataFrame,
    right: DataFrame,
    key_col: str,
    ts_col: str,
    value_cols: Sequence[str],
    prefix: str = "ref_",
    tolerance_seconds: int | None = None,
) -> DataFrame:
    """As-of join: every ``left`` row gains the ``value_cols`` of the
    ``right`` row with the greatest ``ts_col`` <= the left row's
    ``ts_col`` for the same ``key_col`` (inclusive, "backward"
    direction — DuckDB ``ASOF JOIN ON l.ts >= r.ts`` semantics).
    Unmatched left rows keep nulls. Output = all left columns plus one
    ``{prefix}{name}`` column per value col and ``{prefix}ts``.

    Semantics pinned down for oracle parity:

    * right rows with a null ``ts_col`` never match (a timeline entry
      without a time is not "before" anything) — they are dropped from
      the timeline up front. Left rows with a null ``ts_col`` match
      nothing and come through with null refs (DuckDB: ``l.ts >= r.ts``
      is never true for null).
    * right rows with a null ``key_col`` never match either: SQL's
      ``l.key = r.key`` is never true for null, but a window
      ``partitionBy`` groups null WITH null — so null-key timeline
      rows are dropped up front, and a null-key fact row comes through
      with null refs (its partition holds no timeline rows).
    * duplicate right rows at the same (key, ts) would make "the most
      recent row" ambiguous (DuckDB picks arbitrarily); callers must
      pre-aggregate the timeline to one row per (key, ts) — e.g.
      ``max_by`` a tiebreak id — exactly as the oracle twin does.
    * ``tolerance_seconds`` (pandas ``merge_asof(tolerance=...)``):
      matches older than the window are nulled AFTER the scan, so the
      plan is unchanged.

    Plan shape: unionByName (map-only) -> one Exchange on ``key_col``
    -> one in-partition sort by (ts, side) -> running ``last(...,
    ignorenulls=True)``. The window frame is unbounded-preceding ->
    current-row over a PER-KEY partition, so there is no whole-frame
    materialization and no cross-key skew coupling; a hot key costs
    one sorted partition, same as any per-key window op. Compare the
    naive ``l JOIN r ON l.key = r.key AND l.ts >= r.ts`` + rank: that
    intermediate is |l_k| x |r_k| per key — quadratic on the hot key.
    """
    payload = F.struct(
        F.col(ts_col).alias("ts"), *[F.col(c).alias(c) for c in value_cols]
    )
    timeline = right.filter(
        F.col(ts_col).isNotNull() & F.col(key_col).isNotNull()
    ).select(
        F.col(key_col),
        F.col(ts_col).alias("__ts"),
        F.lit(0).alias("__side"),
        payload.alias("__r"),
        F.lit(None).cast(_row_struct_type(left)).alias("__l"),
    )
    facts = left.select(
        F.col(key_col),
        F.col(ts_col).alias("__ts"),
        F.lit(1).alias("__side"),
        F.lit(None).cast(timeline.schema["__r"].dataType).alias("__r"),
        F.struct(*[F.col(c) for c in left.columns]).alias("__l"),
    )
    # asc_nulls_first on __ts: a null-ts fact sorts before every
    # timeline row, so its running last() is null — the oracle's
    # never-true inequality, by construction. Equal (key, ts): the
    # timeline row (__side 0) sorts before the fact (__side 1) ->
    # inclusive at-or-before. Callers deduplicate the timeline per
    # (key, ts), so (key, __ts, __side) is a total order of the rows
    # that matter and the window is run-to-run deterministic.
    w = (
        Window.partitionBy(key_col)
        .orderBy(F.asc_nulls_first("__ts"), F.asc("__side"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = (
        facts.unionByName(timeline)
        .withColumn("__m", F.last("__r", ignorenulls=True).over(w))
        .filter(F.col("__side") == 1)
    )
    if tolerance_seconds is not None:
        in_tol = F.col("__m.ts") >= F.col("__ts") - F.expr(
            f"INTERVAL {int(tolerance_seconds)} SECONDS"
        )
        matched = matched.withColumn(
            "__m", F.when(in_tol, F.col("__m"))
        )
    return matched.select(
        *[F.col(f"__l.{c}").alias(c) for c in left.columns],
        F.col("__m.ts").alias(f"{prefix}ts"),
        *[F.col(f"__m.{c}").alias(f"{prefix}{c}") for c in value_cols],
    )


def _row_struct_type(df: DataFrame):
    from pyspark.sql.types import StructType

    return StructType([df.schema[c] for c in df.columns])


def join_range(
    facts: DataFrame,
    intervals: DataFrame,
    key_col: str,
    ts_col: str,
    start_col: str,
    end_col: str,
    granularity_seconds: int = 3600,
    max_buckets_per_interval: int = 4096,
) -> DataFrame:
    """Range (interval) join: every ``facts`` row paired with every
    ``intervals`` row of the same ``key_col`` whose half-open window
    ``[start_col, end_col)`` contains the fact's ``ts_col``. Output =
    all fact columns + all non-key interval columns (inner join: facts
    in no interval drop; a fact inside k overlapping intervals emits k
    rows).

    Spark has no interval-join primitive; the naive
    ``ON l.key = r.key AND l.ts >= r.start AND l.ts < r.end`` plans as
    a key-equi join whose per-key intermediate is |facts_k| x
    |intervals_k| — quadratic on a hot key. This one is the bucketize
    trick (the same one ``processors/enrich.py`` uses for CIDR
    ranges): quantize time into ``granularity_seconds`` buckets,
    explode each interval into the buckets it covers, equi-join on
    (key, bucket) — a plain shuffled/broadcast hash join Catalyst and
    AQE handle like any other — then apply the exact containment
    predicate. A fact has exactly ONE bucket, so no post-join dedup is
    needed. Pick the granularity near the typical interval length:
    cost = facts + intervals x (length/granularity) exploded rows.

    Guardrails (same posture as the LSH ``max_bucket`` cap):

    * degenerate ``end <= start`` intervals match nothing and are
      dropped BEFORE the explode (Spark's ``sequence(a, b)`` counts
      DOWN when b < a — it would fabricate buckets).
    * an interval longer than ``max_buckets_per_interval`` x
      granularity is dropped (a year-long interval at 1 s granularity
      would explode to 31 M rows); at 100 TB pick the granularity so
      real intervals stay well under the cap. Null start/end/key
      intervals and null ts/key facts never match (bucket/containment
      predicates are null), mirroring the SQL inequality-join twin.
    """
    g = int(granularity_seconds)

    def _bucket(c: str) -> Column:
        # cast("timestamp") first: parquet may surface TIMESTAMP_NTZ and
        # unix_timestamp wants TimestampType (the cast is a session-tz
        # reinterpretation, ANSI-legal; a no-op for TimestampType)
        return F.floor(F.unix_timestamp(F.col(c).cast("timestamp")) / g)

    f_bucket = _bucket(ts_col)
    lo = _bucket(start_col)
    hi = _bucket(end_col)
    value_cols = [c for c in intervals.columns if c != key_col]
    iv = (
        intervals.filter(
            (F.col(end_col) > F.col(start_col))
            & ((hi - lo) < max_buckets_per_interval)
        )
        .select(
            F.col(key_col),
            F.explode(F.sequence(lo, hi)).alias("__bucket"),
            *[F.col(c).alias(f"__iv_{c}") for c in value_cols],
        )
    )
    out = facts.withColumn("__bucket", f_bucket).join(
        iv, [key_col, "__bucket"]
    )
    contained = (F.col(ts_col) >= F.col(f"__iv_{start_col}")) & (
        F.col(ts_col) < F.col(f"__iv_{end_col}")
    )
    return out.filter(contained).select(
        *facts.columns,
        *[F.col(f"__iv_{c}").alias(c) for c in value_cols],
    )


def hypertable_rollup(
    df: DataFrame,
    ts_col: str,
    grains: Sequence[tuple[str, str]],
    dims: Sequence[str],
    aggs: Sequence[Column],
) -> DataFrame:
    """Multi-grain time rollup in one scan: for each ``(label, unit)``
    in ``grains`` (unit = a ``date_trunc`` unit: ``'hour'``, ``'day'``,
    ...), aggregate ``aggs`` grouped by the truncated bucket plus
    ``dims``. Output columns: ``grain`` (the label), ``bucket``
    (truncated timestamp), ``*dims``, ``*aggs`` — the union of all
    grains, i.e. a TimescaleDB continuous-aggregate table.

    One scan, one Expand (x len(grains)), ONE exchange: partial
    aggregation runs before the shuffle, so each input partition emits
    at most (buckets-in-its-range x |dims-cardinality| x grains) rows
    however many input rows it holds. grouping_id() tells the output
    rows apart — never ``coalesce`` across bucket columns, which would
    conflate "not in this grouping set" with a genuinely null bucket
    (null ``ts_col`` rows roll up into a null bucket PER GRAIN, same
    as SQL GROUP BY).
    """
    bucket_cols = [f"__b_{label}" for label, _ in grains]
    # keep every source column (agg inputs resolve against them);
    # Catalyst prunes the unused ones out of the scan
    proj = df.select(
        "*",
        *[
            F.date_trunc(unit, F.col(ts_col)).alias(b)
            for b, (_, unit) in zip(bucket_cols, grains)
        ],
    )
    # grouping-column order is the grouping_id bit order (first column
    # = highest bit) — keep it an explicit list, never a set
    cols_list = [*bucket_cols, *dims]
    sets = [[b, *dims] for b in bucket_cols]
    agg = proj.groupingSets(sets, *[F.col(c) for c in cols_list]).agg(
        F.grouping_id().alias("__gid"), *aggs
    )
    agg_names = [c for c in agg.columns if c not in cols_list and c != "__gid"]
    n = len(cols_list)
    grain_expr, bucket_expr = None, None
    for b, (label, _) in zip(bucket_cols, grains):
        # grouping_id bit = 1 when the column is NOT in the row's set;
        # the row's grain is the single bucket column whose bit is 0
        bit = n - 1 - cols_list.index(b)
        in_set = F.shiftright(F.col("__gid"), bit).bitwiseAND(F.lit(1)) == 0
        grain_expr = (
            F.when(in_set, F.lit(label))
            if grain_expr is None
            else grain_expr.when(in_set, F.lit(label))
        )
        bucket_expr = (
            F.when(in_set, F.col(b))
            if bucket_expr is None
            else bucket_expr.when(in_set, F.col(b))
        )
    return agg.select(
        grain_expr.alias("grain"),
        bucket_expr.alias("bucket"),
        *dims,
        *agg_names,
    )
