"""Exponential-histogram bucket algebra + delta->cumulative accumulation.

Reference: processor/deltatocumulativeprocessor/internal/data/expo —
- scale.go:42-57 (Downscale/Collapse): one scale step merges adjacent
  bucket PAIRS aligned to absolute index 0 (odd offsets shift left by
  one first), halving the offset; the freed tail is zeroed in place.
- merge.go:12-36 (Merge): same-scale bucket arrays add over the union
  index range [min(lower), max(upper)).
- zero.go:14-42 (WidenZero): raising the zero threshold folds every
  bucket whose upper bound is <= the new threshold into the zero count
  and slices the bucket array to start right after; the threshold
  rounds UP to the folded bucket's upper bound.
- scale.go:13-27 (Scale.Idx): bucket index of a value v is
  floor(log2(v) * 2^scale), with the power-of-two special case.

Buckets are columnar as ``(offset int, counts array<long>)`` — the
pdata shape. ``collapse``/``downscale`` are DataFrame-level by design
(see collapse's docstring for the PySpark lambda hazard that forces
staged columns); the rest are Column expressions.

The KEY scale identity that makes accumulation columnar: collapsing k
scale steps maps absolute index i to floor(i / 2^k) (pairwise sums
applied k times == grouping by the k-bit-shifted index). So aligning a
mixed-scale stream to its minimum scale needs NO iterative merging —
:class:`DeltaToCumulativeExpo` explodes buckets to (stream, aligned
absolute index, count) rows, runs ONE running-sum window per
(stream, index), and reassembles arrays with one grouped sort — a
fixed five-exchange pipeline regardless of scale spread (audited in
the class docstring), never a data-dependent per-pair merge loop.
That is the 100 TB restatement of the reference's per-stream
in-memory Merge loop.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..envelope import try_element_at


def scale_idx(value: float, scale: int) -> int:
    """Python twin of scale.go Scale.Idx (driver-side: thresholds are
    config constants)."""
    frac, exp = math.frexp(value)
    if frac == 0.5:
        return ((exp - 1) << scale) - 1 if scale >= 0 else ((exp - 1) >> -scale) - 1
    scale_factor = math.ldexp(math.log2(math.e), scale)
    return math.floor(math.log(value) * scale_factor)


def scale_bounds(index: int, scale: int) -> tuple[float, float]:
    """(min, max] bounds of the bucket at ``index`` (scale.go:31-40)."""
    inv = math.ldexp(math.log(2), -scale)
    return math.exp(index * inv), math.exp((index + 1) * inv)


def collapse(
    df: DataFrame,
    offset_col: str,
    counts_col: str,
    steps: int = 1,
) -> DataFrame:
    """``steps`` downscale steps (scale.go Collapse/Downscale) applied
    to ``(offset_col, counts_col)`` in place, padding-preserving like
    the reference: the output array keeps the input length with the
    freed tail zeroed, and the offset halves per step (Go's Collapse
    has no empty guard — empty buckets still halve their offset).

    This is a DataFrame-level operation BY DESIGN: every intermediate
    the pair-sum lambda shares with sibling expressions (the padded
    array, the pair count, the pair array) is MATERIALIZED as a staged
    column first, so the lambda's outer references are plain attribute
    references. Classic PySpark 4.1 names every lambda's variables
    ``x, y, z`` (functions/builtin.py _create_lambda) and complex
    subtrees shared between a lambda body and sibling expressions in
    one Project can evaluate INCONSISTENTLY (session-order-dependent;
    observed as parity inversion of the odd-offset shift). Each staged
    alias is used at least twice downstream, so CollapseProject keeps
    it (see SURVEY expression notes). tests/test_golden_expo.py pins
    this with a 99-shape property sweep selecting both columns.

    Deliberate deviation: for an ODD offset with an EVEN bucket count,
    scale.go:86-90 sizes the output at len/2 and silently drops the
    last (shifted) bucket's observations; we emit the extra pair so no
    count is ever lost (the reference goldens never exercise that
    combination)."""
    if steps < 0:
        raise ValueError("steps must be >= 0")
    offset, counts = F.col(offset_col), F.col(counts_col)
    for _ in range(steps):
        # stage 1: the zero-padded pair grid (odd offsets shift left by
        # one) and the pair count, materialized so the lambda below
        # only touches attributes
        df = df.withColumns(
            {
                # least(n, 1) zeroes the pad for EMPTY buckets, which
                # must stay empty (Go's loop body never runs)
                "__cp_pad__": F.concat(
                    F.array_repeat(
                        F.lit(0).cast("long"),
                        F.abs(offset % 2) * F.least(F.size(counts), F.lit(1)),
                    ),
                    counts,
                ),
                "__cp_n__": F.size(counts),
                "__cp_off__": F.floor((offset - F.abs(offset % 2)) / 2).cast("int"),
            }
        )
        pad = F.col("__cp_pad__")
        half = F.floor((F.size(pad) + 1) / 2).cast("int")
        df = df.withColumn("__cp_half__", half)
        h = F.col("__cp_half__")
        # q = 0..half: pair q sums 1-based positions 2q+1, 2q+2; the
        # q=half probe lands past the array and must yield null (sliced
        # away below) — try_element_at keeps that true under ANSI mode,
        # where element_at would throw INVALID_ARRAY_INDEX_IN_ELEMENT_AT
        # on empty/short count arrays (driver sessions run ANSI-on).
        df = df.withColumn(
            "__cp_pairs__",
            F.slice(
                F.transform(
                    F.sequence(F.lit(0), h),
                    lambda q: (
                        try_element_at(pad, q * 2 + 1)
                        + F.coalesce(try_element_at(pad, q * 2 + 2), F.lit(0))
                    ).cast("long"),
                ),
                1,
                h,
            ),
        )
        pairs = F.col("__cp_pairs__")
        df = df.withColumns(
            {
                offset_col: F.col("__cp_off__"),
                counts_col: F.concat(
                    pairs,
                    F.array_repeat(
                        F.lit(0).cast("long"), F.col("__cp_n__") - F.size(pairs)
                    ),
                ),
            }
        ).drop("__cp_pad__", "__cp_n__", "__cp_off__", "__cp_half__", "__cp_pairs__")
        offset, counts = F.col(offset_col), F.col(counts_col)
    return df


def downscale(
    df: DataFrame,
    offset_col: str,
    counts_col: str,
    from_scale: int,
    to_scale: int,
) -> DataFrame:
    """scale.go Downscale: repeated Collapse, unrolled driver-side
    (scales are config/plan constants). Upscaling is an error."""
    if from_scale < to_scale:
        raise ValueError(
            f"cannot upscale without introducing error ({from_scale} -> {to_scale})"
        )
    return collapse(df, offset_col, counts_col, steps=from_scale - to_scale)


def merge_expr(
    a_off: Column, a_cnt: Column, b_off: Column, b_cnt: Column
) -> tuple[Column, Column]:
    """merge.go Merge: same-scale union-range addition; empty sides
    pass the other through."""
    lo = F.least(a_off, b_off)
    up = F.greatest(a_off + F.size(a_cnt), b_off + F.size(b_cnt))

    def at(off, cnt, i):
        pos = i - off + 1  # element_at is 1-based
        return F.when(
            (pos >= 1) & (pos <= F.size(cnt)), try_element_at(cnt, pos)
        ).otherwise(F.lit(0))

    merged = F.transform(
        F.sequence(lo, up - 1), lambda i: (at(a_off, a_cnt, i) + at(b_off, b_cnt, i)).cast("long")
    )
    out_off = (
        F.when(F.size(b_cnt) == 0, a_off)
        .when(F.size(a_cnt) == 0, b_off)
        .otherwise(lo)
        .cast("int")
    )
    out_cnt = (
        F.when(F.size(b_cnt) == 0, a_cnt).when(F.size(a_cnt) == 0, b_cnt).otherwise(merged)
    )
    return out_off, out_cnt


def widen_zero_exprs(
    scale: int,
    width: float,
    zero_count: Column,
    pos_off: Column,
    pos_cnt: Column,
    neg_off: Column = None,
    neg_cnt: Column = None,
) -> dict[str, Column]:
    """zero.go WidenZero for a CONFIG threshold ``width``: the folded
    index and the rounded-up output threshold are Python constants;
    folding + slicing are columnar. Returns {zero_count, zero_threshold,
    pos_offset, pos_counts[, neg_offset, neg_counts]}. A non-positive
    width is the reference's width == ZeroThreshold() no-op."""
    if width <= 0:
        out = {
            "zero_count": zero_count.cast("long"),
            "zero_threshold": F.lit(0.0),
            "pos_offset": pos_off.cast("int"),
            "pos_counts": pos_cnt,
        }
        if neg_off is not None:
            out["neg_offset"] = neg_off.cast("int")
            out["neg_counts"] = neg_cnt
        return out
    zero = scale_idx(width, scale)  # largest bucket index inside the width
    _, new_zt = scale_bounds(zero, scale)

    def fold(off, cnt):
        # sum of counts with absolute index <= zero
        upto = F.least(F.greatest(F.lit(zero) + 1 - off, F.lit(0)), F.size(cnt))
        folded = F.aggregate(
            F.slice(cnt, 1, upto.cast("int")), F.lit(0).cast("long"), lambda a, x: a + x
        )
        # slice to [clamp(zero+1, lower, upper), upper)
        lo = F.least(F.greatest(F.lit(zero) + 1, off), off + F.size(cnt))
        new_cnt = F.slice(cnt, (lo - off + 1).cast("int"), (off + F.size(cnt) - lo).cast("int"))
        return folded, lo.cast("int"), new_cnt

    pf, plo, pcnt = fold(pos_off, pos_cnt)
    out = {
        "zero_count": (zero_count + pf).cast("long"),
        "zero_threshold": F.lit(float(new_zt)),
        "pos_offset": plo,
        "pos_counts": pcnt,
    }
    if neg_off is not None:
        nf, nlo, ncnt = fold(neg_off, neg_cnt)
        out["zero_count"] = (zero_count + pf + nf).cast("long")
        out["neg_offset"] = nlo
        out["neg_counts"] = ncnt
    return out


@dataclass
class DeltaToCumulativeExpo:
    """Accumulate delta exponential-histogram datapoints into cumulative
    ones per stream, aligning mixed scales to the stream's MINIMUM scale
    (the reference downscales pairwise to min(a, b); the running result
    after point k is therefore at min(scale_1..k) — we emit every point
    at the stream min, which equals the reference for every point where
    the minimum has already been reached, and is the scale every
    reference stream converges to).

    Plan: one window for the stream-min scale, one explode to
    (stream, ts, floor-aligned absolute index, count) rows, then a
    dense (datapoint x seen-index) grid per stream — an index seen at
    ts_k must appear in every cumulative point at ts >= ts_k even when
    that datapoint's delta doesn't touch it, and the grid is exactly
    the size of the OUTPUT (each cumulative point carries its full
    bucket range), so this is materializing the answer, not blowup —
    one running sum per (stream, index), one grouped reassembly. Zero
    counts accumulate alongside. No data-dependent iteration anywhere.

    Plan audit (sf0.01): 5 exchanges (min-scale window, per-(ts, idx)
    combine, idx-first agg, running-sum window, reassembly agg); the
    grid joins broadcast their small sides under AQE. The datapoint
    frame is scanned once per branch (points / exploded counts) — when
    the input is an expensive derivation rather than a parquet scan,
    persist() it first (same note as metrics_transform chaining).
    """

    stream_keys: list[str] = field(default_factory=lambda: ["metric"])
    order_col: str = "ts"
    scale_col: str = "scale"
    offset_col: str = "offset"
    counts_col: str = "counts"
    zero_col: str = "zero_count"

    def __call__(self, df: DataFrame) -> DataFrame:
        from pyspark.sql import Window

        keys = [F.col(k) for k in self.stream_keys]
        w_all = Window.partitionBy(*keys).rowsBetween(
            Window.unboundedPreceding, Window.unboundedFollowing
        )
        w_run = Window.partitionBy(*keys).orderBy(self.order_col).rowsBetween(
            Window.unboundedPreceding, 0
        )
        df = df.withColumns(
            {
                "__min_scale__": F.min(self.scale_col).over(w_all),
                "__zero_cum__": F.sum(self.zero_col).over(w_run),
            }
        )
        shift = F.pow(F.lit(2.0), (F.col(self.scale_col) - F.col("__min_scale__")))
        # explode to aligned absolute indices; empty arrays keep a
        # sentinel row so pointless streams still emit their datapoints
        pairs = F.transform(
            F.sequence(F.lit(1), F.greatest(F.size(self.counts_col), F.lit(1))),
            lambda p: F.struct(
                F.when(
                    p <= F.size(self.counts_col),
                    F.floor((F.col(self.offset_col) + p - 1) / shift).cast("int"),
                ).alias("idx"),
                F.coalesce(try_element_at(self.counts_col, p.cast("int")), F.lit(0))
                .cast("long")
                .alias("cnt"),
            ),
        )
        ex = df.select(
            *self.stream_keys,
            self.order_col,
            "__min_scale__",
            "__zero_cum__",
            F.explode(pairs).alias("__p__"),
        ).select(
            *self.stream_keys,
            self.order_col,
            "__min_scale__",
            "__zero_cum__",
            F.col("__p__.idx").alias("__idx__"),
            F.col("__p__.cnt").alias("__cnt__"),
        )
        # collapse duplicate aligned indices within one datapoint
        idx_cnt = (
            ex.filter(F.col("__idx__").isNotNull())
            .groupBy(*self.stream_keys, self.order_col, "__idx__")
            .agg(F.sum("__cnt__").alias("__cnt__"))
        )
        # an index seen at ts_k appears in every cumulative point from
        # ts_k on: grid = datapoints x indices-already-seen
        idx_first = idx_cnt.groupBy(*self.stream_keys, "__idx__").agg(
            F.min(self.order_col).alias("__first_ts__")
        )
        points = df.select(
            *self.stream_keys, self.order_col, "__min_scale__", "__zero_cum__"
        )
        grid = points.join(idx_first, self.stream_keys).filter(
            F.col(self.order_col) >= F.col("__first_ts__")
        )
        filled = grid.join(
            idx_cnt, [*self.stream_keys, self.order_col, "__idx__"], "left"
        ).withColumn("__cnt0__", F.coalesce("__cnt__", F.lit(0)))
        w_idx = (
            Window.partitionBy(*keys, F.col("__idx__"))
            .orderBy(self.order_col)
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        filled = filled.withColumn("__cum__", F.sum("__cnt0__").over(w_idx))
        assembled = (
            filled.groupBy(*self.stream_keys, self.order_col)
            .agg(
                F.first("__min_scale__").alias("scale_out"),
                F.first("__zero_cum__").alias("zero_cum"),
                F.sort_array(
                    F.collect_list(
                        F.struct(F.col("__idx__").alias("idx"), F.col("__cum__").alias("cnt"))
                    )
                ).alias("__cells__"),
            )
        )
        # datapoints whose stream saw no bucket yet (all-empty prefixes)
        # still emit: restore them with an empty cell list
        assembled = points.join(
            assembled.drop("scale_out", "zero_cum"),
            [*self.stream_keys, self.order_col],
            "left",
        ).select(
            *self.stream_keys,
            self.order_col,
            F.col("__min_scale__").alias("scale_out"),
            F.col("__zero_cum__").alias("zero_cum"),
            F.coalesce(
                "__cells__", F.array().cast("array<struct<idx:int,cnt:bigint>>")
            ).alias("__cells__"),
        )
        # rebuild (offset, counts) over the dense [min_idx, max_idx]
        # range. ONE lambda, no when() around the HOF: empty cells
        # degrade via n_out = 0 and a slice, never via a conditional
        # (see collapse for the PySpark 4.1 lambda hazards this
        # formulation avoids).
        cells = F.col("__cells__")
        lo = F.coalesce(try_element_at(cells, F.lit(1)).getField("idx"), F.lit(0))
        hi = F.coalesce(
            # try_element_at: index 1 on an empty array is a plain null
            # in BOTH ANSI and legacy modes (plain element_at throws
            # under ANSI, which driver sessions enable)
            try_element_at(
                cells, F.greatest(F.size(cells), F.lit(1))
            ).getField("idx"),
            F.lit(-1),
        )
        n_out = F.greatest(hi - lo + 1, F.lit(0))
        dense = F.slice(
            F.transform(
                F.sequence(lo, lo + n_out),  # ascending even when empty
                lambda i: F.coalesce(
                    try_element_at(F.map_from_entries(cells), i.cast("int")),
                    F.lit(0),
                ).cast("long"),
            ),
            1,
            n_out,
        )
        return assembled.select(
            *self.stream_keys,
            self.order_col,
            "scale_out",
            "zero_cum",
            lo.cast("int").alias("offset_out"),
            dense.alias("counts_out"),
        )
