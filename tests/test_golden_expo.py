"""Golden port of the deltatocumulative exponential-histogram algebra.

Tables transcribed from
processor/deltatocumulativeprocessor/internal/data/expo:
merge_test.go:18-47 (TestMerge), scale_test.go:19-49 (TestDownscale),
zero_test.go:18-63 (TestWidenZero). The ``bins`` notation is
expotest/bins.go: 8 slots covering absolute indices -3..4; the counts
are the contiguous non-empty run, the offset its first index.

Plus semantic tests for DeltaToCumulativeExpo (the columnar
accumulator: floor-shift scale alignment + dense running sums).
"""

from __future__ import annotations

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from opentelemetry_collector_contrib_spark.processors.expo import (
    DeltaToCumulativeExpo,
    collapse,
    downscale,
    merge_expr,
    scale_bounds,
    scale_idx,
    widen_zero_exprs,
)

EMPTY = None  # ø


def _bins(slots):
    """expotest.Bins.Into(): (offset, counts) from 8 slots at -3..4."""
    start = 0
    for i, v in enumerate(slots):
        if v is not EMPTY:
            start = i
            break
    end = len(slots)
    for i in range(start, len(slots)):
        if slots[i] is EMPTY:
            end = i
            break
    return start - 3, [int(v) for v in slots[start:end]]


class TestMerge:
    # merge_test.go:18-47
    CASES = [
        ([EMPTY] * 8, [EMPTY] * 8, [EMPTY] * 8),
        (
            [EMPTY, EMPTY, 1, 1, 1, EMPTY, EMPTY, EMPTY],
            [EMPTY, 1, 1, EMPTY, EMPTY, EMPTY, EMPTY, EMPTY],
            [EMPTY, 1, 2, 1, 1, EMPTY, EMPTY, EMPTY],
        ),
        (
            [EMPTY, EMPTY, EMPTY, EMPTY, 1, 1, 1, EMPTY],
            [EMPTY, EMPTY, EMPTY, EMPTY, 1, 1, 1, EMPTY],
            [EMPTY, EMPTY, EMPTY, EMPTY, 2, 2, 2, EMPTY],
        ),
        (
            [EMPTY, 1, 1, EMPTY, EMPTY, EMPTY, EMPTY, EMPTY],
            [EMPTY, EMPTY, EMPTY, EMPTY, 1, 1, EMPTY, EMPTY],
            [EMPTY, 1, 1, 0, 1, 1, EMPTY, EMPTY],
        ),
    ]

    @pytest.mark.parametrize("a,b,want", CASES)
    def test_merge(self, spark, a, b, want):
        ao, ac = _bins(a)
        bo, bc = _bins(b)
        wo, wc = _bins(want)
        df = spark.createDataFrame(
            [Row(ao=ao, ac=ac, bo=bo, bc=bc)],
            "ao int, ac array<long>, bo int, bc array<long>",
        )
        off, cnt = merge_expr(F.col("ao"), F.col("ac"), F.col("bo"), F.col("bc"))
        r = df.select(off.alias("o"), cnt.alias("c")).first()
        assert (r["o"], r["c"]) == (wo, wc)


class TestDownscale:
    # scale_test.go:19-49; each case is a chain of (scale, offset, counts)
    # reprs; collapse keeps the input length with a zeroed tail
    CASES = [
        [(2, 0, [1] * 12), (1, 0, [2] * 6), (0, 0, [4] * 3)],
        [(2, 1, [1] * 11), (1, 0, [1, 2, 2, 2, 2, 2]), (0, 0, [3, 4, 4])],
        [(2, 2, [1] * 10), (1, 1, [2] * 5), (0, 0, [2, 4, 4])],
        [(2, 4, [1] * 8), (1, 2, [2] * 4), (0, 1, [4, 4])],
        [(2, 0, [1] * 9), (1, 0, [2, 2, 2, 2, 1]), (0, 0, [4, 4, 1])],
        [(2, 0, [1] * 12), (0, 0, [4] * 3)],
    ]

    @pytest.mark.parametrize("chain", CASES)
    def test_downscale_chain(self, spark, chain):
        for (s_from, off, counts), (s_to, w_off, w_counts) in zip(chain, chain[1:]):
            df = spark.createDataFrame(
                [Row(o=off, c=counts)], "o int, c array<long>"
            )
            r = downscale(df, "o", "c", s_from, s_to).first()
            assert r["o"] == w_off
            got = r["c"]
            assert got[: len(w_counts)] == w_counts
            assert all(x == 0 for x in got[len(w_counts):]), got

    def test_upscale_raises(self, spark):
        df = spark.createDataFrame([Row(o=0, c=[1])], "o int, c array<long>")
        with pytest.raises(ValueError):
            downscale(df, "o", "c", 0, 2)

    def test_odd_offset_even_length_keeps_all_counts(self, spark):
        # deliberate deviation from scale.go:86-90, which drops the
        # last shifted bucket here (see collapse docstring)
        df = spark.createDataFrame(
            [Row(o=1, c=[10, 20, 30, 40])], "o int, c array<long>"
        )
        r = collapse(df, "o", "c").first()
        assert r["o"] == 0
        assert r["c"] == [10, 50, 40, 0]  # nothing lost

    def test_collapse_property_vs_python_reference(self, spark):
        # pins the PySpark 4.1 shared-subtree-in-lambda hazard: BOTH
        # columns selected together, every offset parity, many shapes
        def py_collapse(off, cnt):
            # Go's Collapse halves the offset even for empty buckets
            new_off = (off - abs(off) % 2) // 2
            if not cnt:
                return new_off, list(cnt)
            padded = ([0] + cnt) if off % 2 != 0 else list(cnt)
            pairs = [
                padded[j] + (padded[j + 1] if j + 1 < len(padded) else 0)
                for j in range(0, len(padded), 2)
            ]
            out = pairs + [0] * (len(cnt) - len(pairs))
            return new_off, out

        rows, want = [], {}
        rid = 0
        for off in range(-5, 6):
            for ln in range(0, 9):
                cnt = [(rid * 7 + i * 3) % 11 + 1 for i in range(ln)]
                rows.append(Row(rid=rid, o=off, c=cnt))
                want[rid] = py_collapse(off, cnt)
                rid += 1
        df = spark.createDataFrame(rows, "rid int, o int, c array<long>")
        got = {
            r["rid"]: (r["o"], list(r["c"]))
            for r in collapse(df, "o", "c").select("rid", "o", "c").collect()
        }
        for k, (w_off, w_cnt) in want.items():
            assert got[k] == (w_off, w_cnt), (k, got[k], (w_off, w_cnt))


class TestWidenZero:
    # zero_test.go:18-63 — hist has identical Positive and Negative
    # buckets (PosNeg), zero threshold Zt and zero count Zc
    def _run(self, spark, slots, zt, zc, width):
        off, counts = _bins(slots)
        df = spark.createDataFrame(
            [Row(zc=zc, po=off, pc=counts, no=off, nc=counts)],
            "zc long, po int, pc array<long>, no int, nc array<long>",
        )
        # scale 0 histograms throughout the reference table
        ex = widen_zero_exprs(
            0, width, F.col("zc"), F.col("po"), F.col("pc"), F.col("no"), F.col("nc")
        )
        return df.select(*[v.alias(k) for k, v in ex.items()]).first()

    def test_noop_empty(self, spark):
        r = self._run(spark, [EMPTY] * 8, zt=0.0, zc=0, width=0.0)
        assert r["zero_count"] == 0 and r["zero_threshold"] == 0.0
        assert r["pos_counts"] == [] and r["neg_counts"] == []

    def test_boundary_of_bucket_zero(self, spark):
        # zt 0 -> 2 (upper bound of bucket 0): fold indices <= 0
        r = self._run(
            spark, [EMPTY, EMPTY, 1, 2, 3, 4, 5, EMPTY], zt=0.0, zc=2, width=2.0
        )
        assert r["zero_threshold"] == 2.0
        assert r["zero_count"] == 2 + 2 * (1 + 2)
        assert (r["pos_offset"], r["pos_counts"]) == (1, [3, 4, 5])
        assert (r["neg_offset"], r["neg_counts"]) == (1, [3, 4, 5])

    def test_mid_bucket_rounds_up(self, spark):
        # width 3 lies inside bucket 1 -> threshold rounds up to 4
        r = self._run(
            spark, [EMPTY, EMPTY, 1, 2, 3, 4, 5, EMPTY], zt=0.0, zc=2, width=3.0
        )
        assert r["zero_threshold"] == 4.0
        assert r["zero_count"] == 2 + 2 * (1 + 2 + 3)
        assert (r["pos_offset"], r["pos_counts"]) == (2, [4, 5])

    def test_no_populated_buckets_in_range(self, spark):
        r = self._run(
            spark, [EMPTY, EMPTY, EMPTY, EMPTY, EMPTY, EMPTY, 1, 1], zt=1.0, zc=2, width=2.0
        )
        assert r["zero_threshold"] == 2.0 and r["zero_count"] == 2
        assert (r["pos_offset"], r["pos_counts"]) == (3, [1, 1])


class TestScaleMath:
    def test_idx_power_of_two_special_case(self):
        # scale.go:17-20 — frexp(2)=(0.5,2) => ((2-1)<<0)-1 = 0
        assert scale_idx(2.0, 0) == 0
        assert scale_idx(4.0, 0) == 1
        assert scale_idx(2.0, 1) == 1
        # (min,max] bounds: 0.5 is the UPPER edge of bucket -2
        assert scale_idx(0.5, 0) == -2

    def test_bounds_half_open(self):
        lo, hi = scale_bounds(0, 0)
        assert lo == pytest.approx(1.0) and hi == pytest.approx(2.0)


class TestDeltaToCumulativeExpo:
    def _run(self, spark, rows):
        df = spark.createDataFrame(
            rows,
            "metric string, ts int, scale int, offset int,"
            " counts array<long>, zero_count long",
        )
        out = DeltaToCumulativeExpo()(df)
        return {
            (r["metric"], r["ts"]): (
                r["scale_out"], r["zero_cum"], r["offset_out"], r["counts_out"]
            )
            for r in out.collect()
        }

    def test_mixed_scales_align_to_stream_min(self, spark):
        got = self._run(
            spark,
            [
                ("a", 1, 1, 2, [1, 1], 1),   # s1 idx 2,3 -> s0 idx 1 (x2)
                ("a", 2, 0, 0, [1], 0),      # s0 idx 0
                ("a", 3, 1, -2, [2], 2),     # s1 idx -2 -> s0 idx -1
            ],
        )
        assert got[("a", 1)] == (0, 1, 1, [2])
        assert got[("a", 2)] == (0, 1, 0, [1, 2])
        assert got[("a", 3)] == (0, 3, -1, [2, 1, 2])

    def test_empty_points_carry_state(self, spark):
        got = self._run(
            spark,
            [
                ("b", 1, 0, 0, [], 5),
                ("b", 2, 0, 7, [3], 0),
                ("b", 3, 0, 0, [], 1),   # carries idx 7 forward
            ],
        )
        assert got[("b", 1)] == (0, 5, 0, [])
        assert got[("b", 2)] == (0, 5, 7, [3])
        assert got[("b", 3)] == (0, 6, 7, [3])

    def test_gap_filling_dense_range(self, spark):
        got = self._run(
            spark,
            [
                ("c", 1, 0, -2, [1], 0),
                ("c", 2, 0, 3, [4], 0),  # union range -2..3 filled with 0s
            ],
        )
        assert got[("c", 2)] == (0, 0, -2, [1, 0, 0, 0, 0, 4])

    def test_streams_independent(self, spark):
        got = self._run(
            spark,
            [
                ("x", 1, 2, 8, [1], 0),  # s2 idx 8 -> own min scale 2
                ("y", 1, 0, 2, [9], 0),
            ],
        )
        assert got[("x", 1)] == (2, 0, 8, [1])
        assert got[("y", 1)] == (0, 0, 2, [9])


def test_merge_property_vs_python_reference(spark):
    """Multi-row both-column sweep over merge_expr (pins the PySpark
    4.1 lambda hazards for this tree shape too)."""
    def py_merge(ao, ac, bo, bc):
        if not bc:
            return ao, list(ac)
        if not ac:
            return bo, list(bc)
        lo, up = min(ao, bo), max(ao + len(ac), bo + len(bc))
        def at(off, cnt, i):
            j = i - off
            return cnt[j] if 0 <= j < len(cnt) else 0
        return lo, [at(ao, ac, i) + at(bo, bc, i) for i in range(lo, up)]

    rows, want = [], {}
    rid = 0
    for ao in (-4, -1, 0, 3):
        for la in (0, 1, 3):
            for bo in (-3, 0, 2):
                for lb in (0, 2, 4):
                    ac = [(rid + i) % 7 + 1 for i in range(la)]
                    bc = [(rid * 3 + i) % 5 + 1 for i in range(lb)]
                    rows.append(Row(rid=rid, ao=ao, ac=ac, bo=bo, bc=bc))
                    want[rid] = py_merge(ao, ac, bo, bc)
                    rid += 1
    df = spark.createDataFrame(
        rows, "rid int, ao int, ac array<long>, bo int, bc array<long>"
    )
    oo, cc = merge_expr(F.col("ao"), F.col("ac"), F.col("bo"), F.col("bc"))
    got = {
        r["rid"]: (r["o"], list(r["c"]))
        for r in df.select("rid", oo.alias("o"), cc.alias("c")).collect()
    }
    bad = [(k, got[k], want[k]) for k in want if got[k] != want[k]]
    assert not bad, bad[:5]
