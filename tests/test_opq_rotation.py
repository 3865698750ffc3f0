"""OPQ-style structured rotation (Hadamard · sign-diagonal / sqrt(dim))
and its IVF-PQ composition (`ann_opq_topk`).
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from opentelemetry_collector_contrib_spark.training import (
    rotate_vectors,
    rotation_masks,
    rotation_matrix,
)


def test_rotation_is_orthogonal():
    for dim in (16, 64):
        R = rotation_matrix(dim)
        for i in range(dim):
            for k in range(i, dim):
                dot = sum(R[i][j] * R[k][j] for j in range(dim))
                assert abs(dot - (1.0 if i == k else 0.0)) < 1e-12


def test_entries_are_exact_binary_scale():
    # dim 64: every entry is +-0.125, an exact power of two — the
    # rotation's multiplies introduce no rounding
    assert {abs(x) for row in rotation_matrix(64) for x in row} == {0.125}


def test_masks_match_matrix_and_are_signed_64bit():
    masks, R = rotation_masks(64), rotation_matrix(64)
    for i, m in enumerate(masks):
        assert -(1 << 63) <= m < (1 << 63)
        for j in range(64):
            assert ((m >> j) & 1) == (1 if R[i][j] < 0 else 0)


def test_invalid_dims_raise():
    for dim in (0, 3, 48, 128):
        with pytest.raises(ValueError):
            rotation_masks(dim)


def test_rotate_preserves_norm_and_maps_basis_to_columns(spark):
    dim = 16
    rows = [(0, [1.0] + [0.0] * (dim - 1)), (1, [float(j) for j in range(dim)])]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = {
        r["vec_id"]: r["rot"]
        for r in rotate_vectors(df, dim=dim, out_col="rot").collect()
    }
    R = rotation_matrix(dim)
    # e_0 rotates to column 0 of R, exactly (the scale is 0.25, exact)
    assert out[0] == [R[i][0] for i in range(dim)]
    # norms preserved (orthogonality, float tolerance for the sums)
    for vid, vec in rows:
        n_in = math.sqrt(sum(x * x for x in vec))
        n_out = math.sqrt(sum(x * x for x in out[vid]))
        assert abs(n_in - n_out) < 1e-9 * max(1.0, n_in)


def test_rotation_plan_is_pure_projection(spark):
    df = spark.createDataFrame(
        [(0, [0.0] * 64)], "vec_id long, embedding array<double>"
    )
    plan = (
        rotate_vectors(df)._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan


def test_query_matches_oracle_sf0001(spark, duck, sf_dir):
    import __spark_entry__ as e
    from tests.conftest import assert_frames_equal

    spk = e.queries()["ann_opq_topk"](spark, sf_dir)
    orc = duck.sql(e.oracle_sql()["ann_opq_topk"])
    assert_frames_equal(spk, orc, float_cols=("adc",))
