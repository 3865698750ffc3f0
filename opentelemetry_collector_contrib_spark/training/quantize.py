"""Embedding quantization for storage/serving-scale training pipelines.

``quantize_int8``: per-vector symmetric int8 quantization — the
standard ANN-index compression (scale = max|x| / 127, q_i =
round(x_i / scale) clamped to [-127, 127]). 4x smaller than float32
with ~0.2% cosine error at 64 dims; indexes quantize exactly this way
before sharding.

Zero-shuffle projection. Deterministic and DuckDB-lockstep by
construction: the rounding is floor(x/scale + 0.5) (identical halfway
behavior in any IEEE engine, unlike banker's rounding), the scale is
reported floor-scaled to 1e-9 fixed point, and an all-zero vector
quantizes to zeros with scale 0 instead of dividing by zero.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def quantize_int8(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """(id, scale_q9, qvec): ``scale_q9`` = floor(max|x|/127 * 1e9),
    ``qvec`` = per-element round-half-up(x/scale) clamped to ±127
    (int array). The vector column is materialized as a staged double
    array so the quantizing lambda only touches plain attributes (see
    processors/expo.py collapse for the PySpark lambda-sharing hazard
    this avoids)."""
    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    staged = df.withColumns(
        {
            "__qv__": v,
            "__scale__": F.array_max(F.transform(v, F.abs)) / F.lit(127.0),
        }
    )
    scale = F.col("__scale__")
    qvec = F.transform(
        F.col("__qv__"),
        lambda x: F.when(scale == 0, F.lit(0))
        .otherwise(
            F.least(
                F.greatest(F.floor(x / scale + F.lit(0.5)), F.lit(-127)),
                F.lit(127),
            )
        )
        .cast("int"),
    )
    return staged.select(
        F.col(id_col),
        F.floor(scale * 1e9).cast("bigint").alias("scale_q9"),
        qvec.alias("qvec"),
    )
