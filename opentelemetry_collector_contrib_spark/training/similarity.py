"""Similarity search over an embedding column (array<float>).

- ``cosine_pairs``: exact near-duplicate pairs above a cosine threshold
  (self-join baseline; at scale, run inside LSH buckets instead of the
  full cross product).
- ``brute_force_topk``: exact top-k ANN baseline — queries are the
  SMALL side and are broadcast, so the corpus never shuffles; the
  per-query top-k is a windowed rank on (query, score).
- ``hyperplane_buckets``: random-hyperplane LSH (SimHash for vectors):
  sign bits of <v, plane_p> concatenated into a bucket key. Planes are
  deterministic integer-arithmetic literals so runs (and the DuckDB
  oracle) reproduce bit-identically. The scale path: groupBy bucket,
  then exact scoring within buckets only.

All dot products fold left-to-right over DOUBLE-cast elements, matching
DuckDB ``list_reduce`` evaluation for bit-identical float results.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _dot(a: Column, b: Column) -> Column:
    prods = F.zip_with(
        a, b, lambda x, y: x.cast("double") * y.cast("double")
    )
    return F.aggregate(prods, F.lit(0.0), lambda acc, x: acc + x)


def _norm(a: Column) -> Column:
    sq = F.aggregate(
        F.transform(a, lambda x: x.cast("double") * x.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return F.sqrt(sq)


def cosine_pairs(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
) -> DataFrame:
    """(a_id, b_id, cos) for all pairs with cosine >= threshold, a < b."""
    x = df.select(F.col(id_col).alias("a_id"), F.col(vec_col).alias("va"))
    y = df.select(F.col(id_col).alias("b_id"), F.col(vec_col).alias("vb"))
    pairs = x.crossJoin(y).filter(F.col("a_id") < F.col("b_id"))
    cos = _dot(F.col("va"), F.col("vb")) / (
        _norm(F.col("va")) * _norm(F.col("vb"))
    )
    return (
        pairs.select("a_id", "b_id", F.round(cos, 4).alias("cos"))
        .filter(F.col("cos") >= threshold)
    )


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k per query: (query_id, neighbor_id, rank, cos).

    The query set is broadcast (small side); the corpus — the 100 TB
    side — is scanned once with no shuffle before the per-query top-k
    aggregation.
    """
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv")
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv")
    )
    scored = c.join(F.broadcast(q), F.col("query_id") != F.col("neighbor_id"))
    cos = _dot(F.col("qv"), F.col("cv")) / (
        _norm(F.col("qv")) * _norm(F.col("cv"))
    )
    scored = scored.select(
        "query_id", "neighbor_id", F.round(cos, 4).alias("cos")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cos")
    )


def make_planes(n_planes: int, dim: int) -> list[list[float]]:
    """Deterministic pseudo-random hyperplanes in [-1, 1] from pure
    integer arithmetic (no RNG — reproducible everywhere)."""
    return [
        [
            (((1 + p * dim + d) * 2654435761) % 1000003 % 2001 - 1000) / 1000.0
            for d in range(dim)
        ]
        for p in range(n_planes)
    ]


def _bucket_expr(vec_col: str, n_planes: int, dim: int) -> Column:
    planes = make_planes(n_planes, dim)
    bits = []
    for plane in planes:
        lit_plane = F.array(*[F.lit(v) for v in plane])
        bits.append(
            F.when(_dot(F.col(vec_col), lit_plane) >= 0, "1").otherwise("0")
        )
    return F.concat(*bits)


def hyperplane_buckets(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 8,
    dim: int = 64,
) -> DataFrame:
    """(id, bucket STRING of '0'/'1' sign bits) — LSH bucket key."""
    return df.select(
        F.col(id_col), _bucket_expr(vec_col, n_planes, dim).alias("bucket")
    )


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_planes: int = 8,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """The 100 TB ANN path: hyperplane-LSH bucketing composed with exact
    within-bucket cosine scoring and a per-query top-k.

    Candidate generation is an equi-join on the bucket key — each query
    only ever meets the ~n/2^planes corpus vectors sharing its bucket,
    never the full corpus (contrast :func:`brute_force_topk`, which
    scores all n). Queries are the small side and are broadcast, so the
    corpus is scanned once with NO shuffle; the only aggregation is the
    per-query rank window over the candidate set. Recall is tunable via
    ``n_planes`` (fewer planes -> bigger buckets -> higher recall); for
    multi-probe recall, union several plane sets upstream.
    """
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qv"),
        _bucket_expr(vec_col, n_planes, dim).alias("bucket"),
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("cv"),
        _bucket_expr(vec_col, n_planes, dim).alias("bucket"),
    )
    scored = c.join(F.broadcast(q), "bucket").filter(
        F.col("query_id") != F.col("neighbor_id")
    )
    cos = _dot(F.col("qv"), F.col("cv")) / (
        _norm(F.col("qv")) * _norm(F.col("cv"))
    )
    scored = scored.select(
        "query_id", "neighbor_id", F.round(cos, 4).alias("cos")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cos")
    )


def cosine_pairs_bucketed(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
    n_planes: int = 8,
    dim: int = 64,
) -> DataFrame:
    """Near-duplicate pairs above a cosine threshold, restricted to
    LSH-bucket collisions — the scale path promised by
    :func:`cosine_pairs` (which is the O(n^2) exact baseline).

    One shuffle on the bucket key; within a bucket the pair set is
    ~(n/2^planes)^2 instead of n^2. High-cosine pairs land in the same
    bucket with probability (1 - theta/pi)^planes, so a missed true pair
    is the (documented) LSH recall trade-off, identical to the reference
    posture for MinHash-LSH text dedup.
    """
    x = df.select(
        F.col(id_col).alias("a_id"),
        F.col(vec_col).alias("va"),
        _bucket_expr(vec_col, n_planes, dim).alias("bucket"),
    )
    y = df.select(
        F.col(id_col).alias("b_id"),
        F.col(vec_col).alias("vb"),
        _bucket_expr(vec_col, n_planes, dim).alias("bucket"),
    )
    pairs = x.join(y, "bucket").filter(F.col("a_id") < F.col("b_id"))
    cos = _dot(F.col("va"), F.col("vb")) / (
        _norm(F.col("va")) * _norm(F.col("vb"))
    )
    return (
        pairs.select("a_id", "b_id", F.round(cos, 4).alias("cos"))
        .filter(F.col("cos") >= threshold)
    )
