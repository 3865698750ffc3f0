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
- ``ivf_centroids`` / ``ivf_assign`` / ``ivf_topk``: IVF-flat ANN — a
  fitted coarse quantizer (deterministic data-vector sampling)
  partitions the corpus into inverted lists; queries probe only their
  ``n_probe`` nearest lists. The data-adaptive alternative to
  hyperplane LSH.

All dot products fold left-to-right over DOUBLE-cast elements, matching
DuckDB ``list_reduce`` evaluation for bit-identical float results.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..envelope import try_element_at


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


def _cos(a: Column, b: Column) -> Column:
    """Cosine similarity with a null (not a crash) for zero-norm
    vectors: driver sessions run spark.sql.ansi.enabled=true, where a
    plain `/` THROWS on a zero divisor — try_divide restores the
    non-ANSI null, so a padded/all-zero embedding drops out of
    thresholded pair sets and ranks last instead of killing the job."""
    return F.try_divide(_dot(a, b), _norm(a) * _norm(b))


def cosine_pairs(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
) -> DataFrame:
    """(a_id, b_id, cos) for all pairs with cosine >= threshold, a < b.

    # ORACLE-ONLY: intentional O(n^2) exact baseline — never compose
    into a production pipeline over an unbounded frame. The scale path
    is ``cosine_pairs_bucketed`` (LSH-bucketed candidate generation,
    verify cost proportional to candidates, not n^2).
    """
    x = df.select(F.col(id_col).alias("a_id"), F.col(vec_col).alias("va"))
    y = df.select(F.col(id_col).alias("b_id"), F.col(vec_col).alias("vb"))
    pairs = x.crossJoin(y).filter(F.col("a_id") < F.col("b_id"))
    cos = _cos(F.col("va"), F.col("vb"))
    return (
        pairs.select("a_id", "b_id", F.round(cos, 4).alias("cos"))
        # duplicate ids sort adjacent and would pair with themselves;
        # the exact baseline's a < b contract excludes self-pairs
        .filter(F.col("a_id") != F.col("b_id"))
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
    cos = _cos(F.col("qv"), F.col("cv"))
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
    # loud guard folded into the bucket string (a detached check column
    # would be pruned): a dim mismatch null-pads zip_with, nulls every
    # dot, and silently collapses the WHOLE corpus into the all-'0'
    # bucket — quadratic pair expansion / one-bucket LSH with no error
    guard = F.coalesce(
        F.assert_true(
            F.col(vec_col).isNull() | (F.size(vec_col) == dim),
            F.concat(
                F.lit(f"hyperplane bucket: expected dim={dim}, got "),
                F.size(vec_col).cast("string"),
            ),
        ).cast("string"),
        F.lit(""),
    )
    bits = [guard]
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
    cos = _cos(F.col("qv"), F.col("cv"))
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


def ivf_centroids(
    df: DataFrame,
    n_list: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[tuple[int, list[float]]]:
    """Fit an IVF coarse quantizer by deterministic sampling: the
    ``n_list`` data vectors that sort first by ``md5(id)`` become the
    centroids (train-by-sampling, the cheap end of the IVF training
    spectrum from Jegou et al., "Product Quantization for Nearest
    Neighbor Search", TPAMI 2011 — k-means refinement changes the
    centroids, not the index structure). md5-order is a deterministic
    stand-in for a uniform shuffle, reproducible bit-identically in any
    engine. Returns ``[(centroid_id, vector)]`` with 1-based ids in
    sample order; the collect is ``n_list`` rows — an index-build
    constant, not a data-scale term."""
    rows = (
        df.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v"))
        .withColumn("h", F.md5(F.col("id").cast("string")))
        .orderBy("h", "id")
        .limit(n_list)
        .collect()
    )
    return [(i + 1, [float(x) for x in r["v"]]) for i, r in enumerate(rows)]


def _py_norm(vec: list[float]) -> float:
    """Python twin of :func:`_norm`: identical IEEE left fold
    (acc + x*x from 0.0, then sqrt), so a centroid norm computed here
    is bit-identical to the Spark/DuckDB aggregate over the same
    literal array — it can ship as a plan literal instead of being
    re-derived per row."""
    import math

    acc = 0.0
    for x in vec:
        acc += float(x) * float(x)
    return math.sqrt(acc)


def _centroid_ranking(vec_col: str, centroids: list[tuple[int, list[float]]]) -> Column:
    """Array of struct(neg_cos, centroid_id) sorted best-first — the
    per-row centroid ranking as a pure projection over literal centroid
    vectors (no join, no shuffle; the fitted index ships inside the plan
    the same way the LSH planes do).

    Two shape decisions keep this cheap (they took the sf0.1 IVF top-k
    query from ~8s to well under 2s for 2000x64 vectors):

    - ONE ``transform`` over a single literal array of (id, norm,
      vector) structs, NOT one unrolled expression per centroid — the
      unrolled form at 16 lists x 64 dims built a ~50k-node tree whose
      driver-side analysis dominated, and higher-order functions are
      CodegenFallback so every duplicated subtree was also interpreted
      per row.
    - the ranking key is ``dot(v, c) / ||c||``, NOT the full cosine:
      the row norm ``||v||`` is a common positive factor across all
      centroids, so dividing by it cannot change the order — dropping
      it removes a 64-element fold per centroid per row (HOF lambdas
      re-evaluate outer non-lambda subexpressions per element). The
      centroid norm ships as a Python-float literal (:func:`_py_norm`
      folds identically to the Spark/DuckDB aggregate), and the DuckDB
      oracle ranks by the SAME dot/||c|| expression, so order and ties
      stay bit-identical across engines."""
    # a zero-norm centroid would put a /0 literal in every row's
    # ranking expression — under the driver's ANSI session that throws
    # at runtime for EVERY row; fail loudly at index-build time instead
    zero = [cid for cid, cvec in centroids if _py_norm(cvec) == 0.0]
    if zero:
        raise ValueError(f"zero-norm centroid(s) {zero}: refit the "
                         "quantizer without all-zero sample vectors")
    entries = [
        F.struct(
            F.lit(cid).alias("id"),
            F.lit(_py_norm(cvec)).alias("nrm"),
            F.array(*[F.lit(float(x)) for x in cvec]).alias("v"),
        )
        for cid, cvec in centroids
    ]

    def _rank_one(c):
        key = _dot(F.col(vec_col), c.getField("v")) / c.getField("nrm")
        return F.struct((-key).alias("neg"), c.getField("id").alias("centroid_id"))

    return F.sort_array(F.transform(F.array(*entries), _rank_one))


def ivf_assign(
    df: DataFrame,
    centroids: list[tuple[int, list[float]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, list_id): each vector joins the inverted list of its nearest
    centroid (max cosine, ties to the smaller centroid_id). Zero-shuffle
    projection — at 100 TB this is the partitioning column the corpus is
    written out under, so probes prune whole files."""
    best = _centroid_ranking(vec_col, centroids)[0]
    return df.select(
        F.col(id_col), best.getField("centroid_id").alias("list_id")
    )


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    centroids: list[tuple[int, list[float]]],
    k: int = 5,
    n_probe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF-flat ANN: each query probes its ``n_probe`` nearest inverted
    lists and scores exact cosine only against vectors assigned there.

    Same 100 TB posture as :func:`lsh_topk`: the corpus is scanned once
    (assignment is a projection), candidates come from a broadcast
    equi-join on ``list_id`` (queries exploded to one row per probed
    list — the small side), and the only exchange is the per-query rank
    window. Each corpus vector lives in exactly one list, so a
    (query, neighbor) candidate appears at most once regardless of
    ``n_probe`` — no dedup pass needed. Recall is tuned by
    ``n_probe``/``n_list`` instead of LSH's plane count; IVF adapts to
    the data distribution where hyperplane-LSH is data-oblivious."""
    ranking = _centroid_ranking(vec_col, centroids)
    probed = F.transform(
        F.slice(ranking, 1, n_probe), lambda s: s.getField("centroid_id")
    )
    # norms are staged BELOW the join (one fold per input row); the
    # scoring projection above the join reads them as plain columns, so
    # a corpus row matched by many queries never re-derives its norm
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qv"),
        _norm(F.col(vec_col)).alias("__qnrm__"),
        F.explode(probed).alias("list_id"),
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("cv"),
        _norm(F.col(vec_col)).alias("__cnrm__"),
        _centroid_ranking(vec_col, centroids)[0]
        .getField("centroid_id")
        .alias("list_id"),
    )
    scored = c.join(F.broadcast(q), "list_id").filter(
        F.col("query_id") != F.col("neighbor_id")
    )
    cos = F.try_divide(
        _dot(F.col("qv"), F.col("cv")),
        F.col("__qnrm__") * F.col("__cnrm__"),
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


def ivf_refine(
    df: DataFrame,
    centroids: list[tuple[int, list[float]]],
    n_iter: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    scale: int = 10**9,
) -> list[tuple[int, list[float]]]:
    """Lloyd (k-means) refinement of the IVF coarse quantizer: each
    iteration assigns every vector to its nearest centroid (a pure
    projection — the current centroids ship as plan literals) and
    recomputes each centroid as the mean of its list. Per iteration the
    cluster cost is ONE posexplode + ONE grouped aggregate with map-side
    combine (shuffle cardinality = n_list × dim, not data-scale); the
    driver collects only the n_list × dim (sum, count) cells — an
    index-build constant.

    Means are computed in 1e-9 fixed point: elements are floor-scaled to
    integers and summed exactly (DECIMAL(38,0)), so the fit is
    bit-identical across engines, partition counts, and reduce orders —
    IEEE double summation is order-sensitive and Spark/DuckDB round
    double→DECIMAL(p,s) differently (HALF_UP vs HALF_EVEN), so neither
    floating sums nor fractional decimal casts reproduce. Quantizing the
    mean at 1e-9 is far below any clustering-relevant signal. Lists that
    receive no vectors keep their previous centroid."""
    dim = len(centroids[0][1])
    for _ in range(n_iter):
        best = _centroid_ranking(vec_col, centroids)[0]
        # two-step select: a generator (posexplode) in the same select
        # strips nested struct-field aliases (CleanupAliases), turning
        # the ranking struct into col1/col2 — project first, then explode
        cells = (
            df.select(
                best.getField("centroid_id").alias("list_id"),
                F.col(vec_col),
            )
            .select("list_id", F.posexplode(F.col(vec_col)).alias("pos", "val"))
            .withColumn(
                "sv",
                F.floor(F.col("val").cast("double") * F.lit(float(scale)))
                .cast("decimal(38,0)"),
            )
            .groupBy("list_id", "pos")
            .agg(F.sum("sv").alias("s"), F.count(F.lit(1)).alias("n"))
            .collect()
        )
        means: dict[int, list[float]] = {}
        for r in cells:
            means.setdefault(r["list_id"], [0.0] * dim)[r["pos"]] = (
                float(r["s"]) / r["n"]
            ) / scale
        centroids = [(cid, means.get(cid, vec)) for cid, vec in centroids]
    return centroids


def _l2sq(a: Column, b: Column) -> Column:
    """Squared L2 distance as the same left fold as :func:`_dot`
    (0.0-seeded, element order) so the DuckDB twin
    (``__spark_entry__._l2_sql``) reproduces it bit-identically."""
    diffs = F.zip_with(
        a,
        b,
        lambda x, y: (x.cast("double") - y.cast("double"))
        * (x.cast("double") - y.cast("double")),
    )
    return F.aggregate(diffs, F.lit(0.0), lambda acc, x: acc + x)


def pq_codebooks(
    df: DataFrame,
    m: int = 4,
    ks: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[list[tuple[int, list[float]]]]:
    """Product-quantization codebooks (Jegou, Douze, Schmid, "Product
    Quantization for Nearest Neighbor Search", TPAMI 2011): the D-dim
    space splits into ``m`` contiguous subspaces of D/m dims, and
    subspace ``j``'s codebook is the j-th slice of the same
    deterministic md5-order sample :func:`ivf_centroids` uses
    (train-by-sampling; per-subspace k-means would refine the code
    vectors, not the index structure). Codes are positional 1..``ks``
    and shared across subspaces — code ``c`` in every subspace comes
    from sampled row ``c`` — which keeps the DuckDB oracle a single
    sample CTE. Returns ``[subspace][(code, subvector)]``; the collect
    underneath is ``ks`` rows, an index-build constant."""
    sample = ivf_centroids(df, n_list=ks, id_col=id_col, vec_col=vec_col)
    dim = len(sample[0][1])
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    d = dim // m
    return [
        [(cid, vec[j * d : (j + 1) * d]) for cid, vec in sample]
        for j in range(m)
    ]


def _py_dot(a: list[float], b: list[float]) -> float:
    """Python twin of :func:`_dot`: identical IEEE left fold (acc + x*y
    from 0.0), bit-identical to the Spark/DuckDB aggregate."""
    acc = 0.0
    for x, y in zip(a, b):
        acc += float(x) * float(y)
    return acc


def _py_assign(vec: list[float], centroids: list[tuple[int, list[float]]]) -> int:
    """Python twin of ``_centroid_ranking(...)[0]``: the centroid id
    with max ``dot(v,c)/norm(c)`` (the vector's own norm is constant
    across candidates so the ranking drops it — same reduction the
    Spark and DuckDB rankings apply), ties to the smaller id. Same IEEE
    fold order via the _py twins, so a driver-side assignment agrees
    bit-for-bit with the in-plan one."""
    best_id, best_s = None, None
    for cid, cvec in centroids:
        s = _py_dot(vec, cvec) / _py_norm(cvec)
        if best_s is None or s > best_s:
            best_id, best_s = cid, s
    return best_id


def pq_residual_codebooks(
    df: DataFrame,
    centroids: list[tuple[int, list[float]]],
    m: int = 4,
    ks: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[list[tuple[int, list[float]]]]:
    """Codebooks trained on IVF RESIDUALS — the canonical IVFADC
    composition (Jegou et al. 2011 §IV: quantize ``x - q1(x)``, the
    coarse centroid's residual, which concentrates the distribution and
    cuts quantization error vs the non-residual :func:`pq_codebooks`).
    Same train-by-sampling posture: ``ks`` md5-order sample vectors
    become code vectors AFTER subtracting each one's own nearest coarse
    centroid (driver-side — the sample is index-build-constant-sized;
    the assignment reuses the exact ranking reduction via the _py
    twins, so the DuckDB oracle can rebuild these books as one sample
    CTE + residual projection). The sample SKIPS the first
    ``len(centroids)`` md5-order rows: those ARE the coarse sample, and
    a vector's residual against its own centroid is the zero vector —
    training on them would collapse every codebook entry to zeros (all
    corpus codes tie at code 1, ADC becomes constant). Returns
    ``[subspace][(code, subvec)]`` positional 1..ks like
    :func:`pq_codebooks`."""
    n_skip = len(centroids)
    wide = ivf_centroids(
        df, n_list=n_skip + ks, id_col=id_col, vec_col=vec_col
    )
    sample = [(i + 1, vec) for i, (_, vec) in enumerate(wide[n_skip:])]
    cmap = dict(centroids)
    residuals = []
    for cid, vec in sample:
        own = cmap[_py_assign(vec, centroids)]
        residuals.append(
            (cid, [float(x) - float(c) for x, c in zip(vec, own)])
        )
    dim = len(residuals[0][1])
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    d = dim // m
    return [
        [(cid, vec[j * d : (j + 1) * d]) for cid, vec in residuals]
        for j in range(m)
    ]


def _pq_code(
    vec_col: str, book: list[tuple[int, list[float]]], start: int
) -> Column:
    """1-based code of the nearest (min squared-L2, ties to the smaller
    code) codebook entry for the subvector starting at 1-based ``start``.
    Same literal-array + single-``transform`` shape as
    :func:`_centroid_ranking` (one sorted struct array, not ks unrolled
    expressions); the slice is re-evaluated per codebook entry — ks x
    D/m work per row, small by construction."""
    d = len(book[0][1])
    src = vec_col if isinstance(vec_col, Column) else F.col(vec_col)
    sub = F.slice(src, start, d)
    entries = [
        F.struct(
            F.lit(cid).alias("id"),
            F.array(*[F.lit(float(x)) for x in cvec]).alias("v"),
        )
        for cid, cvec in book
    ]
    ranked = F.sort_array(
        F.transform(
            F.array(*entries),
            lambda c: F.struct(
                _l2sq(sub, c.getField("v")).alias("d"),
                c.getField("id").alias("code"),
            ),
        )
    )
    return ranked[0].getField("code")


def pq_encode(
    df: DataFrame,
    codebooks: list[list[tuple[int, list[float]]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """``(id, codes)``: each vector compressed to ``m`` codebook codes
    — 64 float32 dims (256 B) become 4 small ints here, the 64x
    compression that lets a 100 TB corpus's search structure live in a
    fraction of the space. Zero-shuffle projection (the codebooks ship
    as plan literals, like the IVF centroids); ``codes[j]`` indexes
    ``codebooks[j]`` 1-based."""
    d = len(codebooks[0][0][1])
    codes = F.array(
        *[
            _pq_code(vec_col, codebooks[j], j * d + 1)
            for j in range(len(codebooks))
        ]
    )
    return df.select(F.col(id_col), codes.alias("codes"))


def pq_adc_topk(
    corpus: DataFrame,
    queries: DataFrame,
    codebooks: list[list[tuple[int, list[float]]]],
    k: int = 5,
    centroids: list[tuple[int, list[float]]] | None = None,
    n_probe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    residual: bool = False,
) -> DataFrame:
    """Asymmetric-distance (ADC) top-k over PQ codes: the corpus side is
    scored from its ``m`` codes only — distance(q, x) is approximated by
    sum_j ||q_j - codebook_j[code_j(x)]||^2, the query side staying
    exact (Jegou et al. 2011, the ADC estimator; non-residual variant —
    codes quantize the raw vector, not the IVF residual, so one codebook
    set serves both the plain scan and the IVF composition).

    With ``centroids`` this is IVF-PQ (the FAISS-canonical composition):
    corpus rows carry their coarse ``list_id`` (zero-shuffle literal
    projection, as :func:`ivf_assign`), queries probe their ``n_probe``
    nearest lists, and candidates come from a broadcast equi-join on
    ``list_id``. NOTE an honest caveat: THIS function encodes codes
    from the full vector inline per call — convenient for one-shot
    queries and the oracle twin, but a production index serving
    repeated query batches should materialize :func:`pq_encode` output
    once (write the (id, codes, list_id) table) and run the ADC join
    over THAT, so the corpus is read as m small ints per row rather
    than re-encoded per batch. Without ``centroids`` it is the
    compressed-domain twin of :func:`brute_force_topk` (linear ADC scan,
    the paper's baseline). Each corpus vector lives in at most one list,
    so no candidate dedup is needed. Returns
    ``(query_id, neighbor_id, rank, adc)`` — rank 1 = smallest distance,
    ties to the smaller neighbor_id."""
    # the ADC lookup is element_at(codebook_array, code) — positional —
    # so reject codebooks whose codes aren't exactly 1..ks in order
    # (pq_codebooks guarantees this; a filtered/renumbered book would
    # silently score against the wrong centroids otherwise)
    for book in codebooks:
        if [cid for cid, _ in book] != list(range(1, len(book) + 1)):
            raise ValueError("codebook codes must be positional 1..ks")
    if residual and centroids is None:
        raise ValueError("residual encoding needs the IVF centroids")
    m = len(codebooks)
    d = len(codebooks[0][0][1])
    # residual (IVFADC, Jegou et al. 2011 §IV): both sides quantize /
    # score x - q1(x); the centroid vectors ship as ONE literal
    # array-of-arrays indexed positionally by list_id (ivf_centroids
    # ids are 1..n_list in sample order)
    if residual:
        carr = F.array(
            *[
                F.array(*[F.lit(float(x)) for x in cvec])
                for _, cvec in centroids
            ]
        )
    ranking = (
        _centroid_ranking(vec_col, centroids)
        if centroids is not None
        else None
    )
    if residual:
        lid = ranking[0].getField("centroid_id")
        enc_src: Column | str = F.zip_with(
            F.col(vec_col),
            try_element_at(carr, lid),
            lambda x, c: x - c,
        )
    else:
        enc_src = vec_col
    enc_cols = [
        F.col(id_col).alias("neighbor_id"),
        F.array(
            *[_pq_code(enc_src, codebooks[j], j * d + 1) for j in range(m)]
        ).alias("codes"),
    ]
    qcols = [F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv")]
    if centroids is not None:
        enc_cols.append(ranking[0].getField("centroid_id").alias("list_id"))
        probed = F.transform(
            F.slice(ranking, 1, n_probe), lambda s: s.getField("centroid_id")
        )
        q = queries.select(*qcols, F.explode(probed).alias("list_id"))
        if residual:
            # per probed list, the query scores in THAT list's residual
            # space: rq = q - c_list (the ADC lookup tables FAISS
            # precomputes per probe)
            q = q.withColumn(
                "qv",
                F.zip_with(
                    F.col("qv"),
                    try_element_at(carr, F.col("list_id")),
                    lambda x, c: x - c,
                ),
            )
        joined = corpus.select(*enc_cols).join(F.broadcast(q), "list_id")
    else:
        q = queries.select(*qcols)
        joined = corpus.select(*enc_cols).crossJoin(F.broadcast(q))
    joined = joined.filter(F.col("query_id") != F.col("neighbor_id"))
    # one literal array-of-arrays per subspace; ADC term j looks the
    # code's centroid up by position and folds the exact L2^2 against
    # the query's j-th slice. Left-assoc term sum pins the IEEE order
    # the DuckDB oracle mirrors.
    adc: Column | None = None
    for j in range(m):
        cbj = F.array(
            *[F.array(*[F.lit(float(x)) for x in cvec]) for _, cvec in codebooks[j]]
        )
        cent = F.element_at(cbj, F.col("codes").getItem(j))
        term = _l2sq(F.slice(F.col("qv"), j * d + 1, d), cent)
        adc = term if adc is None else adc + term
    scored = joined.select(
        "query_id", "neighbor_id", F.round(adc, 4).alias("adc")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("adc").asc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "adc")
    )


def cosine_pairs_bucketed(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
    n_planes: int = 8,
    dim: int = 64,
    max_bucket: int | None = None,
) -> DataFrame:
    """Near-duplicate pairs above a cosine threshold, restricted to
    LSH-bucket collisions — the scale path promised by
    :func:`cosine_pairs` (which is the O(n^2) exact baseline).

    ONE grouped collect per bucket + in-bucket ordered-pair expansion,
    NOT a self-join: aliased self-join sides canonicalize differently so
    ReuseExchange never fires, and the (8 dot products/row) bucket
    subtree plus the vector column would be computed and scanned TWICE
    (the same plan smell fixed for MinHash-LSH in
    dedup.lsh_candidate_pairs). Here the embedding scan happens once,
    shuffles once on the bucket key, and each bucket's a_id < b_id pairs
    expand locally (sort_array on (id, vec) structs makes the ordering
    free). High-cosine pairs share a bucket with probability
    (1 - theta/pi)^planes — the documented LSH recall trade-off,
    identical to the reference posture for MinHash-LSH text dedup.

    ``max_bucket`` drops buckets larger than the cap: a degenerate
    bucket (e.g. many near-zero vectors collapsing to one sign pattern)
    is quadratic in pair expansion with no guard otherwise, and it also
    bounds the per-group collect buffer.
    """
    staged = df.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("v"),
        _bucket_expr(vec_col, n_planes, dim).alias("bucket"),
    )
    buckets = (
        staged.groupBy("bucket")
        .agg(F.sort_array(F.collect_list(F.struct("id", "v"))).alias("items"))
        .filter(F.size("items") > 1)
    )
    if max_bucket is not None:
        buckets = buckets.filter(F.size("items") <= max_bucket)
    items = F.col("items")
    # arity-2 transform lambda = (element, index) — intentional here
    pair_arrays = F.transform(
        items,
        lambda x, i: F.transform(
            F.slice(items, i + 2, F.size(items)),
            lambda y: F.struct(
                x.getField("id").alias("a_id"),
                x.getField("v").alias("va"),
                y.getField("id").alias("b_id"),
                y.getField("v").alias("vb"),
            ),
        ),
    )
    pairs = buckets.select(F.explode(F.flatten(pair_arrays)).alias("p")).select(
        "p.a_id", "p.b_id", "p.va", "p.vb"
    )
    cos = _cos(F.col("va"), F.col("vb"))
    return (
        pairs.select("a_id", "b_id", F.round(cos, 4).alias("cos"))
        # duplicate ids sort adjacent and would pair with themselves;
        # the exact baseline's a < b contract excludes self-pairs
        .filter(F.col("a_id") != F.col("b_id"))
        .filter(F.col("cos") >= threshold)
    )


def semdedup(
    df: DataFrame,
    centroids: list[tuple[int, list[float]]],
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_cluster: int | None = None,
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023, arXiv:2303.09540): semantic dedup
    by embedding — cluster with the IVF coarse quantizer, then inside
    each cluster remove every member that has a near-duplicate
    (pairwise cosine >= ``threshold``) FARTHER from the centroid than
    itself (lower centroid-cosine, ties to the smaller id); the member
    farthest from the centroid in each duplicate group survives (the
    paper's keep-low-centroid-similarity rule, which biases the kept
    set toward diversity).

    Returns one verdict row per input vector:
    ``(id_col, cluster_id, cent_cos, keep)``.

    Execution shape (100 TB posture): centroid assignment is the same
    zero-shuffle literal-projection as :func:`ivf_assign`; ONE shuffle
    groups each cluster; the removal test is a per-member EXISTS over
    the collected cluster (member x is removed iff some y in the
    cluster has round(cos(x,y),4) >= threshold and beats x — lower
    centroid-cosine, ties to the smaller id), evaluated locally with
    higher-order functions — no self-join, no join-back, every row
    yields exactly one verdict. Clusters larger than ``max_cluster``
    skip the quadratic member test and keep everything (bounded-state
    guard, same posture as cosine_pairs_bucketed's cap).
    """
    ranked = _centroid_ranking(vec_col, centroids)[0]
    key = -ranked.getField("neg")  # dot(v, c) / ||c||
    staged = df.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("v"),
        ranked.getField("centroid_id").alias("cluster_id"),
        F.try_divide(key, _norm(F.col(vec_col))).alias("cc"),
    )
    clusters = staged.groupBy("cluster_id").agg(
        F.sort_array(F.collect_list(F.struct("id", "v", "cc"))).alias("items")
    )
    items = F.col("items")

    def _removed(x):
        def _beats(y):
            cos = F.round(
                _cos(x.getField("v"), y.getField("v")), 4
            )
            better = (y.getField("cc") < x.getField("cc")) | (
                (y.getField("cc") == x.getField("cc"))
                & (y.getField("id") < x.getField("id"))
            )
            return (y.getField("id") != x.getField("id")) & (cos >= F.lit(threshold)) & better

        # one zero-norm member (null cc/cos) must not NULL the whole
        # cluster's verdicts: exists returns NULL when no predicate is
        # true and any evaluation is NULL — treat that as not-removed
        return F.coalesce(F.exists(items, _beats), F.lit(False))

    verdict = F.transform(
        items,
        lambda x: F.struct(
            x.getField("id").alias("id"),
            x.getField("cc").alias("cc"),
            (~_removed(x)).alias("keep"),
        ),
    )
    if max_cluster is not None:
        verdict = F.when(F.size(items) > max_cluster, F.transform(
            items,
            lambda x: F.struct(
                x.getField("id").alias("id"),
                x.getField("cc").alias("cc"),
                F.lit(True).alias("keep"),
            ),
        )).otherwise(verdict)
    return (
        clusters.select("cluster_id", F.explode(verdict).alias("m"))
        .select(
            F.col("m.id").alias(id_col),
            "cluster_id",
            F.round(F.col("m.cc"), 4).alias("cent_cos"),
            F.col("m.keep").alias("keep"),
        )
    )


def rotation_masks(dim: int, sign_period: int = 3) -> list[int]:
    """Sign masks of the structured orthogonal rotation
    ``R = H_dim * diag(s) / sqrt(dim)``: bit ``j`` of mask ``i`` is 1
    iff ``R[i][j] < 0``. ``H`` is the Sylvester-Hadamard matrix
    (``H[i][j] = (-1)^popcount(i & j)``) and ``s_j = -1`` iff
    ``j % sign_period == 0`` (the deterministic sign-flip diagonal that
    makes the transform a fixed instance of the FJLT/SRHT family,
    Ailon & Chazelle 2009). Masks are returned as SIGNED 64-bit ints so
    the identical literals parse in DuckDB; bit extraction
    ``(m >> j) & 1`` reads the same bits under arithmetic shift in
    Python, Spark, and DuckDB."""
    if dim <= 0 or dim & (dim - 1) or dim > 64:
        raise ValueError("dim must be a power of 2 in 1..64")
    out = []
    for i in range(dim):
        m = 0
        for j in range(dim):
            neg = (bin(i & j).count("1") & 1) ^ (1 if j % sign_period == 0 else 0)
            if neg:
                m |= 1 << j
        if m >= 1 << 63:
            m -= 1 << 64
        out.append(m)
    return out


def rotation_matrix(dim: int, sign_period: int = 3) -> list[list[float]]:
    """Dense rows of the rotation encoded by :func:`rotation_masks`.
    Every entry is ``±1/sqrt(dim)`` — for power-of-4 dims (16, 64) the
    scale is a negative power of two, so the rotation's multiplies are
    EXACT in binary floating point and the only rounding in a rotated
    dot product is the additions."""
    import math

    scale = 1.0 / math.sqrt(dim)
    return [
        [-scale if (m >> j) & 1 else scale for j in range(dim)]
        for m in rotation_masks(dim, sign_period)
    ]


def rotate_vectors(
    df: DataFrame,
    vec_col: str = "embedding",
    dim: int = 64,
    sign_period: int = 3,
    out_col: str | None = None,
) -> DataFrame:
    """OPQ-style rotation before product quantization (Ge, He, Ke, Sun,
    "Optimized Product Quantization", CVPR 2013 — rotating the space
    decorrelates the subspaces PQ quantizes independently; this is the
    data-independent structured pick rather than the learned-R
    alternating minimization, so runs and the DuckDB oracle reproduce
    bit-identically with no training state).

    Zero-shuffle projection: the rotation ships as a literal
    ``dim x dim`` matrix (two distinct values, ``±1/sqrt(dim)``) and
    each output coordinate is a left-fold dot product —
    ``aggregate(zip_with(row, v, *), 0.0, +)`` — whose addition order
    DuckDB's ``list_reduce`` replays exactly.

    100 TB posture: rotation is ``dim^2`` flops per row of
    whole-stage-codegen arithmetic (for dim=64: 4k flops — reading the
    vector from parquet costs more). When the rotated frame feeds the
    PQ encoder directly in ONE plan, Catalyst's CollapseProject will
    inline this expression into every codebook-distance term — fine at
    probe sizes, but a pipeline encoding a full corpus should
    checkpoint the rotated column (write it, or ``persist()``) so the
    rotation is evaluated once per row, exactly as a production OPQ
    index build materializes rotated vectors before training."""
    R = rotation_matrix(dim, sign_period)
    rmat = F.array(*[F.array(*[F.lit(x) for x in row]) for row in R])
    rotated = F.transform(rmat, lambda r: _dot(r, F.col(vec_col)))
    return df.withColumn(out_col or vec_col, rotated)


def pq_rerank_topk(
    corpus: DataFrame,
    queries: DataFrame,
    shortlist: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """The FAISS refine stage (IndexRefineFlat): exact re-ranking of a
    compressed-domain shortlist. ``pq_adc_topk`` ranks by the lossy ADC
    estimate; production ANN search takes a LARGER-than-k ADC shortlist
    and rescores just those candidates against the TRUE vectors, giving
    near-exact recall while the full corpus is still only ever read as
    m small codes. ``shortlist`` is any frame with (query_id,
    neighbor_id) — normally ``pq_adc_topk(..., k=k')`` with k' ~ 4k.

    Returns ``(query_id, neighbor_id, rank, cos)`` with
    :func:`brute_force_topk`'s exact conventions (rounded cosine, ties
    to the smaller neighbor id), so a shortlist that contains the true
    top-k re-ranks to EXACTLY the brute-force answer.

    100 TB posture: shortlist x queries is |Q| x k' rows — it broadcasts;
    the only corpus touch is ONE broadcast-hash-join probe fetching the
    |Q| x k' true vectors (at deployment scale that's the point lookup
    the refine paper assumes), and the final rank is a window over
    |Q| x k' rows. No corpus shuffle anywhere.
    """
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv")
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv")
    )
    # a multi-probe shortlist (unioned ADC passes) may repeat a pair;
    # each duplicate would consume a top-k rank slot and surface as a
    # duplicate output row
    s = shortlist.select("query_id", "neighbor_id").dropDuplicates(
        ["query_id", "neighbor_id"]
    ).join(F.broadcast(q), "query_id")
    scored = c.join(F.broadcast(s), "neighbor_id").select(
        "query_id",
        "neighbor_id",
        F.round(_cos(F.col("qv"), F.col("cv")), 4).alias("cos"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cos")
    )


def ann_recall(exact: DataFrame, approx: DataFrame) -> DataFrame:
    """Recall@k of an approximate index against the exact answer: the
    fraction of ``exact``'s (query_id, neighbor_id) pairs that appear in
    ``approx`` — the standard ANN quality metric (FAISS benchmarks,
    ann-benchmarks.com), needed to TUNE n_planes / n_probe / k' before
    trusting an index at corpus scale.

    Returns one row ``(recall, n_pairs)``; recall is rounded to 4
    decimals, ``n_pairs = |exact|`` (k*|Q| when every query has k true
    neighbors). Both inputs are top-k frames — |Q|*k rows, driver-scale
    metadata — so the join broadcasts; the expensive work (building the
    top-k frames) already happened in the scale-safe index paths.
    """
    e = exact.select("query_id", "neighbor_id")
    a = approx.select(
        "query_id", "neighbor_id", F.lit(1).alias("__hit")
    ).dropDuplicates(["query_id", "neighbor_id"])
    j = e.join(F.broadcast(a), ["query_id", "neighbor_id"], "left")
    return j.agg(
        F.round(
            F.try_divide(
                F.coalesce(F.sum("__hit"), F.lit(0)), F.count(F.lit(1))
            ),
            4,
        ).alias("recall"),
        F.count(F.lit(1)).alias("n_pairs"),
    )


def semantic_decontaminate(
    train: DataFrame,
    eval_set: DataFrame,
    threshold: float = 0.8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-space train/eval decontamination: flag every TRAIN
    vector whose cosine to ANY eval vector reaches ``threshold`` — the
    semantic twin of :func:`~.dedup.contamination_check`'s shingle
    overlap, catching paraphrased/templated leakage that exact n-grams
    miss (the SemDeDup-style complement every eval-hygiene appendix
    runs alongside string matching). Returns ``(id_col, max_cos,
    n_hits)`` for flagged rows only.

    Scale shape — identical posture to the shingle probe: the eval set
    (small by construction) is collected into ONE broadcast row of
    vectors; the 100 TB train side is scanned once and each row scores
    all eval vectors inside a higher-order-function projection — zero
    shuffles, zero groupBy, no row explosion (|train| rows stay |train|
    rows). Cosines are rounded to 4 decimals BEFORE the max/threshold
    so the DuckDB twin (pairwise cross join + grouped max) is
    bit-identical.
    """
    ev = eval_set.agg(F.collect_list(F.col(vec_col)).alias("__evs"))
    probe = train.crossJoin(F.broadcast(ev))
    cosines = F.transform(
        F.col("__evs"), lambda v: F.round(_cos(F.col(vec_col), v), 4)
    )
    hits = F.filter(cosines, lambda c: c >= F.lit(float(threshold)))
    return (
        probe.select(
            F.col(id_col),
            F.array_max(cosines).alias("max_cos"),
            F.size(hits).alias("n_hits"),
        )
        .filter(F.col("n_hits") >= 1)
    )


def ivf_balance(
    assigned: DataFrame,
    n_list: int,
    list_col: str = "list_id",
) -> DataFrame:
    """Inverted-list balance report over :func:`ivf_assign` output —
    the n_list tuning diagnostic (FAISS's imbalance_factor): skewed
    lists mean some probes scan far more than |corpus|/n_list vectors,
    so p99 probe latency tracks the LARGEST probed list, not the mean.

    One row: ``(n_lists_used, min_size, max_size, mean_size_q4,
    imbalance_q4)`` where ``imbalance = n_list * sum(size²) / sum(size)²``
    (1.0 = perfectly balanced; FAISS's metric exactly) in 1e4 fixed
    point. Empty lists count toward ``n_list`` in the imbalance but
    appear as ``n_lists_used < n_list``.

    Scale shape: one map-side-combined groupBy to an <= n_list-row
    frame, then a single-row aggregate over THAT — corpus scanned once,
    second stage is metadata-scale.
    """
    sizes = assigned.groupBy(list_col).agg(
        F.count(F.lit(1)).alias("__n")
    )
    n = F.col("__n")
    return sizes.agg(
        F.count(F.lit(1)).cast("int").alias("n_lists_used"),
        F.min(n).cast("bigint").alias("min_size"),
        F.max(n).cast("bigint").alias("max_size"),
        F.floor(10000.0 * F.sum(n) / F.lit(int(n_list)))
        .cast("bigint")
        .alias("mean_size_q4"),
        # double arithmetic: sum(n)^2 and n*n overflow BIGINT at
        # corpus scale (ANSI sessions would throw, non-ANSI wraps);
        # the sizes frame is <= n_list rows of exact integers, so the
        # double sums are exact at any realistic magnitude for a
        # 4-decimal diagnostic
        F.floor(
            10000.0 * F.lit(int(n_list)) * F.sum(n.cast("double") * n)
            / (F.sum(n.cast("double")) * F.sum(n.cast("double")))
        )
        .cast("bigint")
        .alias("imbalance_q4"),
    )
