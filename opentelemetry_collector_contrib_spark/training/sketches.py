"""Probabilistic-sketch operators: Bloom membership, count-min-sketch
frequency estimation, HyperLogLog distinct estimation.

Why sketches at 100 TB: the exact formulations of these questions
("have we trained on this page?", "how often does this token occur?",
"how many distinct tokens are there?") all carry state proportional to
the CORPUS — a distinct-hash table, a full vocabulary count, a
distinct set. The sketch formulations carry state of FIXED size chosen
up front (m filter bits, d×w counters, m registers), every one of them
built with a partial-aggregatable Spark aggregation (map-side combine
reduces each input partition to at most the sketch size before the
shuffle) and probed with a broadcast join. That is the difference
between "join two 100 TB corpora" and "scan one corpus against a
broadcast few-MB summary".

Every hash here is md5-derived (first 15 hex chars nibble-parsed to a
60-bit int), identical byte-for-byte in Spark and DuckDB, so each op is
oracle-checkable — same determinism contract as the dedup family
(`training/dedup.py`). Reference parity: the collector has no sketch
processors; these are the training-pipeline extensions the task brief
asks for, modeled on Bloom (1970), Cormode-Muthukrishnan (2005, CM
sketch), and Flajolet et al. (2007, HyperLogLog).

ANSI posture: no division, no subtraction-underflow; null text rows
hash to null positions, which drop out of explodes/joins and surface
as n_hits = 0 (non-member) — audited like the rest of the training
surface (SURVEY.md seventh review pass).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .dedup import tokens


def _hex15(col: Column) -> Column:
    """First 15 hex chars of md5 as a 60-bit non-negative BIGINT —
    the same portable hash primitive the minhash family uses."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("bigint")


# ---------------------------------------------------------------- Bloom

def bloom_positions(
    col: Column, n_hashes: int = 4, m_bits: int = 4096
) -> Column:
    """ARRAY<BIGINT> of the k seeded bit positions for one value.
    Null input -> array of nulls (explodes to rows that match no built
    bit: a null value is never a member)."""
    return F.array(
        *[
            _hex15(F.concat(F.lit(f"bloom{j}:"), col)) % m_bits
            for j in range(n_hashes)
        ]
    )


def bloom_build(
    df: DataFrame,
    text_col: str = "text",
    n_hashes: int = 4,
    m_bits: int = 4096,
) -> DataFrame:
    """Bloom filter over a corpus' ``text_col`` values, represented as
    the DISTINCT set bit positions — one ``bit BIGINT`` row each, at
    most ``m_bits`` rows regardless of corpus size.

    Scale posture: explode is map-only (k rows per doc); the distinct
    is a partial-aggregatable hash agg whose output is capped at
    ``m_bits`` rows — each input partition emits <= m_bits rows into
    the shuffle no matter how many documents it holds. The result is
    broadcastable by construction (choose m for your false-positive
    budget: m=2^30 bits at k=4 handles ~10^8 members at <1% fp and is
    still only a few hundred MB as distinct-bit rows — and the classic
    packed-bitset representation is a further 64x smaller if ever
    needed).
    """
    pos = bloom_positions(F.col(text_col), n_hashes, m_bits)
    return (
        df.select(F.explode(pos).alias("bit"))
        .filter(F.col("bit").isNotNull())
        .distinct()
    )


def bloom_probe(
    df: DataFrame,
    bits: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_hashes: int = 4,
    m_bits: int = 4096,
) -> DataFrame:
    """Probe each row of ``df`` against a built filter: returns
    ``(id_col, n_hits, maybe_member)`` where ``n_hits`` counts the k
    probes whose bit is set and ``maybe_member`` is true iff ALL k hit
    (Bloom semantics: no false negatives; false positives at the rate
    the (m, k, n) sizing implies).

    The k probe rows join the broadcast bit set map-side (zero probe
    shuffle); the per-doc count aggregation is the only exchange and
    its key is the unique doc id (skew-free). Probes are NOT
    deduplicated: a doc whose k positions collide still counts k hits
    when the collided bit is set — same truth value as the bitset
    formulation, and it keeps the row multiplier exactly k.
    """
    pos = bloom_positions(F.col(text_col), n_hashes, m_bits)
    probes = df.select(F.col(id_col), F.explode(pos).alias("bit"))
    hits = (
        probes.join(F.broadcast(bits), "bit")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_hits"))
    )
    return (
        df.select(id_col)
        .join(hits, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_hits", F.lit(0)).cast("long").alias("n_hits"),
            (F.coalesce("n_hits", F.lit(0)) == n_hashes).alias("maybe_member"),
        )
    )


# ------------------------------------------------------ count-min sketch

def cms_build(
    df: DataFrame,
    token_col: str = "tok",
    depth: int = 4,
    width: int = 1024,
) -> DataFrame:
    """Count-min sketch over a token stream: ``(d, pos, c)`` — one row
    per non-empty counter cell, at most depth*width rows total.

    One explode (d rows per token, d is small) + one hash agg with
    map-side combine: each input partition contributes at most d*width
    rows to the shuffle however many tokens it holds — the fixed-size
    frequency summary of an unbounded stream (Cormode-Muthukrishnan
    2005). Null tokens hash to null positions and are dropped (they
    carry no frequency).
    """
    cells = F.array(
        *[
            F.struct(
                F.lit(j).alias("d"),
                (_hex15(F.concat(F.lit(f"cms{j}:"), F.col(token_col))) % width).alias(
                    "pos"
                ),
            )
            for j in range(depth)
        ]
    )
    return (
        df.select(F.explode(cells).alias("c"))
        .select("c.d", "c.pos")
        .filter(F.col("pos").isNotNull())
        .groupBy("d", "pos")
        .agg(F.count(F.lit(1)).alias("c"))
    )


def cms_estimate(
    candidates: DataFrame,
    sketch: DataFrame,
    token_col: str = "tok",
    depth: int = 4,
    width: int = 1024,
) -> DataFrame:
    """Point-estimate each candidate token's frequency from the sketch:
    ``min`` over the d counters the token hashes to (the CM guarantee:
    estimate >= truth always; <= truth + eps*N with probability 1-δ).

    The candidate side re-derives its d cell keys (same seeded hashes),
    joins the broadcast sketch on (d, pos) — both sides are tiny — and
    takes the grouped min. Every candidate that occurs at least once
    finds all d of its cells, so the group has exactly d rows.
    """
    cells = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(j).alias("d"),
                    (
                        _hex15(F.concat(F.lit(f"cms{j}:"), F.col(token_col))) % width
                    ).alias("pos"),
                )
                for j in range(depth)
            ]
        )
    ).alias("c")
    probe = candidates.select(F.col(token_col), cells).select(
        token_col, "c.d", "c.pos"
    )
    return (
        probe.join(F.broadcast(sketch), ["d", "pos"])
        .groupBy(token_col)
        .agg(F.min("c").alias("cms_est"))
    )


# ------------------------------------------------------ histogram quantiles

def hist_quantile_sketch(
    df: DataFrame,
    value_col: str,
    n_buckets: int = 128,
    ps: tuple[float, ...] = (0.5, 0.9, 0.99),
) -> DataFrame:
    """Quantile estimates for an INTEGER column from a fixed-size
    equi-width histogram: ``(p, n, bucket, est)`` — one row per
    requested quantile, ``est`` = the upper bound of the first bucket
    whose cumulative count reaches ``ceil(p * n)``.

    The exact formulation (sort / percentile_disc) is a full shuffle of
    the column; the sketch is two bounded aggregations: a 1-row
    (min, max, n) pass, then a <= ``n_buckets``-row bucket-count hash
    agg (map-side combine caps each partition's shuffle output at
    ``n_buckets`` rows) and a cumulative window over those few rows.
    Error is bounded by the bucket width ``(max-min)/n_buckets`` —
    the right trade for "p99 document length over 100 TB".

    Everything before the output row is INTEGER math (width =
    R div B + 1; bucket = (v - min) div width; the CDF test is
    ``cum * 100 >= p_pct * n`` with ps quantized to whole percents —
    exactly "cum reaches ceil(p*n)" without ever computing a float),
    so Spark and DuckDB agree bit-for-bit — same posture as the HLL
    scaled-integer harmonic sum. Null values are excluded (SQL
    aggregate semantics); an all-null/empty input returns zero rows.
    """
    vals = df.filter(F.col(value_col).isNotNull()).select(
        F.col(value_col).cast("long").alias("v")
    )
    stats = (
        vals.agg(
            F.min("v").alias("vmin"),
            F.max("v").alias("vmax"),
            F.count(F.lit(1)).alias("n"),
        )
        .filter(F.col("n") > 0)
        # width = R div B + 1 guarantees bucket = (v - vmin) div width
        # lands in [0, B-1]; pure integer division, no float rounding
        .withColumn("width", F.expr(f"((vmax - vmin) div {int(n_buckets)}) + 1"))
    )
    counts = (
        vals.crossJoin(F.broadcast(stats))
        .select(F.expr("(v - vmin) div width").alias("bucket"))
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    from pyspark.sql.window import Window

    cum = counts.withColumn(
        "cum",
        F.sum("c").over(
            Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, 0)
        ),
    )
    # CDF inversion for every requested p in ONE tiny pass over the
    # <= n_buckets cumulative rows: explode the quantile list, keep
    # buckets whose cum reaches the exact scaled-integer target
    # (cum * 100 >= p_pct * n — ps quantized to whole percents so both
    # engines compare integers), min bucket per p.
    p_pct = F.explode(
        F.array(*[F.lit(int(round(p * 100))) for p in ps])
    ).alias("p_pct")
    hit = (
        cum.crossJoin(F.broadcast(stats))
        .select("*", p_pct)
        .filter(F.col("cum") * 100 >= F.col("p_pct") * F.col("n"))
    )
    return (
        hit.groupBy("p_pct", "n", "vmin", "width")
        .agg(F.min("bucket").alias("bucket"))
        .select(
            (F.col("p_pct") / 100.0).alias("p"),
            F.col("n").cast("long").alias("n"),
            F.col("bucket").cast("long").alias("bucket"),
            (F.col("vmin") + (F.col("bucket") + 1) * F.col("width") - 1)
            .cast("long")
            .alias("est"),
        )
    )


# ----------------------------------------------------------- HyperLogLog

HLL_M = 64          # registers (p = 6 index bits)
HLL_REST_BITS = 54  # 60-bit hash minus the 6 index bits
HLL_ALPHA = 0.709   # alpha_64 (Flajolet et al. 2007, table at m=64)


def hll_registers(
    df: DataFrame, token_col: str = "tok", m: int = HLL_M
) -> DataFrame:
    """HyperLogLog register table ``(bucket, reg)`` over a value
    stream: bucket = low-6-bits of the 60-bit hash, reg = max over the
    bucket's values of (leading zeros of the remaining 54 bits) + 1.

    Duplicates need no pre-distinct — identical values produce an
    identical (bucket, rank), absorbed by the max: that IS the HLL
    trick, distinct-counting with no distinct shuffle. The only
    exchange is the grouped max over at most m=64 keys, with map-side
    combine (each input partition reduces to <= 64 rows first).

    Leading-zero count is string-portable: rank = REST_BITS -
    length(ltrim(bin(rest), '0')) + 1 — DuckDB's bin() zero-pads and
    Spark's conv() does not, ltrim makes both engines agree (rest = 0
    -> empty trim -> rank = REST_BITS + 1, the all-zeros max rank).
    """
    if m != 64:
        raise ValueError("hll_registers: m must be 64 (p = 6 index bits)")
    h = _hex15(F.col(token_col))
    # integer shift, NOT h/m: a 60-bit int is not exactly representable
    # in a double, so float division would corrupt low bits
    rest = F.shiftright(h, 6)
    bitlen = F.length(F.ltrim(F.conv(rest.cast("string"), 10, 2), F.lit("0")))
    return (
        df.select(
            (h % m).alias("bucket"),
            (F.lit(HLL_REST_BITS) - bitlen + 1).alias("rank"),
        )
        .filter(F.col("bucket").isNotNull())
        .groupBy("bucket")
        .agg(F.max("rank").alias("reg"))
    )


def hll_estimate(regs: DataFrame, m: int = HLL_M) -> DataFrame:
    """One-row raw-HLL estimate from a register table:
    ``(m, nonzero_registers, hll_estimate)``.

    The harmonic mean sum(2^-reg) is computed EXACTLY in scaled
    integers — each register contributes 2^(60-reg) (reg <= 55 keeps
    the term integral, empty registers contribute 2^60) — summed as
    DECIMAL so there is no float-order dependence, then the single
    final division runs in doubles (one IEEE op each side, bit-stable
    across engines). Raw estimate only: the small/large-range
    corrections of the paper are driver-side scalar decisions on this
    value, not part of the distributed aggregation.
    """
    term = F.expr("CAST(shiftleft(CAST(1 AS BIGINT), 60 - reg) AS DECIMAL(38,0))")
    agg = regs.agg(
        F.count(F.lit(1)).alias("nonzero_registers"),
        F.sum(term).alias("sum_nz"),
    )
    empty_term = F.expr("CAST(shiftleft(CAST(1 AS BIGINT), 60) AS DECIMAL(38,0))")
    # empty register table (degenerate all-null corpus): sum is null —
    # coalesce to 0 so the estimate degrades to alpha*m, not null
    sum_scaled = (
        F.coalesce(F.col("sum_nz"), F.lit(0).cast("decimal(38,0)"))
        + (F.lit(m) - F.col("nonzero_registers")) * empty_term
    )
    numer = HLL_ALPHA * m * m * float(2**60)
    return agg.select(
        F.lit(m).cast("int").alias("m"),
        F.col("nonzero_registers").cast("long").alias("nonzero_registers"),
        F.round(F.lit(numer) / sum_scaled.cast("double"), 4).alias("hll_estimate"),
    )


def corpus_distinct_hll(
    docs: DataFrame,
    text_col: str = "text",
    m: int = HLL_M,
    k_shingle: int = 3,
) -> DataFrame:
    """Distinct k-shingle estimate for a corpus, one row:
    ``(m, true_distinct, nonzero_registers, hll_estimate)``.

    Distinct-shingle cardinality is the sizing signal for shingle-based
    dedup (it drives MinHash/LSH bucket counts and the exact-substring
    frequency-table size); the sketch answers it in one map-only pass +
    a <= m-row aggregation. ``true_distinct`` is the exact baseline for
    comparison — at real scale you would drop it (it is the full-vocab
    shuffle the sketch exists to avoid) and keep only the register
    aggregation.
    """
    from .dedup import shingles

    sh = docs.select(
        F.explode(shingles(tokens(F.col(text_col)), k_shingle)).alias("tok")
    )
    est = hll_estimate(hll_registers(sh, "tok", m), m)
    truth = sh.agg(F.count_distinct("tok").alias("true_distinct"))
    return est.crossJoin(truth).select(
        "m", "true_distinct", "nonzero_registers", "hll_estimate"
    )
