"""Dataset-curation sampling + sequence packing for training pipelines.

- ``stratified_sample``: keep a deterministic top-n (or fraction) per
  stratum, ranked by md5(seed, id) — a reproducible uniform draw with
  the same md5-lockstep shape as the probabilistic sampler
  (processors/sampler.py), so runs, resumes, and the DuckDB oracle all
  agree bit-for-bit. One window exchange on the strata; no rand().

- ``pack_sequences``: GPT-style concat-and-chunk packing. Documents are
  laid out in a deterministic order (md5-shuffled within each shard so
  adjacent source documents decorrelate), the token stream is cut every
  ``budget`` tokens, and each document reports the pack it STARTS in,
  its offset there, and how many packs it spans (a straddling document
  is split across consecutive packs — the standard pretraining layout).
  Shards partition the work: each shard's packing is independent, so
  the only exchange is the per-shard ordering window and the layout
  scales by adding shards. Deterministic end-to-end: same input =>
  same packs on any cluster size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def stratified_sample(
    df: DataFrame,
    strata: list[str],
    n_per_stratum: int | None = None,
    fraction: float | None = None,
    id_col: str = "doc_id",
    seed: int = 0,
) -> DataFrame:
    """Deterministic per-stratum sample: rank rows inside each stratum
    by md5(seed ':' id) and keep the first ``n_per_stratum``, or a
    ``fraction`` of the stratum (ceil, so tiny strata keep >= 1 row
    when fraction > 0). Exactly one of the two must be given."""
    if (n_per_stratum is None) == (fraction is None):
        raise ValueError("give exactly one of n_per_stratum / fraction")
    key = F.md5(F.concat_ws(":", F.lit(str(seed)), F.col(id_col).cast("string")))
    w = Window.partitionBy(*strata).orderBy(key, id_col)
    ranked = df.withColumn("__rk__", F.row_number().over(w))
    if n_per_stratum is not None:
        keep = F.col("__rk__") <= n_per_stratum
    else:
        # window exprs can't sit in a filter: materialize the cutoff
        size = F.count(F.lit(1)).over(Window.partitionBy(*strata))
        ranked = ranked.withColumn("__cut__", F.ceil(size * F.lit(fraction)))
        keep = F.col("__rk__") <= F.col("__cut__")
    return ranked.filter(keep).drop("__rk__", "__cut__")


def pack_sequences(
    df: DataFrame,
    budget: int,
    tokens_col: str = "n_tokens",
    id_col: str = "doc_id",
    n_shards: int = 1,
    seed: int = 0,
) -> DataFrame:
    """Concat-and-chunk layout: within each shard, documents are ordered
    by md5(seed ':' id) and concatenated; the stream is cut every
    ``budget`` tokens. Returns one row per document:

    - ``shard``      : which independent stream the doc landed in
    - ``pack_id``    : the (shard-local) pack its first token falls in
    - ``pack_offset``: position of its first token within that pack
    - ``n_packs``    : how many packs it spans (>1 = split/straddle)

    Documents longer than ``budget`` simply span several packs, like
    any straddler. Empty documents (0 tokens) occupy no space: they
    report the pack the stream cursor is in, offset = cursor, n_packs 1.
    """
    if budget <= 0:
        raise ValueError("budget must be positive")
    key = F.md5(F.concat_ws(":", F.lit(str(seed)), F.col(id_col).cast("string")))
    shard = (
        F.conv(F.substring(key, 1, 8), 16, 10).cast("bigint") % n_shards
    ).cast("int")
    df = df.withColumn("__shard__", shard)
    w = (
        Window.partitionBy("__shard__")
        .orderBy(key, id_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    start = F.coalesce(F.sum(tokens_col).over(w), F.lit(0))
    end_incl = start + F.greatest(F.col(tokens_col), F.lit(1)) - 1
    return df.select(
        id_col,
        F.col(tokens_col),
        F.col("__shard__").alias("shard"),
        F.floor(start / budget).cast("bigint").alias("pack_id"),
        (start % budget).cast("bigint").alias("pack_offset"),
        (F.floor(end_incl / budget) - F.floor(start / budget) + 1)
        .cast("bigint")
        .alias("n_packs"),
    )


def pack_sequences_nosplit(
    df: DataFrame,
    budget: int,
    tokens_col: str = "n_tokens",
    id_col: str = "doc_id",
    n_shards: int = 1,
    seed: int = 0,
) -> DataFrame:
    """No-split (next-fit) packing for pipelines where documents cannot
    straddle sequences (SFT): within each shard's deterministic
    md5-order, a document opens a new pack when it would overflow the
    current one; a document larger than ``budget`` sits alone in its
    own (overflowing) pack, to be truncated downstream. Returns
    ``(id, tokens, shard, pack_id)``.

    Next-fit is inherently sequential PER SHARD, so the shard is the
    parallelism unit: one Arrow-batched ``applyInPandas`` per shard
    (the same posture as the RFC6587 octet framer — sequential within
    a stream, parallel across streams); scale by adding shards. The
    result is bit-deterministic at any cluster size.
    """
    if budget <= 0:
        raise ValueError("budget must be positive")
    key = F.md5(F.concat_ws(":", F.lit(str(seed)), F.col(id_col).cast("string")))
    shard = (
        F.conv(F.substring(key, 1, 8), 16, 10).cast("bigint") % n_shards
    ).cast("int")
    staged = df.select(
        F.col(id_col), F.col(tokens_col), shard.alias("shard"), key.alias("__key__")
    )

    def pack(pdf):
        pdf = pdf.sort_values(["__key__", id_col]).reset_index(drop=True)
        pack_ids, cur, used = [], 0, 0
        for t in pdf[tokens_col]:
            t = int(t)
            if used > 0 and used + t > budget:
                cur += 1
                used = 0
            pack_ids.append(cur)
            used += t
        pdf = pdf.drop(columns="__key__")
        pdf["pack_id"] = pack_ids
        return pdf

    schema = f"{id_col} long, {tokens_col} long, shard int, pack_id long"
    return staged.groupBy("shard").applyInPandas(pack, schema)


def mixture_sample(
    df: DataFrame,
    weights: dict[str, float],
    total_budget_tokens: int,
    source_col: str = "source",
    text_col: str = "text",
    id_col: str = "doc_id",
    seed: int = 7,
) -> DataFrame:
    """Token-budget data mixing: draw a training mixture whose
    per-source token mass tracks ``weights[source] *
    total_budget_tokens`` — the mixture-table step every pretraining
    pipeline runs (The Pile, LLaMA: so-many-% web, so-many-% books).

    Rate-based, not prefix-based: each source's keep probability is
    ``p_s = min(1, budget_s / tokens_s)`` and a document survives iff
    its deterministic md5 bucket (the probabilistic sampler's
    ``_bucket``, processors/sampler.py — bit-exact in DuckDB) falls
    below ``floor(p_s * 10000)``. The budget is met in expectation,
    ±binomial noise — the price of the formulation that scales: an
    exact-prefix cut needs a running token sum ordered within each
    source, and a per-source cumulative window serializes the biggest
    source into ONE task (the same skew trap as exact_dedup's old
    row_number plan). Here the only aggregate is a map-side-combined
    per-source token total (one tiny row per source), the rates come
    back via a broadcast join, and the keep decision is a zero-shuffle
    projection — the 100 TB shape.

    Sources missing from ``weights`` are dropped (budget 0). Sources
    whose corpus is SMALLER than their budget keep everything (the
    ``min(1, ·)`` cap) — upsampling is a training-loader concern, not
    a filter's. Returns ``(id, source, n_tokens)`` for kept docs.

    Determinism: same input + seed => the same sample on any cluster
    size, any partitioning — the hash is per-row content, never
    rand()/monotonically_increasing_id.
    """
    from ..processors.sampler import _bucket
    from .dedup import tokens

    n_tok = F.size(tokens(F.col(text_col)))
    totals = (
        df.select(F.col(source_col), n_tok.alias("__t"))
        .groupBy(source_col)
        .agg(F.sum("__t").alias("__tot"))
    )
    entries: list = []
    for s, w in weights.items():
        entries += [F.lit(s), F.lit(float(w))]
    wmap = F.create_map(*entries)
    # try_element_at: a source absent from the map must never raise an
    # ANSI MAP_KEY error under driver sessions; the coalesce to 0.0 is
    # load-bearing — least() SKIPS nulls, so a null budget reaching
    # least(10000, floor(null)) would read as keep-everything
    budget = F.coalesce(
        F.try_element_at(wmap, F.col(source_col)), F.lit(0.0)
    ) * F.lit(float(total_budget_tokens))
    rates = totals.select(
        source_col,
        F.when(
            F.col("__tot") > 0,
            F.least(F.lit(10000), F.floor(10000.0 * budget / F.col("__tot"))),
        )
        .otherwise(0)
        .cast("bigint")
        .alias("__cut"),
    )
    keep = _bucket(
        F.col(id_col).cast("string"), seed, "md5"
    ) < F.col("__cut")
    return (
        df.select(F.col(id_col), F.col(source_col), n_tok.alias("n_tokens"))
        .join(F.broadcast(rates), source_col)
        .filter(keep)
        .select(id_col, source_col, "n_tokens")
    )


def dsir_sample(
    df: DataFrame,
    target,
    k: int = 100,
    n_buckets: int = 256,
    text_col: str = "text",
    id_col: str = "doc_id",
    seed: int = 29,
) -> DataFrame:
    """DSIR — Data Selection via Importance Resampling (Xie, Santurkar,
    Ma, Liang, NeurIPS 2023): pick the ``k`` raw documents that look
    most like a small TARGET corpus, by importance weights computed in
    a hashed n-gram feature space.

    ``target`` is a boolean Column marking the target rows inside
    ``df`` (e.g. ``F.col("lang") == "en"`` — the paper's target is any
    trusted high-quality slice). Features are unigram occurrences
    hashed into ``n_buckets`` buckets (md5 nibble-parse, the repo's
    portable hash); bucket distributions are add-one smoothed, and a
    document's log importance weight is the sum over its token
    occurrences of ``ln p_target(b) - ln p_raw(b)``. Resampling is
    Gumbel top-k (the paper's without-replacement sampler): each doc
    adds a deterministic standard-Gumbel draw ``-ln(-ln(u))`` with
    ``u`` from the md5 sampler bucket, and the top ``k`` by perturbed
    weight are kept.

    Scaled-int discipline (the repo-wide float rule): the per-BUCKET
    log-ratio and the per-DOC Gumbel draw are quantized to 1e-4 units
    BEFORE the per-doc sum, so every aggregate and the final ordering
    are pure integer math — immune to float-summation order, bit-equal
    in the DuckDB twin. Returns
    ``(id, dsir_w_q4, gumbel_q4, score_q4)`` for the selected docs;
    documents with zero tokens have no features and are never selected
    (an empty doc carries no evidence it resembles the target).

    100 TB posture: the corpus tokenizes exactly TWICE — the fit pass
    (map-only explode with map-side combine into per-bucket partials —
    the model aggregate ships ``n_buckets`` rows per partition, not per
    token; the count table is then checkpointed so its two derivations
    don't re-run the pass) and the score pass, the same two passes the
    DSIR estimator inherently needs; the
    ``n_buckets``-row log-ratio model comes back via a broadcast join
    (zero shuffle); the per-doc weight sum is ONE exchange keyed by
    doc id; and the final selection is ``orderBy(...).limit(k)`` =
    ``TakeOrderedAndProject`` — a per-partition k-heap merged on the
    driver, never a full sort shuffle. Nothing is quadratic; the only
    all-corpus state is 2 x ``n_buckets`` counts.
    """
    from .dedup import tokens

    tok = F.explode(tokens(F.col(text_col)))
    feats = df.select(
        F.col(id_col), target.alias("__tgt"), tok.alias("__tok")
    ).select(
        id_col,
        "__tgt",
        (
            F.conv(F.substring(F.md5("__tok"), 1, 15), 16, 10).cast("bigint")
            % n_buckets
        ).alias("__b"),
    )
    # materialize the <= n_buckets-row count table ONCE: both `totals`
    # and `model` derive from it, and without the checkpoint each
    # derivation re-runs the corpus tokenize+aggregate from the scan
    # (a third full pass — measured as an extra exchange in the plan)
    counts = feats.groupBy("__b").agg(
        F.count(F.lit(1)).alias("__raw_c"),
        F.sum(F.when(F.col("__tgt"), 1).otherwise(0)).alias("__tgt_c"),
    ).localCheckpoint()
    totals = counts.agg(
        F.sum("__raw_c").alias("__raw_t"), F.sum("__tgt_c").alias("__tgt_t")
    )
    lr = (
        F.log((F.col("__tgt_c") + 1.0) / (F.col("__tgt_t") + n_buckets))
        - F.log((F.col("__raw_c") + 1.0) / (F.col("__raw_t") + n_buckets))
    )
    model = counts.crossJoin(F.broadcast(totals)).select(
        "__b", F.floor(lr * 10000 + 0.5).cast("bigint").alias("__lr_q4")
    )
    weights = (
        feats.join(F.broadcast(model), "__b")
        .groupBy(id_col)
        .agg(F.sum("__lr_q4").alias("dsir_w_q4"))
    )
    # u in (0, 1) strictly — (bucket + 0.5) / 10000 never hits either
    # endpoint, so both ln() arguments stay positive under ANSI
    from ..processors.sampler import _bucket

    u = (_bucket(F.col(id_col).cast("string"), seed, "md5") + 0.5) / 10000.0
    g_q4 = F.floor(-F.log(-F.log(u)) * 10000 + 0.5).cast("bigint")
    return (
        weights.select(
            id_col,
            "dsir_w_q4",
            g_q4.alias("gumbel_q4"),
            (F.col("dsir_w_q4") + g_q4).alias("score_q4"),
        )
        .orderBy(F.col("score_q4").desc(), F.col(id_col))
        .limit(k)
    )


def source_kl_divergence(
    df: DataFrame,
    n_buckets: int = 256,
    text_col: str = "text",
    source_col: str = "source",
) -> DataFrame:
    """Mixture diagnostics: per-source KL divergence of the hashed
    unigram distribution vs the whole corpus — "which sources look
    least like the blend I'm training on?" (the monitoring twin of
    ``mixture_sample``/``dsir_sample``: mixing tables set the weights,
    this measures the drift those weights produce).

    Features are the DSIR feature space verbatim: unigrams hashed to
    ``n_buckets`` md5 buckets, add-one smoothing. For each source ``s``
    with bucket counts ``c_sb`` (total ``n_s``) against corpus bucket
    totals ``c_b`` (total ``n``),

        KL(s || corpus) = sum_b p_s(b) * (ln p_s(b) - ln p_c(b)),
        p_s(b) = (c_sb + 1)/(n_s + B),   p_c(b) = (c_b + 1)/(n + B)

    summed over ALL B buckets (smoothing makes every term finite).
    Returns ``(source, n_tokens, kl_q8)`` with the divergence in 1e-8
    units: each per-bucket term is quantized BEFORE the per-source sum
    (the DSIR ln-then-quantize discipline), so the aggregate is pure
    integer math — float-order-proof and DuckDB-lockstep.

    100 TB posture: ONE corpus pass (map-only explode into a
    groupBy(source, bucket) whose map-side combine caps each
    partition's shuffle output at sources x B rows); the count table is
    localCheckpoint-ed once and every later step — per-source totals,
    per-bucket corpus totals, the dense sources x B grid, the term
    projection — runs on that tiny table with broadcast joins. Zero
    second passes, nothing proportional to corpus size after the first
    aggregate. Sources with no tokens have no distribution and emit no
    row (the DSIR empty-doc rule).
    """
    from .dedup import tokens

    tok = F.explode(tokens(F.col(text_col)))
    feats = df.select(F.col(source_col).alias("source"), tok.alias("__tok")).select(
        "source",
        (
            F.conv(F.substring(F.md5("__tok"), 1, 15), 16, 10).cast("bigint")
            % n_buckets
        ).alias("__b"),
    )
    counts = (
        feats.groupBy("source", "__b")
        .agg(F.count(F.lit(1)).alias("__c"))
        .localCheckpoint()
    )
    ns = counts.groupBy("source").agg(F.sum("__c").alias("__n_s"))
    cb = counts.groupBy("__b").agg(F.sum("__c").alias("__c_b"))
    tot = counts.agg(F.sum("__c").alias("__n"))
    grid = (
        ns.select("source", "__n_s")
        .crossJoin(F.broadcast(tot))
        .select(
            "source",
            "__n_s",
            "__n",
            F.explode(F.sequence(F.lit(0), F.lit(n_buckets - 1))).alias("__b"),
        )
    )
    joined = grid.join(F.broadcast(counts), ["source", "__b"], "left").join(
        F.broadcast(cb), "__b", "left"
    )
    p_s = (F.coalesce(F.col("__c"), F.lit(0)) + 1.0) / (
        F.col("__n_s") + F.lit(n_buckets)
    )
    p_c = (F.coalesce(F.col("__c_b"), F.lit(0)) + 1.0) / (
        F.col("__n") + F.lit(n_buckets)
    )
    term_q8 = F.floor(p_s * (F.log(p_s) - F.log(p_c)) * 1e8 + 0.5).cast("bigint")
    return (
        joined.select("source", "__n_s", term_q8.alias("__t"))
        .groupBy("source")
        .agg(
            F.first("__n_s").alias("n_tokens"),
            F.sum("__t").alias("kl_q8"),
        )
    )


def mixture_temperature(
    df: DataFrame,
    alpha: float = 0.3,
    source_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """Temperature-scaled source mixing weights (the mT5 / multilingual
    alpha-sampling rule, Xue et al. 2021 §3.2: sample source ``s`` with
    probability proportional to ``p_s^alpha``) — the table that FEEDS
    :func:`mixture_sample`'s ``weights`` dict. ``alpha < 1`` upweights
    the tail (low-resource sources), ``alpha = 1`` is natural
    proportions, ``alpha = 0`` is uniform.

    Returns one row per source: ``(source, n_docs, n_tokens, p_raw,
    p_temp, boost)`` where ``p_raw = tokens_s / total_tokens``,
    ``p_temp ∝ p_raw^alpha`` (normalized), ``boost = p_temp / p_raw``
    (the effective over/under-sampling factor a loader applies).

    Scale shape: ONE map-side-combined groupBy over the corpus produces
    a |sources|-row frame; the normalizations are unpartitioned window
    sums over THAT frame — driver-scale metadata, never the corpus
    (contrast exact-prefix mixing, whose per-source cumulative window
    would serialize the corpus). Cross-engine determinism: ``p_raw^alpha``
    is quantized to 1e9 fixed point BEFORE the normalizing sum, so the
    sum is exact integer math in any partition/accumulation order and
    the DuckDB twin reproduces it bit-for-bit; p_raw's own denominator
    is an exact BIGINT token sum.
    """
    from .dedup import tokens

    # null text must contribute a NULL (sum-skipped) count, not the
    # non-ANSI size() = -1 which would subtract token mass and make an
    # all-null source's pow(negative, alpha) a NaN
    n_tok = F.when(
        F.col(text_col).isNotNull(), F.size(tokens(F.col(text_col)))
    )
    per = (
        df.select(F.col(source_col), n_tok.alias("__t"))
        .groupBy(source_col)
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("__t").alias("n_tokens"),
        )
    )
    w = Window.partitionBy()
    p_raw = F.col("n_tokens") / F.sum("n_tokens").over(w)
    pow_q = F.round(F.pow(p_raw, F.lit(float(alpha))) * 1e9).cast("bigint")
    p_temp = pow_q / F.sum(pow_q).over(w)
    return per.select(
        source_col,
        "n_docs",
        "n_tokens",
        F.round(p_raw, 6).alias("p_raw"),
        F.round(p_temp, 6).alias("p_temp"),
        F.round(F.try_divide(p_temp, p_raw), 4).alias("boost"),
    )


def pack_stats(packed: DataFrame, budget: int) -> DataFrame:
    """Packing-efficiency report over a :func:`pack_sequences` layout
    -- the loader-facing numbers a pipeline checks before committing a
    sequence-length budget: per shard, how many packs the stream cut
    into, the fill rate (token mass over pack capacity -- concat-and-
    chunk wastes only the final partial pack, so this should sit near
    1.0; a low value means the budget dwarfs the corpus slice), and
    the straddler fraction (docs split across pack boundaries, the
    attention-masking cost of the concat layout).

    Returns per shard: ``(shard, n_docs, n_tokens, packs_used,
    fill_rate_q4, straddle_frac_q4)``. One map-side-combined groupBy
    over the (already doc-grained) layout frame -- metadata-scale.
    """
    # zero-token docs occupy no space but REPORT the pack the stream
    # cursor is in — at an exact pack boundary that is the NEXT (never
    # written) pack, so only token-bearing docs may count toward
    # packs_used (a phantom pack would halve the fill rate of a
    # perfectly packed shard)
    last_pack = F.when(
        F.col("n_tokens") > 0, F.col("pack_id") + F.col("n_packs") - 1
    )
    n = F.count(F.lit(1))
    packs = F.coalesce(F.max(last_pack) + 1, F.lit(0))
    toks = F.sum("n_tokens")
    straddle = F.sum(F.when(F.col("n_packs") > 1, 1).otherwise(0))
    return packed.groupBy("shard").agg(
        n.cast("bigint").alias("n_docs"),
        toks.cast("bigint").alias("n_tokens"),
        packs.cast("bigint").alias("packs_used"),
        F.floor(
            F.try_divide(10000.0 * toks, packs * F.lit(int(budget)))
            + F.lit(0.5)
        )
        .cast("bigint")
        .alias("fill_rate_q4"),
        F.floor(10000.0 * straddle / n + F.lit(0.5))
        .cast("bigint")
        .alias("straddle_frac_q4"),
    )
