"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard.

Scale posture (100 TB corpus):

- ``exact_dedup``: one shuffle on the content hash; AQE splits skewed
  hash buckets (boilerplate dup clusters are the classic hot key).
- ``minhash_signatures``: pure projection — zero shuffle; signatures
  are computed inside whole-stage codegen from the token array, no
  Python in the row path.
- ``lsh_candidate_pairs``: explodes b band rows per doc and self-joins
  on (band, band_hash) — the join key is the bucket, so only docs
  sharing a bucket ever meet (|candidates| << n^2). A giant bucket
  (e.g. empty docs) is quadratic in that bucket only; cap via
  ``max_bucket`` which drops degenerate buckets, mirroring how the
  reference caps unbounded state (recombine ``max_unmatched_batch_size``,
  /root/reference pkg/stanza/operator/transformer/recombine/transformer.go:151-158).
- ``simhash``: one explode + one grouped aggregation (map-side partial
  combine applies); 32 conditional sums per group, all codegen.
- ``ngram_jaccard_pairs``: exact pairwise set overlap via a shingle
  inverted index join — the exact (expensive) baseline that MinHash/LSH
  approximates; at scale run it only on LSH candidates.

Hashes are md5 hex strings: identical byte-for-byte in Spark and
DuckDB, so every op here is oracle-checkable (minhash "permutations"
are md5 with a seed prefix; lexicographic min over uniform hex strings
is a valid min-hash).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def tokens(col: Column) -> Column:
    """Whitespace tokens with empties removed (DuckDB-lockstep:
    ``list_filter(string_split(x, ' '), t -> t != '')``)."""
    return F.filter(F.split(col, " "), lambda t: t != "")


def shingles(toks: Column, k: int = 3) -> Column:
    """k-word shingles joined by a single space."""
    idx = F.when(
        F.size(toks) >= k, F.sequence(F.lit(0), F.size(toks) - k)
    ).otherwise(F.array().cast("array<int>"))
    return F.transform(
        idx, lambda i: F.concat_ws(" ", F.slice(toks, i + 1, k))
    )


def _ordered_pair_explode(groups: DataFrame) -> DataFrame:
    """Shared in-group ordered-pair expansion: a frame with a sorted
    ``ids`` array column -> one row per (a_id, b_id) with a < b (free
    from the sort). One copy for lsh_candidate_pairs AND
    winnow_match_pairs so the slice bound / struct shape cannot
    diverge."""
    ids = F.col("ids")
    pair_arrays = F.transform(
        ids,
        lambda x, i: F.transform(
            F.slice(ids, i + 2, F.size(ids)),
            lambda y: F.struct(x.alias("a_id"), y.alias("b_id")),
        ),
    )
    return groups.select(F.explode(F.flatten(pair_arrays)).alias("p")).select(
        "p.a_id", "p.b_id"
    )


def exact_dedup(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Keep the lowest-id row per exact content hash.

    True hash-groupBy, not a window: ``groupBy(hash).agg(min(id))`` gets
    map-side partial aggregation (partial/final HashAggregate), so a
    viral duplicate class — millions of copies of one document sharing
    one hash — is reduced to one (hash, min_id) row per input partition
    before the shuffle. A ``row_number() over (partition by hash)``
    window would instead ship EVERY copy to one task (AQE skew-split
    does not apply to windows). The semi-join back keys on the
    composite (hash, id), which is unique per row, so the join shuffle
    is skew-free too. Same rows out as the window formulation —
    including null text: md5(null) is null, groupBy groups nulls into
    one class (as a window partition would), and the join back is
    null-SAFE on the hash so the null class's winner survives instead
    of vanishing through a null == null comparison.
    """
    h = F.md5(F.col(text_col))
    winners = (
        df.select(h.alias("__h"), F.col(id_col).alias("__w_id"))
        .groupBy("__h")
        .agg(F.min("__w_id").alias("__w_id"))
    )
    keyed = df.withColumn("__h", h)
    return keyed.join(
        winners,
        on=[keyed["__h"].eqNullSafe(winners["__h"]), keyed[id_col] == winners["__w_id"]],
        how="left_semi",
    ).drop("__h")


MINHASH_P = 1_000_000_007


def minhash_params(n_hashes: int) -> list[tuple[int, int]]:
    """Deterministic (a, b) affine-permutation constants per hash."""
    return [
        ((j * 2 + 1) * 40503 % MINHASH_P, (j * 7919 + 13) % MINHASH_P)
        for j in range(n_hashes)
    ]


def minhash_signatures(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_hashes: int = 16,
    k: int = 3,
) -> DataFrame:
    """(id, sig ARRAY<BIGINT>[n_hashes]) — universal-hash min-hash:
    each shingle is md5'd ONCE into a 60-bit int h (first 15 hex chars),
    then sig_j = min over shingles of (a_j*h + b_j) mod p. One md5 per
    shingle + n_hashes cheap affine transforms, vs n_hashes md5s per
    shingle for the seeded-md5 formulation (~8x less hashing at
    n_hashes=8; measured 30s -> ~4s on 5k docs).

    Pure projection, no shuffle. The shingle-hash array materializes as
    its own projection step: CollapseProject keeps non-cheap aliases
    used more than once, so the md5 pass runs once, not n_hashes times.
    """
    sh = shingles(tokens(F.col(text_col)), k)
    h = F.transform(
        sh,
        lambda s: F.conv(F.substring(F.md5(s), 1, 15), 16, 10).cast("bigint")
        % MINHASH_P,
    )
    staged = df.select(F.col(id_col), h.alias("__hs"))
    def affine(a: int, b: int):
        # factory keeps the lambda arity-1 (arity-2 would be treated by
        # F.transform as an (element, index) lambda)
        return lambda x: (a * x + b) % MINHASH_P

    sig = F.array(
        *[
            F.array_min(F.transform(F.col("__hs"), affine(a, b)))
            for a, b in minhash_params(n_hashes)
        ]
    )
    return staged.select(F.col(id_col), sig.alias("sig"))


def lsh_candidate_pairs(
    sigs: DataFrame,
    id_col: str = "doc_id",
    bands: int = 4,
    rows_per_band: int = 4,
    max_bucket: int | None = 10000,
) -> DataFrame:
    """Banded LSH: docs sharing any band hash become a candidate pair
    (a < b). ``max_bucket`` drops buckets larger than the cap (skew
    guard: one degenerate bucket — boilerplate/empty docs sharing a
    band hash — makes the in-bucket pair expansion quadratic with no
    other bound, the classic silent scale-killer at 100 TB). The
    default 10k cap only trims buckets that are certainly degenerate
    (10k true near-dups of one doc still surface through the other
    bands); pass ``None`` to disable, or a tighter cap (the headline
    queries use 200) to bound worst-case work, mirroring the
    reference's bounded-state recombine caps
    (pkg/stanza/operator/transformer/recombine/transformer.go:151-158).
    """
    # loud misconfiguration guard: a band sliced past the signature
    # length yields an EMPTY array -> md5('') identical for every doc —
    # one degenerate full-corpus bucket (or, capped, silently fewer
    # effective bands than configured). The assert is FOLDED into the
    # band-hash expression (an unused guard column would be pruned);
    # when it passes, coalesce turns its null into '' and the hash is
    # unchanged.
    sig_guard = F.coalesce(
        F.assert_true(
            F.size("sig") >= bands * rows_per_band,
            F.concat(
                F.lit(
                    f"lsh_candidate_pairs: bands*rows_per_band="
                    f"{bands * rows_per_band} exceeds signature length "
                ),
                F.size("sig").cast("string"),
            ),
        ).cast("string"),
        F.lit(""),
    )
    band_rows = sigs.select(
        F.col(id_col),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("band"),
                        F.concat(
                            sig_guard,
                            F.md5(
                                F.concat_ws(
                                    "|",
                                    F.transform(
                                        F.slice(
                                            "sig", i * rows_per_band + 1, rows_per_band
                                        ),
                                        lambda x: x.cast("string"),
                                    ),
                                )
                            ),
                        ).alias("bh"),
                    )
                    for i in range(bands)
                ]
            )
        ).alias("b"),
    ).select(id_col, "b.band", "b.bh")
    # ONE grouped collect per bucket + in-bucket pair expansion, NOT a
    # self-join: a self-join of `band_rows` against itself executes the
    # (expensive) signature+banding subtree TWICE — the two sides alias
    # doc_id differently, so canonicalized plans differ and Spark's
    # ReuseExchange never fires. The groupBy computes signatures once,
    # shuffles once on the bucket key, and emits each bucket's ordered
    # pairs locally (sorted ids make a_id < b_id free). Measured at
    # sf0.1: 6.9s -> ~4s for the dedup_minhash_lsh query.
    buckets = (
        band_rows.groupBy("band", "bh")
        .agg(F.sort_array(F.collect_list(F.col(id_col))).alias("ids"))
        .filter(F.size("ids") > 1)
    )
    if max_bucket is not None:
        buckets = buckets.filter(F.size("ids") <= max_bucket)
    return _ordered_pair_explode(buckets).distinct()


def simhash(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    bits: int = 32,
) -> DataFrame:
    """(id, simhash BIGINT) — sign-sum over token hashes. Token hash =
    first 8 hex chars of md5 as a 32-bit int; bit j of the signature is
    1 iff sum over tokens of (+1 if bit j set else -1) > 0.

    One explode + one grouped agg; partial (map-side) combine applies.
    EVERY input doc keeps a row (sibling ops' contract): a doc with no
    tokens (empty/null text) carries a NULL simhash — the explode alone
    would silently drop it from the frame.
    """
    tok = df.select(
        F.col(id_col), F.explode(tokens(F.col(text_col))).alias("tok")
    )
    hv = F.conv(F.substring(F.md5("tok"), 1, 8), 16, 10).cast("bigint")
    tok = tok.select(id_col, hv.alias("hv"))
    sums = tok.groupBy(id_col).agg(
        *[
            F.sum(
                F.when(F.floor(F.col("hv") / (1 << j)) % 2 == 1, 1).otherwise(-1)
            ).alias(f"s{j}")
            for j in range(bits)
        ]
    )
    sig = None
    for j in range(bits):
        term = F.when(F.col(f"s{j}") > 0, F.lit(1 << j)).otherwise(F.lit(0))
        sig = term if sig is None else sig + term
    out = sums.select(F.col(id_col), sig.cast("bigint").alias("simhash"))
    return df.select(F.col(id_col)).join(out, id_col, "left")


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    threshold: float = 0.8,
) -> DataFrame:
    """Exact Jaccard over distinct k-shingle sets via an inverted-index
    self-join; returns (a_id, b_id, jaccard) with jaccard >= threshold.

    # ORACLE-ONLY: exact baseline whose inverted-index self-join blows
    up on any high-document-frequency shingle — never compose into a
    production pipeline over an unbounded frame. The scale path is the
    MinHash/LSH funnel (``lsh_candidate_pairs`` -> bucketed candidates
    -> ``jaccard_verify_pairs``), where verify cost is proportional to
    candidates.
    """
    sh = df.select(
        F.col(id_col),
        F.array_distinct(shingles(tokens(F.col(text_col)), k)).alias("sh"),
    )
    sizes = sh.select(id_col, F.size("sh").alias("n"))
    inv = sh.select(id_col, F.explode("sh").alias("s"))
    pairs = (
        inv.alias("x")
        .join(inv.alias("y"), "s")
        .filter(F.col(f"x.{id_col}") < F.col(f"y.{id_col}"))
        .groupBy(
            F.col(f"x.{id_col}").alias("a_id"), F.col(f"y.{id_col}").alias("b_id")
        )
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    na = sizes.select(F.col(id_col).alias("a_id"), F.col("n").alias("na"))
    nb = sizes.select(F.col(id_col).alias("b_id"), F.col("n").alias("nb"))
    jac = F.col("inter") / (F.col("na") + F.col("nb") - F.col("inter"))
    # na/nb are one row per DOCUMENT — a forced broadcast is O(corpus)
    # and would OOM at scale; the joins key on the pair ids, so AQE
    # picks broadcast only when the sides are actually small
    return (
        pairs.join(na, "a_id")
        .join(nb, "b_id")
        .select("a_id", "b_id", F.round(jac, 4).alias("jaccard"))
        .filter(F.col("jaccard") >= threshold)
    )


def passage_dedup_stats(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    words_per_passage: int = 10,
) -> DataFrame:
    """Per-document cross-corpus duplicate-passage fraction — the
    passage-window approximation of exact-substring dedup (Lee et al.
    2021, "Deduplicating Training Data Makes Language Models Better",
    arXiv:2107.06499; C4/RefinedWeb-style pipelines drop or trim
    documents on this signal rather than whole-doc hashes, because
    boilerplate repeats at passage granularity).

    Each document is split into consecutive NON-overlapping
    ``words_per_passage``-word passages (same whitespace tokens as the
    other dedup ops); a passage is a duplicate when its exact text
    occurs in at least one OTHER document. Returns one row per input
    document: ``(id_col, n_passages, dup_passages, dup_passage_frac)``
    — zero-token documents keep a row with ``n_passages = 0`` and a
    null fraction.

    Scale posture (100 TB): the explode is a map-only ~n_words/k row
    multiplier; the frequency table groups md5(passage) over DISTINCT
    (hash, doc) pairs, so partial aggregation applies and a boilerplate
    passage shared by millions of documents is still ONE frequency row;
    the join back keys on the hash (shuffle hash join, no broadcast of
    anything corpus-sized). No pairwise term anywhere — unlike the
    LSH/jaccard ops this needs no bucket cap.
    """
    if words_per_passage < 1:
        raise ValueError("words_per_passage must be >= 1")
    k = words_per_passage
    toks = tokens(F.col(text_col))
    idx = F.when(
        F.size(toks) > 0,
        F.sequence(F.lit(0), F.ceil(F.size(toks) / k).cast("int") - 1),
    ).otherwise(F.array().cast("array<int>"))
    passages = F.transform(idx, lambda i: F.concat_ws(" ", F.slice(toks, i * k + 1, k)))
    ex = df.select(F.col(id_col), F.explode(passages).alias("__p__")).select(
        id_col, F.md5("__p__").alias("__h__")
    )
    freq = (
        ex.distinct()
        .groupBy("__h__")
        .agg(F.count(F.lit(1)).alias("__docs_with__"))
    )
    per_doc = (
        ex.join(freq, "__h__")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_passages"),
            F.sum((F.col("__docs_with__") > 1).cast("long")).alias("dup_passages"),
        )
    )
    return (
        df.select(id_col)
        .join(per_doc, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_passages", F.lit(0)).cast("long").alias("n_passages"),
            F.coalesce("dup_passages", F.lit(0)).cast("long").alias("dup_passages"),
            F.round(F.col("dup_passages") / F.col("n_passages"), 4).alias(
                "dup_passage_frac"
            ),
        )
    )


def connected_components(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    a_col: str = "a_id",
    b_col: str = "b_id",
    max_iter: int = 20,
) -> DataFrame:
    """Candidate pairs -> dedup clusters: every document gets the
    MINIMUM id reachable through the pair graph as its ``cluster_id``
    (documents in no pair keep their own id). This is the step between
    LSH candidate generation and actual dedup at scale: keep one
    canonical doc per cluster (``cluster_id == doc_id``), drop the rest.

    Distributed min-label propagation over the NEAR-DUP SUBGRAPH only:
    a document outside every candidate pair can never change label, so
    the iterative loop runs on the edge-endpoint nodes (for web-scale
    corpora a tiny fraction of the table) and the full corpus is
    labeled once at the end with a single left join — the loop cost is
    proportional to the duplicate graph, not the corpus. Per round,
    every node adopts the smallest label among itself and its
    neighbors — one shuffle join + one grouped min — converging in
    O(graph diameter) rounds (near-dup clusters are shallow). Each
    round materializes via localCheckpoint so the plan does not grow
    with iterations, and the edge list is checkpointed ONCE so the
    candidate-pair pipeline (MinHash signatures + bucket shuffle) is
    not re-run from the source scan every iteration — the standard
    iterative-algorithm posture on a 1000-executor cluster
    (GraphX/Pregel does the same). The driver-side loop reads ONE
    scalar (changed-count) per round; all data stays distributed.
    """
    ids = F.col(id_col)
    # materialize the pair frame BEFORE the symmetric union: the two
    # direction branches of a union are planned independently (no CSE
    # across branches), so unioning the raw frame would execute the
    # whole candidate-pair pipeline (MinHash signatures + bucket
    # shuffle + verify) TWICE inside the edges checkpoint below
    pairs = pairs.select(a_col, b_col).localCheckpoint(eager=True)
    # undirected edge list
    edges = (
        pairs.select(F.col(a_col).alias("src"), F.col(b_col).alias("dst"))
        .unionByName(pairs.select(F.col(b_col).alias("src"), F.col(a_col).alias("dst")))
        .distinct()
    )
    # materialize ONCE: every round's join re-evaluates its inputs, and
    # edges' lineage is the whole candidate-pair pipeline — without this
    # checkpoint each iteration re-runs that subtree from the source scan
    edges = edges.localCheckpoint(eager=True)
    # loop only over nodes that have at least one edge (src covers every
    # endpoint since edges are symmetric)
    labels = edges.select(F.col("src").alias("node")).distinct().select(
        "node", F.col("node").alias("cluster_id")
    )
    labels = labels.localCheckpoint(eager=True)
    for _ in range(max_iter):
        neighbor_min = (
            edges.join(labels, edges.src == labels.node)
            .groupBy(F.col("dst").alias("node"))
            .agg(F.min("cluster_id").alias("__nmin__"))
        )
        updated = (
            labels.join(neighbor_min, "node", "left")
            .select(
                "node",
                F.least(
                    F.col("cluster_id"), F.coalesce("__nmin__", F.col("cluster_id"))
                ).alias("cluster_id"),
                (F.coalesce("__nmin__", F.col("cluster_id")) < F.col("cluster_id")).alias(
                    "__chg__"
                ),
            )
        )
        updated = updated.localCheckpoint(eager=True)
        changed = updated.filter(F.col("__chg__")).limit(1).count()
        labels = updated.drop("__chg__")
        if changed == 0:
            break
    else:
        # min-label propagation needs O(graph diameter) rounds; leaving
        # the loop still-changing would hand back INCONSISTENT labels
        # (one component, several cluster_ids) and downstream dedup
        # would silently keep duplicates — refuse instead
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} rounds "
            f"(duplicate-graph diameter exceeds max_iter; raise max_iter)"
        )
    # label the full corpus: docs in no pair keep their own id; AQE
    # picks a broadcast join when the subgraph labels are small
    return docs.select(ids).join(
        labels.withColumnRenamed("node", id_col), id_col, "left"
    ).select(ids, F.coalesce("cluster_id", ids).alias("cluster_id"))


def contamination_check(
    train: DataFrame,
    eval_df: DataFrame,
    k: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Train/eval decontamination: ``(id, n_shared)`` for every training
    document sharing at least one k-word shingle with ANY eval document
    (the benchmark-leakage filter every pretraining pipeline runs before
    training; drop or down-weight the flagged docs).

    Scale posture: the eval set's distinct shingles are the SMALL side
    and broadcast — the training corpus is scanned once, exploded to
    (id, shingle), and probes the broadcast set with zero shuffle for
    the join; the only exchange is the per-doc count aggregation (and
    its map-side combine makes the shuffle rows-per-contaminated-doc,
    not rows-per-shingle-hit).
    """
    ev = (
        eval_df.select(
            F.explode(F.array_distinct(shingles(tokens(F.col(text_col)), k))).alias(
                "__s__"
            )
        )
        .distinct()
    )
    tr = train.select(
        F.col(id_col),
        F.explode(F.array_distinct(shingles(tokens(F.col(text_col)), k))).alias(
            "__s__"
        ),
    )
    return (
        tr.join(F.broadcast(ev), "__s__")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )


def jaccard_verify_pairs(
    df: DataFrame,
    pairs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    threshold: float = 0.8,
    a_col: str = "a_id",
    b_col: str = "b_id",
) -> DataFrame:
    """The verify stage of production fuzzy dedup (Lee et al. 2021 /
    RefinedWeb): exact k-shingle Jaccard computed ONLY on the LSH
    candidate pairs, never corpus-wide. ``lsh_candidate_pairs`` bounds
    recall cheaply but admits band-collision false positives; this
    filters them with the exact measure. Returns
    ``(a_col, b_col, jaccard)`` for candidates with ``jaccard >=
    threshold``.

    Contrast both alternatives: :func:`ngram_jaccard_pairs` is the
    exact corpus-wide baseline (inverted-index self-join — the oracle
    posture, not the scale posture); verifying INSIDE the bucket
    explosion would re-shingle per pair occurrence. Here each side's
    distinct shingle set materializes once per DOCUMENT and the
    intersection is a per-row ``array_intersect`` — zero explode, and
    total verify cost is proportional to the CANDIDATE count, which is
    the entire point of LSH.

    Plan shape: two hash joins keying the candidate list against the
    per-doc shingle sets (AQE broadcasts the candidate side when it is
    small, the common case) + a zero-shuffle projection for the set
    math. Skew note: a doc appearing in many candidate pairs is just a
    popular join key — AQE skew-split applies (joins, unlike windows,
    split fine).
    """
    sh = df.select(
        F.col(id_col),
        F.array_distinct(shingles(tokens(F.col(text_col)), k)).alias("__sh"),
    )
    sa = sh.select(F.col(id_col).alias(a_col), F.col("__sh").alias("__sa"))
    sb = sh.select(F.col(id_col).alias(b_col), F.col("__sh").alias("__sb"))
    inter = F.size(F.array_intersect("__sa", "__sb"))
    union = F.size("__sa") + F.size("__sb") - inter
    # 0/0 (two shingle-less docs can only be candidates if the caller
    # fed degenerate signatures, but stay ANSI-safe): null jaccard
    # drops at the threshold filter, matching the SQL twin
    jac = F.round(F.try_divide(inter, union), 4)
    return (
        pairs.select(a_col, b_col)
        .join(sa, a_col)
        .join(sb, b_col)
        .select(a_col, b_col, jac.alias("jaccard"))
        .filter(F.col("jaccard") >= threshold)
    )


def line_dedup(
    df: DataFrame,
    min_dup: int = 2,
    sep: str = "\n",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Corpus-level exact line deduplication (the RefinedWeb / CCNet
    posture: a line whose exact text recurs across the corpus is
    boilerplate — headers, nav bars, cookie banners — and is struck from
    EVERY document it appears in, unlike per-document heuristics such as
    :func:`~..textstats.c4_line_filter`).

    A line is removed when its exact text occurs ``>= min_dup`` times
    corpus-wide (all occurrences counted, including repeats inside one
    document). Surviving lines are reassembled in original order;
    documents left with zero lines are dropped (RefinedWeb drops the
    then-empty page). Returns ``(id_col, text_clean, kept_lines,
    removed_lines)``.

    Scale shape — the op is two shuffles plus one anti-join, all of
    them the cheap kind:

    * the corpus-wide line count is ``groupBy(line).count()`` — a viral
      boilerplate line (billions of copies at 100 TB) is compressed by
      map-side partial aggregation to one ``(line, n)`` row per input
      partition BEFORE the shuffle, so the hot key costs nothing;
    * membership in the duplicate set is a ``left_anti`` join keyed on
      the line text — a shuffle join AQE can skew-split (the probe side
      of a hot line spreads across tasks; there is no window anywhere);
    * the rebuild is one ``groupBy(doc)`` over surviving lines with an
      ``array_sort`` on the carried position — per-document state, never
      larger than the document itself.

    The duplicate set is deliberately NOT broadcast: at corpus scale the
    number of distinct duplicated lines is itself huge (every 2+-copy
    line qualifies), so the bounded-memory posture is the shuffled
    anti-join and AQE may still choose a broadcast when the set turns
    out small.
    """
    import re as _re

    pat = _re.escape(sep)
    lines = df.select(
        F.col(id_col),
        F.size(F.split(F.col(text_col), pat, -1)).alias("__total"),
        F.posexplode(F.split(F.col(text_col), pat, -1)).alias(
            "__pos", "__line"
        ),
    )
    dup = (
        lines.groupBy("__line")
        .agg(F.count(F.lit(1)).alias("__n"))
        .filter(F.col("__n") >= min_dup)
        .select("__line")
    )
    kept = lines.join(dup, "__line", "left_anti")
    return (
        kept.groupBy(id_col)
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("__pos", "__line"))
                    ),
                    lambda s: s["__line"],
                ),
                sep,
            ).alias("text_clean"),
            F.count(F.lit(1)).cast("int").alias("kept_lines"),
            (F.first("__total") - F.count(F.lit(1)))
            .cast("int")
            .alias("removed_lines"),
        )
    )


def lsh_tuning_curve(
    spark,
    configs: tuple[tuple[int, int], ...] = ((4, 2), (8, 4), (16, 2), (4, 8)),
    grid_n: int = 19,
) -> DataFrame:
    """The MinHash-LSH S-curve tuning table (Leskovec/Rajaraman/Ullman,
    *Mining of Massive Datasets* §3.4.2): for each candidate banding
    ``(bands b, rows_per_band r)`` and each Jaccard similarity ``s`` on
    a ``grid_n``-point grid, the probability the pair becomes an LSH
    candidate, ``p = 1 - (1 - s^r)^b``, plus the threshold
    ``(1/b)^(1/r)`` where the curve crosses ~0.5.

    This is the table a pipeline prints BEFORE committing a banding to
    a 100 TB dedup run (the ``bands``/``rows_per_band`` arguments of
    :func:`lsh_candidate_pairs`; the default config list leads with
    the (4, 2) banding this repo's headline dedup queries run) — the planning twin of
    :func:`~.similarity.ann_recall`'s after-the-fact measurement. Pure
    closed-form math over literal frames: one double explode, zero
    joins, zero scans; probabilities rounded to 4 decimals so JVM/libm
    ``pow`` ulp jitter cannot differ across engines.
    """
    cfg = F.array(
        *[
            F.struct(
                F.lit(int(b)).alias("bands"),
                F.lit(int(r)).alias("rows_per_band"),
            )
            for b, r in configs
        ]
    )
    s = F.col("i") / F.lit(float(grid_n + 1))
    p = 1 - F.pow(
        1 - F.pow(s, F.col("rows_per_band")), F.col("bands")
    )
    thr = F.pow(1.0 / F.col("bands"), 1.0 / F.col("rows_per_band"))
    return (
        spark.range(1)
        .select(F.explode(cfg).alias("c"))
        .select(
            "c.*",
            F.explode(F.sequence(F.lit(1), F.lit(int(grid_n)))).alias("i"),
        )
        .select(
            "bands",
            "rows_per_band",
            F.round(s, 4).alias("s"),
            F.round(p, 4).alias("p_candidate"),
            F.round(thr, 4).alias("s_threshold"),
        )
    )


def winnow_fingerprints(
    df: DataFrame,
    k: int = 4,
    window: int = 4,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Winnowing fingerprints (Schleimer, Wilkerson & Aiken, SIGMOD
    2003 — the MOSS partial-copy detector): hash every k-word shingle,
    slide a ``window``-hash window, and select each window's minimal
    hash (rightmost occurrence on ties — the paper's standard
    winnowing; its stateful "robust" refinement reuses the previous
    selection across ties, which needs cross-window state and buys
    nothing for matching since the tied fingerprint VALUES are already
    identical). The selected set carries the paper's guarantee: any
    shared passage of at least ``window + k - 1`` tokens between two
    documents produces at least one IDENTICAL (fp) selection in both —
    unlike :func:`~..textstats.fingerprint`'s single whole-doc minhash
    (no locality) and :func:`passage_dedup_stats`'s aligned
    non-overlapping passages (misses shifted copies).

    Returns ``(id_col, pos, fp)`` — distinct selections, ``pos`` the
    0-based token index of the chosen shingle. Documents with fewer
    than ``window`` shingles winnow their whole (non-empty) hash list;
    documents with fewer than ``k`` tokens yield no rows.

    Scale shape: pure per-row array expressions (one md5 per shingle,
    one O(window) scan per window position) + a map-only explode —
    zero shuffles, zero joins; the downstream shared-fp join is the
    consumer's (same posture as :func:`minhash_signatures`).
    """
    h = F.transform(shingles(tokens(F.col(text_col)), k), F.md5)
    staged = df.select(F.col(id_col), h.alias("__h"))
    n = F.size(F.col("__h"))
    starts = F.when(
        n >= 1, F.sequence(F.lit(0), F.greatest(n - window, F.lit(0)))
    ).otherwise(F.array().cast("array<int>"))

    def pick(i):
        win = F.slice(F.col("__h"), i + 1, window)
        m = F.array_min(win)
        pos = i + F.size(win) - F.array_position(F.reverse(win), m)
        return F.struct(pos.cast("int").alias("pos"), m.alias("fp"))

    sel = F.array_distinct(F.transform(starts, pick))
    return staged.select(
        F.col(id_col), F.explode(sel).alias("__s")
    ).select(id_col, F.col("__s.pos").alias("pos"), F.col("__s.fp").alias("fp"))


def winnow_match_pairs(
    fps: DataFrame,
    min_shared: int = 2,
    max_df: int = 50,
    id_col: str = "doc_id",
) -> DataFrame:
    """The MOSS match step over :func:`winnow_fingerprints` output:
    ordered document pairs ranked by how many distinct fingerprint
    VALUES they share — partial-copy candidates (two docs sharing one
    passage of ``window + k - 1`` tokens share >= 1 fp; longer or
    repeated overlaps share more, so ``shared_fps`` is a plagiarism
    score).

    ``max_df`` is the bounded-state guard the pair expansion NEEDS at
    corpus scale (MOSS itself drops fingerprints appearing in too many
    documents as boilerplate): an fp present in d documents expands to
    d·(d-1)/2 pairs, so a viral fp (license header, nav bar) is
    quadratic without the cap. ``min_shared`` then prunes incidental
    single-fp collisions. Returns ``(a_id, b_id, shared_fps)``.

    Plan shape — ONE grouped collect per fp + in-group ordered-pair
    expansion, NOT a self-join: an aliased self-join of the
    fingerprint frame executes the (md5-per-shingle) winnowing subtree
    TWICE — the two sides alias ``doc_id`` differently, canonicalized
    plans differ, and ReuseExchange never fires (the exact
    :func:`lsh_candidate_pairs` lesson, measured there at ~1.7×). The
    groupBy computes fingerprints once, shuffles once on the fp key,
    expands each group's pairs locally (sorted ids make a < b free),
    and the df cap is the same collect-then-filter bounded-state
    posture LSH uses. Measured quiet-box at the sf1 bench table:
    17.0 s → 6.7 s (sf0.1: 3.9 s → 2.3 s), identical output.
    """
    docfp = fps.select(F.col(id_col), "fp").distinct()
    groups = (
        docfp.groupBy("fp")
        .agg(F.sort_array(F.collect_list(F.col(id_col))).alias("ids"))
        .filter((F.size("ids") > 1) & (F.size("ids") <= max_df))
    )
    return (
        _ordered_pair_explode(groups)
        .groupBy("a_id", "b_id")
        .agg(F.count(F.lit(1)).cast("bigint").alias("shared_fps"))
        .filter(F.col("shared_fps") >= min_shared)
    )


def incremental_dedup(
    batch: DataFrame,
    seen: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    bloom_hashes: int = 4,
    bloom_bits: int = 1 << 16,
) -> DataFrame:
    """Ingest-time exact dedup of a NEW batch against the
    already-ingested corpus AND itself — the shape a continuously-fed
    corpus actually runs (nobody re-deduplicates 100 TB per arriving
    batch): batch rows whose exact text already exists in ``seen`` are
    dropped, then intra-batch duplicates collapse to the lowest id
    (:func:`exact_dedup` semantics). Returns surviving batch rows with
    their original columns.

    Scale shape — three stages, each bounded:

    * a Bloom filter over the corpus text (:func:`~.sketches.
      bloom_build` — distinct-bit rows, <= ``bloom_bits`` rows
      regardless of corpus size, broadcastable by construction) is
      probed map-side by the batch; Bloom has NO false negatives, so
      bloom-negative rows are definitively new and skip the join
      entirely — at a sane sizing that is almost the whole batch;
    * only bloom-POSITIVE rows anti-join the corpus hash set to
      resolve false positives exactly. The corpus side should be the
      persisted hash table bucketed by hash (the Iceberg sink's
      bucketing), making the per-batch anti-join bucket-local instead
      of re-shuffling the corpus — the Bloom prune bounds the PROBE
      side, bucketing bounds the BUILD side;
    * the intra-batch collapse is :func:`exact_dedup`'s
      map-side-combined groupBy + semi-join (batch-sized).

    The Bloom stage is a pure pruning optimization: output is
    bit-identical to the plain anti-join (the oracle twin), bloom or
    no bloom. Null text is one dedup class (SQL-equality semantics
    would let a null-text row through every batch): null-text batch
    rows are forced onto the candidate path and the anti-join is
    null-safe, so a null-text row in ``seen`` suppresses them.
    """
    from .sketches import bloom_build, bloom_probe

    bits = bloom_build(
        seen.select(F.col(text_col)),
        text_col=text_col,
        n_hashes=bloom_hashes,
        m_bits=bloom_bits,
    )
    probe = bloom_probe(
        batch,
        bits,
        text_col=text_col,
        id_col=id_col,
        n_hashes=bloom_hashes,
        m_bits=bloom_bits,
    ).select(id_col, "maybe_member")
    staged = batch.join(probe, id_col)
    # null text hashes to a null bloom probe (n_hits 0, maybe_member
    # false) — it must take the CANDIDATE path anyway, or a null-text
    # row in seen could never suppress a null-text batch row
    is_cand = F.col("maybe_member") | F.col(text_col).isNull()
    clean = staged.filter(~is_cand).drop("maybe_member")
    cand = staged.filter(is_cand).drop("maybe_member")
    seen_h = seen.select(F.md5(F.col(text_col)).alias("__seen_h")).distinct()
    keyed = cand.withColumn("__h", F.md5(F.col(text_col)))
    resolved = (
        keyed.join(
            seen_h,
            keyed["__h"].eqNullSafe(seen_h["__seen_h"]),
            "left_anti",
        )
        .drop("__h")
    )
    return exact_dedup(
        clean.unionByName(resolved), text_col=text_col, id_col=id_col
    )


def cross_source_dup_matrix(
    docs: DataFrame,
    pairs: DataFrame,
    source_col: str = "source",
    id_col: str = "doc_id",
    a_col: str = "a_id",
    b_col: str = "b_id",
) -> DataFrame:
    """Where does the duplication come from? Aggregate a verified
    duplicate-pair frame (:func:`jaccard_verify_pairs`,
    :func:`cosine_pairs`…) into an unordered source×source overlap
    matrix — the diagnostic that tells a corpus team whether dups are
    intra-source boilerplate (diagonal) or cross-source mirroring
    (off-diagonal, e.g. the same articles crawled via two feeds), which
    decides WHERE to point the dedup budget.

    Returns ``(source_a, source_b, n_pairs)`` with ``source_a <=
    source_b`` (unordered pair canonicalized), descending ``n_pairs``.

    Scale shape: the pair frame is candidate-scale (LSH-bounded), tiny
    next to the corpus, so BOTH id joins broadcast the pair side and
    the corpus is scanned once projected to (id, source); final agg is
    a map-side-combined groupBy over |sources|² keys.
    """
    # a null source misattributes: least/greatest SKIP nulls, so a
    # (null, 'web') pair would canonicalize to ('web','web') and
    # inflate exactly the intra-source diagonal this diagnostic exists
    # to separate — bucket missing metadata explicitly instead
    src = docs.select(
        F.col(id_col),
        F.coalesce(F.col(source_col), F.lit("unknown")).alias("__src"),
    )
    a = src.select(
        F.col(id_col).alias(a_col), F.col("__src").alias("__sa")
    )
    b = src.select(
        F.col(id_col).alias(b_col), F.col("__src").alias("__sb")
    )
    tagged = pairs.select(a_col, b_col).join(a, a_col).join(b, b_col)
    return (
        tagged.select(
            F.least("__sa", "__sb").alias("source_a"),
            F.greatest("__sa", "__sb").alias("source_b"),
        )
        .groupBy("source_a", "source_b")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_pairs"))
        .orderBy(F.col("n_pairs").desc(), "source_a", "source_b")
    )


def minhash_jaccard_estimate(
    sigs: DataFrame,
    pairs: DataFrame,
    a_col: str = "a_id",
    b_col: str = "b_id",
    id_col: str = "doc_id",
) -> DataFrame:
    """Signature-space Jaccard ESTIMATE for candidate pairs: the
    fraction of minhash components two documents agree on is an
    unbiased estimator of their true Jaccard (the MinHash theorem) --
    the cheap middle stage between LSH candidate generation and exact
    verification. A pipeline uses it to rank/triage candidates (or cut
    obviously-weak ones) WITHOUT touching document text: the only
    inputs are the signature frame (n_hashes bigints per doc) and the
    pair list, so the verify-stage text scan is skipped entirely.

    Returns ``(a_col, b_col, est_jaccard, n_agree, n_valid)`` --
    ``n_valid`` counts components where BOTH sides are non-null
    (sub-shingle-size docs carry all-null signatures; est is null when
    nothing is comparable). ``est = round(n_agree / n_valid, 4)``.

    Scale shape: the pair frame keys two hash joins against the
    signature frame (candidate-scale side broadcast by AQE when small,
    skew-splittable otherwise -- same posture as
    :func:`jaccard_verify_pairs`); the component comparison is one
    zero-shuffle ``zip_with`` fold per pair row.
    """
    sa = sigs.select(F.col(id_col).alias(a_col), F.col("sig").alias("__sa"))
    sb = sigs.select(F.col(id_col).alias(b_col), F.col("sig").alias("__sb"))
    both = F.zip_with(
        F.col("__sa"),
        F.col("__sb"),
        lambda x, y: F.when(
            x.isNotNull() & y.isNotNull(),
            F.when(x == y, 2).otherwise(1),
        ).otherwise(0),
    )
    n_agree = F.aggregate(
        F.col("__z"),
        F.lit(0).cast("bigint"),
        lambda acc, v: acc + F.when(v == 2, 1).otherwise(0),
    )
    n_valid = F.aggregate(
        F.col("__z"),
        F.lit(0).cast("bigint"),
        lambda acc, v: acc + F.when(v >= 1, 1).otherwise(0),
    )
    return (
        pairs.select(a_col, b_col)
        .join(sa, a_col)
        .join(sb, b_col)
        .select(a_col, b_col, both.alias("__z"))
        .select(
            a_col,
            b_col,
            F.round(F.try_divide(n_agree, n_valid), 4).alias("est_jaccard"),
            n_agree.alias("n_agree"),
            n_valid.alias("n_valid"),
        )
    )


def cluster_size_histogram(
    clusters: DataFrame, cluster_col: str = "cluster_id"
) -> DataFrame:
    """Duplicate-cluster size distribution over a clustering frame
    (:func:`connected_components` output): how much of the corpus sits
    in singletons vs pairs vs viral clusters -- the one-glance dedup
    report (BigCode/Dolma runs publish exactly this table) that sets
    expectations for how many rows dedup will remove and flags
    pathological clusters before the canonical-select stage.

    Returns ``(n_members, n_clusters, n_docs)`` -- one row per
    distinct cluster size, ``n_docs = n_members * n_clusters``.

    Scale shape: two map-side-combined grouped counts (cluster sizes,
    then the histogram over the <= |corpus|-cluster frame); a viral
    cluster is ONE group row after the first partial aggregation --
    never a window, never a skewed task.
    """
    sizes = clusters.groupBy(cluster_col).agg(
        F.count(F.lit(1)).alias("n_members")
    )
    return sizes.groupBy("n_members").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_clusters"),
        (F.count(F.lit(1)) * F.col("n_members"))
        .cast("bigint")
        .alias("n_docs"),
    )
