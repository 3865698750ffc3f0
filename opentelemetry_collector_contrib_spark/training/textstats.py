"""Text analysis: token stats, quality score, language ID, fingerprint.

Pure projections — zero shuffle, whole-stage codegen; every op has a
DuckDB-lockstep formulation for the driver's oracle gate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import shingles, tokens

# tiny English function-word list for the ratio heuristics
STOPWORDS = ["the", "a", "an", "and", "of", "to", "in", "is", "it"]


def token_stats(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """(id, n_tokens, n_distinct, distinct_ratio, avg_token_len)."""
    toks = tokens(F.col(text_col))
    n = F.size(toks)
    nd = F.size(F.array_distinct(toks))
    total_len = F.aggregate(
        toks, F.lit(0), lambda acc, t: acc + F.length(t)
    )
    # the n > 0 guard is ANSI-load-bearing, not cosmetic: driver
    # sessions run spark.sql.ansi.enabled=true where long/long division
    # by zero THROWS (round 3's expo crash class) — CASE branches
    # evaluate lazily, so the ratio exprs never see an empty doc
    return df.select(
        F.col(id_col),
        n.alias("n_tokens"),
        nd.alias("n_distinct"),
        F.when(n > 0, F.round(nd / n, 4)).alias("distinct_ratio"),
        F.when(n > 0, F.round(total_len / n, 4)).alias("avg_token_len"),
    )


def quality_col(text_col: str = "text"):
    """Column expression for the composite quality score, scaled to an
    integer in 0..10000 — exposed so composed pipelines (curation) can
    evaluate quality and language in ONE projection pass."""
    toks = tokens(F.col(text_col))
    n = F.size(toks)
    nd = F.size(F.array_distinct(toks))
    stop = F.size(F.filter(toks, lambda t: t.isin(STOPWORDS)))
    len_sat = F.least(F.length(text_col) / F.lit(500.0), F.lit(1.0))
    diversity = nd / n
    stop_ratio = F.least(F.lit(4.0) * stop / n, F.lit(1.0))
    raw = 0.3 * len_sat + 0.4 * diversity + 0.3 * stop_ratio
    # scaled-int score (0..10000): floor(x*1e4 + 0.5) is bit-deterministic
    # across engines, unlike round(x, 4) whose boundary behavior varies.
    # Zero-token docs score 0 via a lazy CASE branch — the ratio terms
    # divide by n, which THROWS under the driver's ANSI session
    return F.when(
        n > 0, F.floor(raw * 10000 + F.lit(0.5)).cast("bigint")
    ).otherwise(F.lit(0).cast("bigint"))


def lang_col(text_col: str = "text"):
    """Column expression for the stopword-ratio language heuristic:
    'en' when English function words exceed 2% of tokens."""
    toks = tokens(F.col(text_col))
    stop = F.size(F.filter(toks, lambda t: t.isin(STOPWORDS)))
    # nested CASE so the ratio (ANSI-throwing on /0) only evaluates for
    # docs that have tokens; zero-token docs are 'unknown'
    return F.when(
        F.size(toks) > 0,
        F.when(stop / F.size(toks) > 0.02, F.lit("en")).otherwise("unknown"),
    ).otherwise("unknown")


def quality_score(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Composite quality score in [0,1]: length saturation + lexical
    diversity + function-word presence (the classic cheap filters a
    pretraining pipeline applies before expensive dedup)."""
    return df.select(F.col(id_col), quality_col(text_col).alias("quality_q4"))


def lang_id(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Stopword-ratio language heuristic: (id, pred_lang). 'en' when
    English function words exceed 2% of tokens, else 'unknown'."""
    return df.select(F.col(id_col), lang_col(text_col).alias("pred_lang"))


def fingerprint(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", k: int = 3
) -> DataFrame:
    """(id, fp) — content fingerprint: lexicographic-min md5 over k-word
    shingles (a 1-permutation min-hash; robust to local edits)."""
    sh = shingles(tokens(F.col(text_col)), k)
    fp = F.array_min(F.transform(sh, F.md5))
    return df.select(F.col(id_col), fp.alias("fp"))


def tfidf_topk(
    df: DataFrame,
    k: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Top-``k`` terms per document by TF-IDF — the classic keyword /
    salience primitive a curation pipeline runs for topic tagging and
    boilerplate spotting (a term every document contains scores ~0).
    Returns ``(id, term, tf, df, rank, tfidf)`` with
    ``tfidf = tf * ln(n_docs / df)`` rounded to 4 decimals (the rounded
    value is also the ranking key, so cross-engine last-ulp ``ln``
    jitter cannot reorder; ties to the lexicographically smaller term).

    Execution shape (100 TB posture): the corpus is tokenized and
    shuffled ONCE — explode to (doc, term), grouped count with map-side
    combine, then the grouped frame is persisted (MEMORY_AND_DISK) so
    document frequencies re-aggregate the cached frame down to
    vocabulary size instead of re-scanning the corpus (plan-guarded:
    one source scan, both branches read the same InMemoryRelation).
    The df side comes back via a broadcast join, NOT a window or
    shuffle on the raw term key — a hot stopword present in every doc
    would make that shuffle skew-bound with no guard (the same
    reasoning as the LSH bucket caps), while the term-keyed
    re-aggregation gets map-side partial combine. ``n_docs`` is one
    count job — parquet row-group metadata at scale, not a data scan.
    The persisted frame stays cached in the session; callers looping
    over many corpora should ``spark.catalog.clearCache()`` between
    runs."""
    n_docs = df.count()
    terms = df.select(
        F.col(id_col), F.explode(tokens(F.col(text_col))).alias("term")
    )
    tf = terms.groupBy(id_col, "term").agg(
        F.count(F.lit(1)).alias("tf")
    ).persist()
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    scored = tf.join(F.broadcast(dfreq), "term")
    tfidf = F.round(
        F.col("tf") * F.log(F.lit(float(n_docs)) / F.col("df")), 4
    )
    from pyspark.sql import Window

    w = Window.partitionBy(id_col).orderBy(
        F.col("tfidf").desc(), F.col("term")
    )
    return (
        scored.withColumn("tfidf", tfidf)
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(id_col, "term", "tf", "df", "rank", "tfidf")
    )


# GPT-2-style pretokenizer classes, restricted to constructs whose
# semantics are identical in Java regex (Spark) and RE2 (DuckDB):
# contractions, letter runs, digit runs, punctuation runs — each with
# an optional leading space (the BPE-ish budget estimate a pipeline
# uses before real tokenization).
BPE_PATTERN = "'(?:s|t|re|ve|m|ll|d)| ?[a-zA-Z]+| ?[0-9]+| ?[^a-zA-Z0-9 ']+"


def bpe_token_count(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(id, n_ws, n_bpe): whitespace token count next to the BPE-ish
    pretokenizer match count — the cheap context-window budgeter (real
    tokenizers come later in the pipeline; this estimates within a few
    percent). Zero-shuffle projection."""
    ws = F.size(tokens(F.col(text_col)))
    bpe = F.size(F.regexp_extract_all(F.col(text_col), F.lit(BPE_PATTERN), 0))
    return df.select(
        F.col(id_col), ws.alias("n_ws"), bpe.alias("n_bpe")
    )


def _q4(x):
    """Scaled-int ratio in 0..10000: floor(x*1e4 + 0.5) is
    bit-deterministic across engines (round(x, 4) boundary behavior is
    not)."""
    return F.floor(x * 10000 + F.lit(0.5)).cast("bigint")


def _gram_scan(sorted_col: str):
    """One-pass scan over a SORTED string array (staged column name):
    returns (best_run, best_gram, dup_occurrences) — the mode's count,
    the mode itself (lexicographically greatest among ties, because the
    array is ascending and the update rule is >=), and the number of
    elements whose value occurs more than once. ONE two-arg lambda, no
    nesting, all outer refs are plain column attributes (the PySpark
    HOF x/y/z hazard — see processors/expo.py collapse())."""
    zero = F.lit(0).cast("bigint")
    init = F.struct(
        F.lit("\u0000").alias("prev"),
        zero.alias("run"),
        zero.alias("best"),
        F.lit("").alias("bestg"),
        zero.alias("dup"),
    )

    def step(acc, x):
        # run == 0 only before the first element: guard it so a first
        # gram that happens to EQUAL the init sentinel can never take
        # the same-branch (which would count a single occurrence as a
        # duplicate)
        same = (x == acc.getField("prev")) & (acc.getField("run") > 0)
        run = F.when(same, acc.getField("run") + 1).otherwise(
            F.lit(1).cast("bigint")
        )
        upd = run >= acc.getField("best")
        # a run reaching 2 retro-counts BOTH occurrences as duplicates;
        # each further repeat adds one
        dup = acc.getField("dup") + F.when(
            same & (acc.getField("run") == 1), F.lit(2).cast("bigint")
        ).when(same, F.lit(1).cast("bigint")).otherwise(zero)
        return F.struct(
            x.alias("prev"),
            run.alias("run"),
            F.when(upd, run).otherwise(acc.getField("best")).alias("best"),
            F.when(upd, x).otherwise(acc.getField("bestg")).alias("bestg"),
            dup.alias("dup"),
        )

    return F.aggregate(F.col(sorted_col), init, step)


def repetition_stats(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
    top_n: int = 2, dup_n: int = 5,
) -> DataFrame:
    """Gopher-style repetition signals (Rae et al. 2021, appendix A1.1;
    the repetition family of quality filters every pretraining pipeline
    applies before dedup). Per document:

    - ``n_lines`` and ``dup_line_frac_q4`` / ``dup_line_char_frac_q4``:
      non-empty ``\\n`` lines; the fraction of lines (and of line
      characters) lost when lines are deduplicated.
    - ``top{top_n}gram_frac_q4``: character mass of the most frequent
      word ``top_n``-gram over total token characters — numerator
      counts the gram's non-space characters times its frequency (ties
      broken toward the lexicographically greatest gram, identically in
      Spark and the DuckDB oracle).
    - ``dup{dup_n}gram_frac_q4``: fraction of word ``dup_n``-gram
      OCCURRENCES whose gram appears more than once (the occurrence
      form of Gopher's duplicate-n-gram character fraction — exact
      char coverage needs overlap resolution; the occurrence ratio is
      the standard monotone proxy).
    - ``symbol_word_ratio_q4``: (# '#' + # '...' + # '…') per word.
    - ``bullet_line_frac_q4`` / ``ellipsis_line_frac_q4``: lines
      starting with a bullet ('-', '*', '•') / ending with an ellipsis.
    - ``alpha_word_frac_q4``: fraction of words containing at least one
      ASCII letter.
    - ``mean_word_len_q4``, ``n_words``.

    Zero-shuffle projection; every intermediate the scan lambda shares
    with siblings is staged as a column first (HOF house rule). Scale
    posture: per-row arrays are document-sized, the single-pass scans
    are O(tokens log tokens) for the sort — no shuffle, survives 100 TB
    as a pure map stage.
    """
    t = F.col("__text")
    # whitespace-CLASS tokens (not the single-space split the dedup ops
    # use): line-wrapped prose must not glue words across newlines.
    # DuckDB lockstep: list_filter(string_split_regex(text,
    # '[ \t\r\n]+'), t -> t != '')
    staged = (
        df.withColumn("__text", F.col(text_col))
        .withColumn(
            "__toks",
            F.filter(F.split(t, "[ \t\r\n]+"), lambda x: x != ""),
        )
        .withColumn(
            "__lines", F.filter(F.split(t, "\n"), lambda x: x != "")
        )
        .withColumn("__g_top", F.array_sort(shingles(F.col("__toks"), top_n)))
        .withColumn("__g_dup", F.array_sort(shingles(F.col("__toks"), dup_n)))
        .withColumn("__scan_top", _gram_scan("__g_top"))
        .withColumn("__scan_dup", _gram_scan("__g_dup"))
    )
    toks = F.col("__toks")
    lines = F.col("__lines")
    n_words = F.size(toks)
    n_lines = F.size(lines)
    tok_chars = F.aggregate(
        toks, F.lit(0).cast("bigint"), lambda a, x: a + F.length(x)
    )
    line_chars = F.aggregate(
        lines, F.lit(0).cast("bigint"), lambda a, x: a + F.length(x)
    )
    dline_chars = F.aggregate(
        F.array_distinct(lines), F.lit(0).cast("bigint"),
        lambda a, x: a + F.length(x),
    )
    scan_top, scan_dup = F.col("__scan_top"), F.col("__scan_dup")
    # non-space characters of the top gram = len - (top_n - 1) joiners
    top_mass = scan_top.getField("best") * (
        F.length(scan_top.getField("bestg")) - (top_n - 1)
    )
    n_dup_grams = F.size(F.col("__g_dup"))
    hashes = F.length(t) - F.length(F.replace(t, F.lit("#"), F.lit("")))
    dots = (F.length(t) - F.length(F.replace(t, F.lit("..."), F.lit("")))) / 3
    uni_ell = F.length(t) - F.length(F.replace(t, F.lit("…"), F.lit("")))
    bullet_lines = F.size(
        F.filter(
            lines,
            lambda x: x.startswith("-") | x.startswith("*") | x.startswith("•"),
        )
    )
    ellipsis_lines = F.size(
        F.filter(lines, lambda x: x.endswith("...") | x.endswith("…"))
    )
    alpha_words = F.size(F.filter(toks, lambda x: x.rlike("[A-Za-z]")))

    def ratio(num, den):
        return F.when(den > 0, _q4(num / den)).otherwise(F.lit(0).cast("bigint"))

    return staged.select(
        F.col(id_col),
        n_words.alias("n_words"),
        n_lines.alias("n_lines"),
        ratio(n_lines - F.size(F.array_distinct(lines)), n_lines).alias(
            "dup_line_frac_q4"
        ),
        ratio(line_chars - dline_chars, line_chars).alias(
            "dup_line_char_frac_q4"
        ),
        ratio(top_mass, tok_chars).alias(f"top{top_n}gram_frac_q4"),
        ratio(scan_dup.getField("dup"), n_dup_grams).alias(
            f"dup{dup_n}gram_frac_q4"
        ),
        ratio(hashes + dots + uni_ell, n_words).alias("symbol_word_ratio_q4"),
        ratio(bullet_lines, n_lines).alias("bullet_line_frac_q4"),
        ratio(ellipsis_lines, n_lines).alias("ellipsis_line_frac_q4"),
        ratio(alpha_words, n_words).alias("alpha_word_frac_q4"),
        ratio(tok_chars, n_words).alias("mean_word_len_q4"),
    )


def gopher_quality_filter(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
    min_words: int = 50, max_words: int = 100_000,
    min_mean_word_len: float = 3.0, max_mean_word_len: float = 10.0,
    max_symbol_word_ratio: float = 0.1,
    max_bullet_line_frac: float = 0.9, max_ellipsis_line_frac: float = 0.3,
    min_alpha_word_frac: float = 0.8,
    max_dup_line_frac: float = 0.3, max_dup_line_char_frac: float = 0.2,
    max_top2gram_frac: float = 0.2, max_dup5gram_frac: float = 0.15,
) -> DataFrame:
    """Gopher rules filter (Rae et al. 2021 appendix A1.1 thresholds by
    default): keeps documents passing ALL repetition/quality gates and
    returns (id, n_words + the q4 signals) for the survivors. One
    zero-shuffle projection + filter over :func:`repetition_stats` —
    at 100 TB this is a map-only pass whose selectivity feeds the
    downstream (shuffling) dedup stages."""
    s = repetition_stats(df, text_col=text_col, id_col=id_col)
    # pushdown barrier: PushDownPredicates would inline each of the 11
    # conditions' q4 aliases through the staged-projection chain,
    # re-evaluating the per-row gram scans once PER CONDITION (measured
    # 17.3 s vs 0.54 s for the bare stats at sf0.1). A non-deterministic
    # column in the projection pins the Filter ABOVE it, so the stats
    # evaluate once and the predicate reads plain attributes.
    s = s.withColumn("__nd", F.monotonically_increasing_id())
    q = lambda x: int(x * 10000 + 0.5)  # noqa: E731 — mirror _q4 on literals
    return s.filter(
        # the predicate must REFERENCE the barrier column or
        # ColumnPruning strips it and the barrier dissolves
        (F.col("__nd") >= 0)
        &
        (F.col("n_words") >= min_words)
        & (F.col("n_words") <= max_words)
        & (F.col("mean_word_len_q4") >= q(min_mean_word_len))
        & (F.col("mean_word_len_q4") <= q(max_mean_word_len))
        & (F.col("symbol_word_ratio_q4") <= q(max_symbol_word_ratio))
        & (F.col("bullet_line_frac_q4") <= q(max_bullet_line_frac))
        & (F.col("ellipsis_line_frac_q4") <= q(max_ellipsis_line_frac))
        & (F.col("alpha_word_frac_q4") >= q(min_alpha_word_frac))
        & (F.col("dup_line_frac_q4") <= q(max_dup_line_frac))
        & (F.col("dup_line_char_frac_q4") <= q(max_dup_line_char_frac))
        & (F.col("top2gram_frac_q4") <= q(max_top2gram_frac))
        & (F.col("dup5gram_frac_q4") <= q(max_dup5gram_frac))
    ).drop("__nd")


# C4 terminal punctuation marks a kept line must end with (Raffel et
# al. 2020 §2.2 — the public "Colossal Clean Crawled Corpus" rules)
C4_TERMINALS = (".", "!", "?", '"')


def c4_line_filter(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_words: int = 5,
    min_lines: int = 3,
) -> DataFrame:
    """C4-style line + page cleanup (Raffel et al. 2020 §2.2).

    Line rules — a line survives when it (a) ends in terminal
    punctuation (``. ! ? "``), (b) has at least ``min_words``
    whitespace words, and (c) does not mention ``javascript``
    (case-insensitive). Page rules — the whole document is dropped
    when its text contains ``{`` or the phrase ``lorem ipsum``
    (case-insensitive), or when fewer than ``min_lines`` lines
    survive the line rules.

    Returns ``(id, n_lines, n_kept, clean_text)`` for surviving pages,
    with ``clean_text`` the kept lines re-joined by newline.

    100 TB posture: one zero-shuffle projection + filter — array
    lambdas over the split lines, no explode (exploding to a line
    table would multiply the row count through a map-only stage for
    nothing) and no Python. Reference analogue: filterprocessor's
    drop-whole-signal gating (processor/filterprocessor/filter.go)
    applied at line granularity; the rule set itself is from the
    public C4 paper, the standard pre-dedup cleanup a training-data
    pipeline runs before the (shuffling) MinHash stages.

    DuckDB lockstep: ``list_filter(string_split(text, chr(10)), ...)``
    with ``ends_with``/``contains`` — see ``oracle_sql()``.
    """
    lines = F.split(F.col(text_col), "\n")

    def line_ok(line):
        words = F.filter(F.split(line, " "), lambda w: w != "")
        terminal = line.endswith(C4_TERMINALS[0])
        for t in C4_TERMINALS[1:]:
            terminal = terminal | line.endswith(t)
        return (
            terminal
            & (F.size(words) >= min_words)
            & ~F.contains(F.lower(line), F.lit("javascript"))
        )

    kept = F.filter(lines, line_ok)
    page_bad = F.contains(
        F.lower(F.col(text_col)), F.lit("lorem ipsum")
    ) | F.contains(F.col(text_col), F.lit("{"))
    return (
        df.select(
            F.col(id_col),
            F.size(lines).alias("n_lines"),
            F.size(kept).alias("n_kept"),
            F.array_join(kept, "\n").alias("clean_text"),
            page_bad.alias("__page_bad"),
        )
        .filter((~F.col("__page_bad")) & (F.col("n_kept") >= min_lines))
        .drop("__page_bad")
    )


def lm_score(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Bigram language-model cross-entropy per document — the classic
    KenLM-style perplexity quality filter a pretraining pipeline runs
    (CCNet, Wenzek et al. 2020 train an LM and drop the
    worst-perplexity tail; here the LM is the corpus's own add-one-
    smoothed bigram model, so boilerplate scores low and
    out-of-distribution token salads score high).

    Per bigram ``(w1, w2)``: ``P(w2|w1) = (C(w1 w2) + 1) / (C(w1·) + V)``
    with ``C(w1·)`` the bigram-prefix count and ``V`` the corpus
    vocabulary size. Each occurrence contributes
    ``nlp_q4 = floor(-ln P * 1e4 + 0.5)`` — rounding BEFORE the per-doc
    sum makes the aggregate pure integer math, immune to
    float-summation order (the repo-wide scaled-int discipline), and
    the mean rounds half-up in integers: ``(2*sum + n) div (2*n)``.

    Returns ``(id, n_bigrams, xent_q4)`` for EVERY document (left
    join); docs with < 2 tokens get ``n_bigrams = 0`` and a null score.

    100 TB posture: the corpus tokenizes ONCE into per-doc-distinct
    bigram counts (map-side combine on the explode), which are
    persisted and re-aggregated down to the bigram model — the model
    derivation never re-scans the corpus (same staged shape as
    :func:`tfidf_topk`). Model joins are shuffle hash joins on the
    bigram key (the model is vocab-sized — too big to broadcast at
    scale; AQE skew-split covers hot function-word bigrams), and ``V``
    is one count-distinct job, an index constant.
    """
    toks = tokens(F.col(text_col))
    idx = F.when(
        F.size(toks) >= 2, F.sequence(F.lit(0), F.size(toks) - 2)
    ).otherwise(F.array().cast("array<int>"))
    pair = F.explode(
        F.transform(
            idx,
            lambda i: F.struct(
                F.get(toks, i).alias("w1"), F.get(toks, i + 1).alias("w2")
            ),
        )
    )
    pairs = df.select(F.col(id_col), pair.alias("bg")).select(
        id_col, F.col("bg.w1").alias("w1"), F.col("bg.w2").alias("w2")
    )
    occ = (
        pairs.groupBy(id_col, "w1", "w2")
        .agg(F.count(F.lit(1)).alias("occ"))
        .persist()
    )
    c2 = occ.groupBy("w1", "w2").agg(F.sum("occ").alias("c2"))
    c1 = c2.groupBy("w1").agg(F.sum("c2").alias("c1"))
    vocab = (
        df.select(F.explode(toks).alias("tok")).agg(
            F.countDistinct("tok")
        ).collect()[0][0]
    )
    nlp = F.floor(
        -F.log((F.col("c2") + 1.0) / (F.col("c1") + F.lit(float(vocab))))
        * 10000
        + 0.5
    ).cast("bigint")
    scored = (
        occ.join(c2, ["w1", "w2"])
        .join(c1, "w1")
        .select(id_col, "occ", nlp.alias("nlp_q4"))
    )
    agg = scored.groupBy(id_col).agg(
        F.sum("occ").alias("__n"), F.sum(F.col("occ") * F.col("nlp_q4")).alias("__s")
    )
    return df.select(id_col).join(agg, id_col, "left").select(
        id_col,
        F.coalesce(F.col("__n"), F.lit(0)).cast("bigint").alias("n_bigrams"),
        # the mean itself is integer round-half-up math; the DOUBLE cast
        # is wire-format only (a NULLABLE int column round-trips through
        # pandas as float on one engine and object on the other, breaking
        # stringified comparison — the repo-wide rule: nullable numeric
        # output columns are DOUBLE on both sides)
        F.expr("(2 * __s + __n) div (2 * __n)").cast("double").alias("xent_q4"),
    )


def corpus_health(
    df: DataFrame,
    short_tokens: int = 20,
    source_col: str = "source",
    lang_col: str = "lang",
    text_col: str = "text",
) -> DataFrame:
    """One-pass corpus health report at three grains — (source, lang),
    (source), overall — the monitoring table a corpus pipeline prints
    after every ingest batch: volumes, token mass, short-doc fraction,
    and exact-duplicate rate, each per grain.

    ``ROLLUP`` (one Expand + one aggregation — the count connector's
    GROUPING SETS posture) computes all three grains in a SINGLE corpus
    scan; ``lvl`` is the grouping_id bitmask disambiguating grains.
    ``dup_frac_q4`` uses an EXACT ``count(distinct md5(text))`` so the
    DuckDB twin is bit-identical — the corpus-scale variant would swap
    in the HLL sketch (:func:`~.sketches.corpus_distinct_hll`) to avoid
    the per-group distinct expansion; fractions are 1e4 fixed-point
    (floor) so no float accumulation order can differ cross-engine.
    """
    from .dedup import tokens

    # size() of a null array is -1 under the non-ANSI default (and null
    # ANSI-on): gate on text nullness so a null-text doc contributes a
    # NULL token count in BOTH modes — sum/avg skip it and the short-doc
    # CASE falls to 0, exactly the DuckDB twin's null-skip behavior
    n_tok = F.when(
        F.col(text_col).isNotNull(), F.size(tokens(F.col(text_col)))
    )
    base = df.select(
        F.col(source_col).alias("source"),
        F.col(lang_col).alias("lang"),
        n_tok.alias("__t"),
        F.md5(F.col(text_col)).alias("__h"),
    )
    n = F.count(F.lit(1))
    short = F.sum(F.when(F.col("__t") < short_tokens, 1).otherwise(0))
    d = F.countDistinct("__h")
    return base.rollup("source", "lang").agg(
        F.grouping_id().cast("int").alias("lvl"),
        n.cast("bigint").alias("n_docs"),
        F.sum("__t").cast("bigint").alias("n_tokens"),
        F.floor(10000.0 * F.sum("__t") / n).cast("bigint").alias("avg_tokens_q4"),
        F.floor(10000.0 * short / n).cast("bigint").alias("short_frac_q4"),
        d.cast("bigint").alias("distinct_docs"),
        F.floor(10000.0 * (n - d) / n).cast("bigint").alias("dup_frac_q4"),
    )


def token_entropy(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-document Shannon entropy of the whitespace-token
    distribution, in bits/token -- the gibberish/boilerplate signal
    (near-zero = one token repeated; near ``log2(n)`` = no structure;
    natural text sits in a stable band, which is why entropy cutoffs
    appear in C4-descendant quality stacks alongside the Gopher
    repetition family).

    ``H = log2(n) - (sum c_i*log2(c_i))/n`` over token counts ``c_i``
    -- computed as ONE fold over the sorted token array (run-length
    counting, the :func:`repetition_stats` scan posture): zero
    shuffles, zero explodes. Each run's ``c*log2(c)`` term is
    quantized to 1e-6 fixed point BEFORE accumulating, so the sum is
    exact integer math and the DuckDB twin (grouped counts + integer
    sum, any order) lands on identical bits. Returns ``(id, n_tokens,
    entropy_q4, entropy_ratio_q4)`` -- ratio normalizes by ``log2(n)``
    (null when n == 1); zero-token documents are dropped.
    """

    def clogc_q6(c):
        d = c.cast("double")
        return F.floor(d * F.log2(d) * 1e6 + F.lit(0.5)).cast("bigint")

    st = df.select(
        F.col(id_col),
        F.array_sort(tokens(F.col(text_col))).alias("__st"),
    )
    zero = F.lit(0).cast("bigint")
    init = F.struct(
        F.lit(" ").alias("prev"),
        zero.alias("run"),
        zero.alias("sq"),
    )

    def step(acc, x):
        same = (x == acc.getField("prev")) & (acc.getField("run") > 0)
        run = F.when(same, acc.getField("run") + 1).otherwise(
            F.lit(1).cast("bigint")
        )
        flush = F.when(
            same | (acc.getField("run") == 0), zero
        ).otherwise(clogc_q6(acc.getField("run")))
        return F.struct(
            x.alias("prev"),
            run.alias("run"),
            (acc.getField("sq") + flush).alias("sq"),
        )

    def finish(acc):
        return acc.getField("sq") + F.when(
            acc.getField("run") > 0, clogc_q6(acc.getField("run"))
        ).otherwise(zero)

    sq = F.aggregate(F.col("__st"), init, step, finish)
    n = F.size("__st").cast("double")
    h = F.log2(n) - (F.col("__sq") / F.lit(1e6)) / n
    ratio = F.try_divide(h, F.log2(n))
    return (
        st.select(F.col(id_col), F.col("__st"), sq.alias("__sq"))
        .filter(F.size("__st") >= 1)
        .select(
            F.col(id_col),
            F.size("__st").cast("bigint").alias("n_tokens"),
            F.floor(h * 10000 + F.lit(0.5)).cast("bigint").alias("entropy_q4"),
            F.floor(ratio * 10000 + F.lit(0.5))
            .cast("bigint")
            .alias("entropy_ratio_q4"),
        )
    )
