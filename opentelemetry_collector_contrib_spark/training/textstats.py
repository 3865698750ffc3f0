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
    return df.select(
        F.col(id_col),
        n.alias("n_tokens"),
        nd.alias("n_distinct"),
        F.round(nd / n, 4).alias("distinct_ratio"),
        F.round(total_len / n, 4).alias("avg_token_len"),
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
    # across engines, unlike round(x, 4) whose boundary behavior varies
    return F.floor(raw * 10000 + F.lit(0.5)).cast("bigint")


def lang_col(text_col: str = "text"):
    """Column expression for the stopword-ratio language heuristic:
    'en' when English function words exceed 2% of tokens."""
    toks = tokens(F.col(text_col))
    stop = F.size(F.filter(toks, lambda t: t.isin(STOPWORDS)))
    ratio = stop / F.size(toks)
    return F.when(ratio > 0.02, "en").otherwise("unknown")


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
