"""Model-based quality filtering: a hashed linear (fastText-style)
text classifier evaluated as a zero-shuffle column projection.

The missing member of the repo's filter family: heuristics
(``textstats.quality_score``), rule gates (``gopher_quality_filter``,
``c4_line_filter``) and LM perplexity (``lm_score``) are all here
already — production pipelines (CCNet, Wenzek et al. 2020; LLaMA;
RefinedWeb §3.1) additionally gate on a LEARNED linear classifier over
hashed bag-of-words features (fastText, Joulin et al. 2017: mean-pooled
bucket embeddings + linear layer; with a 1-d "embedding" that IS a
per-bucket weight). This module evaluates such a model inside Spark:

- each whitespace token hashes into one of ``len(weights_q4)`` buckets
  with the repo's portable 60-bit md5 primitive (same hash the minhash
  / DSIR / sketch families use, so a DuckDB twin is bit-exact);
- the document logit is ``bias + mean(weight[bucket(token)])`` —
  fastText's mean pooling;
- ``keep`` thresholds the logit.

Scaled-int discipline (repo-wide float rule): weights enter as 1e-4
units (``*_q4``); the per-doc sum is pure BIGINT so it is immune to
float-summation order. The mean rounds half-away-from-zero via the
integer identity ``floor((2*|s| + n) / (2*n))`` on the magnitude — the
division is one IEEE op whose floor is exact for |s| well under 2**52
(|s| <= 10^4 * n_tokens here), hence engine-portable.

100 TB posture: the whole scorer is ONE projection — tokenize,
transform to bucket weights (the weight table ships as a plan literal
array, like the IVF centroids), integer aggregate, compare. Zero
shuffles, zero joins, whole-stage codegen; scoring cost is the scan.
Retraining only replaces the literal array. Compare fastText's own
single pass over each document: identical arithmetic intensity, but
distributed and pushdown-friendly.
"""
from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .dedup import tokens


def pseudo_weights_q4(
    n_buckets: int = 256, a: int = 2654435761, m: int = 20001, shift: int = 10000
) -> list[int]:
    """Deterministic stand-in weight table in 1e-4 units, spanning
    [-1.0, +1.0]: ``w_q4[b] = (b*a) % m - shift`` (Knuth's golden-ratio
    multiplier). Real deployments pass trained weights; tests, the
    registered query and its DuckDB oracle derive THIS table from the
    same three integers so all sides agree bit-for-bit."""
    return [(b * a) % m - shift for b in range(n_buckets)]


def hashed_logit_score(
    df: DataFrame,
    weights_q4: list[int],
    bias_q4: int = 0,
    threshold_q4: int = 0,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Score every document with a hashed-bag-of-words linear model.

    Returns ``(id, n_tokens, sum_w_q4, logit_q4, keep)`` where
    ``logit_q4 = bias_q4 + round_half_away(sum_w_q4 / n_tokens)`` in
    1e-4 units and ``keep = logit_q4 >= threshold_q4``. A zero-token
    document carries no evidence: ``sum_w_q4``/``logit_q4`` are null
    and ``keep`` is false (the DSIR empty-doc rule). The probability
    ``sigmoid(logit)`` is deliberately NOT emitted: ``exp`` is a libm
    call whose low bits differ across engines, while the logit is
    integer — thresholding in logit space is exact and equivalent
    (sigmoid is monotone).

    Two staged projections, not nested lambdas — the PySpark 4.1
    classic-mode HOF hazard documented in ``processors/expo.py``.
    """
    n_b = len(weights_q4)
    wlit = F.lit(weights_q4).cast("array<bigint>")
    toks = tokens(F.col(text_col))
    # stage 1: per-token bucket weights (null text -> empty array, so
    # size() below is 0 under BOTH ANSI modes, never -1/null)
    bw = F.transform(
        toks,
        lambda t: F.element_at(
            wlit,
            (
                F.conv(F.substring(F.md5(t), 1, 15), 16, 10).cast("bigint")
                % n_b
                + 1
            ).cast("int"),
        ),
    )
    staged = df.select(
        F.col(id_col), F.coalesce(bw, F.array().cast("array<bigint>")).alias("__bw")
    )
    n = F.size("__bw")
    s = F.aggregate("__bw", F.lit(0).cast("bigint"), lambda acc, w: acc + w)
    mag = F.abs(s)
    # round-half-away-from-zero mean in q4 units; the guard keeps the
    # division from ever seeing n = 0 under ANSI (CASE is lazy)
    mean_mag = F.floor((2 * mag + n) / (2 * n)).cast("bigint")
    mean_q4 = F.when(s >= 0, mean_mag).otherwise(-mean_mag)
    logit = F.when(n > 0, F.lit(int(bias_q4)) + mean_q4)
    return staged.select(
        F.col(id_col),
        n.alias("n_tokens"),
        F.when(n > 0, s).alias("sum_w_q4"),
        logit.alias("logit_q4"),
        F.coalesce(logit >= F.lit(int(threshold_q4)), F.lit(False)).alias("keep"),
    )
