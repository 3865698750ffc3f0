"""Training-set curation: quality filter + language filter + one
canonical document per near-dup cluster.

This composes the three cheap stages a pretraining data pipeline runs
before expensive processing (the same filter -> dedup -> select shape
the reference's downstream consumers apply to collector output):

1. score every document (``textstats.quality_col``) and language-ID it
   (``textstats.lang_col``) in ONE projection over the documents scan;
2. drop documents below the quality bar or outside the target language;
3. join the surviving documents to their dedup cluster labels
   (``dedup.connected_components`` over MinHash-LSH candidate pairs)
   and keep exactly one representative per cluster — the
   highest-quality member, ties broken by smallest id.

Scale posture (100 TB): stage 1 is a zero-shuffle projection fused
with the parquet scan; the quality/language filter prunes BEFORE the
join so only survivors shuffle; the cluster join is one exchange per
side on the id; representative selection is a single window over
``cluster_id`` (``row_number`` and the member count share one sort, so
it is one exchange, not two). Nothing here is quadratic, and the
documents table is scanned once by this module (the cluster labels'
own MinHash scan is the pipeline's other, unavoidable pass).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .textstats import lang_col, quality_col


def curate(
    docs: DataFrame,
    clusters: DataFrame,
    min_quality: int = 0,
    lang: str = "en",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Select canonical training documents.

    ``clusters`` is ``(id_col, cluster_id)`` — e.g. the output of
    ``connected_components(docs, lsh_candidate_pairs(...))``.

    Returns ``(id_col, cluster_id, quality_q4, n_members)`` with one
    row per cluster that has at least one eligible member:
    ``n_members`` counts the ELIGIBLE members (post quality/language
    filter), and the returned row is the best-quality one among them.
    """
    metrics = docs.select(
        F.col(id_col),
        quality_col(text_col).alias("quality_q4"),
        lang_col(text_col).alias("pred_lang"),
    )
    eligible = metrics.filter(
        (F.col("pred_lang") == lang) & (F.col("quality_q4") >= min_quality)
    ).drop("pred_lang")
    joined = eligible.join(clusters, id_col)
    w = Window.partitionBy("cluster_id")
    rank = F.row_number().over(
        w.orderBy(F.col("quality_q4").desc(), F.col(id_col).asc())
    )
    return (
        joined.select(
            id_col,
            "cluster_id",
            "quality_q4",
            rank.alias("__rn__"),
            F.count(F.lit(1)).over(w).alias("n_members"),
        )
        .filter(F.col("__rn__") == 1)
        .drop("__rn__")
    )
