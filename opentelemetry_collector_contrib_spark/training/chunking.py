"""Document chunking + corpus vocabulary — the RAG/pretraining prep ops.

- :func:`chunk_documents`: split each document into overlapping
  token-window chunks (the retrieval-corpus builder's sliding window).
  Zero-shuffle: chunk starts are a per-row ``sequence`` +
  ``transform``, then ONE ``explode`` — at 100 TB this is a map-only
  pass whose output fans out by the chunk factor, no shuffle anywhere.
- :func:`vocab_topk`: corpus-wide token frequencies, top-k with a
  deterministic (count desc, token asc) tie-break. One explode + one
  map-side-combined hash aggregation + a driver-bounded ``limit`` —
  the classic two-exchange top-k (partial agg then single-partition
  sort of the k candidates via ``TakeOrderedAndProject``).

Both have exact DuckDB twins for the driver oracle gate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def chunk_documents(
    df: DataFrame,
    window: int = 64,
    overlap: int = 16,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(id, chunk_idx, chunk_text, n_tokens): whitespace-token sliding
    windows of ``window`` tokens advancing by ``window - overlap``.
    Documents shorter than one window yield exactly one chunk; empty
    documents yield none. Chunk layout is a pure function of the row —
    bit-deterministic at any parallelism."""
    if not 0 <= overlap < window:
        raise ValueError("need 0 <= overlap < window")
    step = window - overlap
    toks = F.filter(F.split(F.col(text_col), r"\s+"), lambda t: t != "")
    staged = df.withColumn("__toks", toks).withColumn("__n", F.size(F.col("__toks")))
    n = F.col("__n")
    # chunks = 1 + ceil(max(n - window, 0) / step), 0 when the doc is empty
    n_chunks = F.when(
        n > 0,
        1 + F.ceil(F.greatest(n - window, F.lit(0)) / F.lit(step)).cast("int"),
    ).otherwise(F.lit(0))
    starts = F.when(
        n_chunks > 0, F.sequence(F.lit(0), n_chunks - 1)
    ).otherwise(F.array().cast("array<int>"))
    exploded = staged.select(
        F.col(id_col),
        "__toks",
        F.explode(starts).alias("chunk_idx"),
    )
    piece = F.slice(
        F.col("__toks"), F.col("chunk_idx") * step + 1, window
    )
    return exploded.select(
        F.col(id_col),
        "chunk_idx",
        F.array_join(piece, " ").alias("chunk_text"),
        F.size(piece).alias("n_tokens"),
    )


def vocab_topk(
    df: DataFrame,
    k: int = 100,
    text_col: str = "text",
) -> DataFrame:
    """(token, n): the corpus's k most frequent whitespace tokens,
    ties broken lexicographically — deterministic across engines and
    parallelism levels."""
    toks = F.filter(F.split(F.col(text_col), r"\s+"), lambda t: t != "")
    return (
        df.select(F.explode(toks).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), F.col("token"))
        .limit(k)
    )
