"""Deterministic corpus splits and training-order shuffle.

The three loader-facing assignments every training pipeline needs
before data leaves the engine:

* :func:`hash_split` — train/val/test by a consistent hash of a key
  column. Never ``rand()``: a new corpus snapshot must reproduce the
  SAME assignment for unchanged rows (resume/dedup-increment safety),
  and the md5 bucket has a bit-exact DuckDB twin so the assignment is
  oracle-checkable (same coin as the probabilistic sampler,
  ``processors/sampler.py _bucket``).
* :func:`cluster_safe_split` — the leakage-safe variant: near-duplicate
  documents MUST land in the same split (a train/test pair of
  near-dups is test-set contamination by construction — Lee et al.
  2021 §6 measure exactly this leak). The split coin is keyed on the
  dedup CLUSTER id (connected-components labels from
  ``dedup.duplicate_clusters``) instead of the doc id; singletons fall
  back to their own id.
* :func:`deterministic_shuffle` — global training order as a pure
  function of (seed, id): shard = hash-bucket, position = rank of the
  hash within the shard. Reshuffling between epochs is a seed bump, no
  data movement decision left to the engine's physical layout.

Scale posture: hash_split and the shuffle's shard assignment are
zero-shuffle projections; cluster_safe_split adds one key-keyed join
against the (already tiny relative to the corpus) cluster-label frame;
the shuffle's in-shard rank is one window per shard — shard count is
chosen so a shard is loader-sized (10^5-10^6 docs), which caps the
window partition exactly like ``pack_sequences``'s per-shard layout.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..processors.sampler import _bucket

DEFAULT_FRACTIONS = {"train": 0.98, "val": 0.01, "test": 0.01}


def _split_col(key: Column, fractions: dict[str, float], seed: int) -> Column:
    total = sum(fractions.values())
    if not 0.999 <= total <= 1.001:
        raise ValueError(f"split fractions must sum to 1, got {total}")
    b = _bucket(key.cast("string"), seed, "md5")
    expr = None
    cum = 0.0
    names = list(fractions)
    for name in names[:-1]:
        cum += fractions[name]
        c = b < int(round(cum * 10000))
        expr = F.when(c, F.lit(name)) if expr is None else expr.when(c, F.lit(name))
    last = F.lit(names[-1])
    return last if expr is None else expr.otherwise(last)


def hash_split(
    df: DataFrame,
    key_col: str = "doc_id",
    fractions: dict[str, float] | None = None,
    seed: int = 17,
) -> DataFrame:
    """Add a ``split`` column by consistent hash of ``key_col``.

    Buckets are half-open prefix ranges of the [0, 10000) md5 bucket
    space in dict order, so fraction edits only move rows between the
    ADJACENT splits they touch. Zero shuffle, no Python.
    """
    fr = fractions or DEFAULT_FRACTIONS
    return df.withColumn("split", _split_col(F.col(key_col), fr, seed))


def cluster_safe_split(
    docs: DataFrame,
    labels: DataFrame,
    id_col: str = "doc_id",
    label_col: str = "cluster",
    fractions: dict[str, float] | None = None,
    seed: int = 17,
) -> DataFrame:
    """Leakage-safe split: the hash coin is keyed on the near-dup
    cluster id, so every member of a duplicate cluster lands in the
    SAME split; docs without a cluster row key on their own id.

    ``labels`` is a ``(id_col, label_col)`` frame — the output of
    ``dedup.duplicate_clusters`` (connected components over LSH-verified
    edges), or any other grouping whose co-assignment must be atomic
    (URL host, repository, conversation).
    """
    fr = fractions or DEFAULT_FRACTIONS
    lab = labels.select(
        F.col(id_col).alias("__sid"), F.col(label_col).alias("__cl")
    )
    joined = docs.join(lab, docs[id_col] == F.col("__sid"), "left")
    key = F.coalesce(F.col("__cl").cast("string"), docs[id_col].cast("string"))
    return joined.withColumn("split", _split_col(key, fr, seed)).drop(
        "__sid", "__cl"
    )


def deterministic_shuffle(
    df: DataFrame,
    id_col: str = "doc_id",
    seed: int = 17,
    n_shards: int = 64,
) -> DataFrame:
    """Assign a global training order as ``(shard, pos)``, a pure
    function of (seed, id): shard = md5 bucket of the id, pos = rank of
    a SECOND independent hash within the shard (deterministic tie-break
    on the id itself).

    The order is epoch-stable and reproducible on any cluster layout;
    a new epoch is ``seed + 1``, touching no state. The in-shard rank
    is one window per shard — size shards to the loader (10^5-10^6
    docs) and the window partition stays bounded; the shard assignment
    itself is a zero-shuffle projection.
    """
    if not 1 <= n_shards <= 10000:
        # the md5 coin has 10^4 buckets; more shards than buckets would
        # leave shards structurally empty
        raise ValueError("n_shards must be in [1, 10000]")
    sid = F.col(id_col).cast("string")
    shard = _bucket(sid, seed, "md5") % n_shards
    # order on the FULL 60-bit hash, not the 10^4 sampling bucket: at
    # loader-sized shards (10^5-10^6 docs) a 10^4-value key would
    # collide ~100 docs per value and the id tiebreak would leak long
    # runs of ORIGINAL corpus order into the training order — the
    # adjacency correlation a shuffle exists to destroy
    order_key = F.conv(
        F.substring(F.md5(F.concat(F.lit(f"{seed}:pos:"), sid)), 1, 15), 16, 10
    ).cast("bigint")
    w = Window.partitionBy("shard").orderBy(
        F.col("__ok__").asc(), F.col(id_col).asc()
    )
    return (
        df.withColumn("shard", shard.cast("int"))
        .withColumn("__ok__", order_key)
        .withColumn("pos", F.row_number().over(w))
        .drop("__ok__")
    )
