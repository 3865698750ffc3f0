"""Deterministic splits + training-order shuffle."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from opentelemetry_collector_contrib_spark.training.splits import (
    cluster_safe_split,
    deterministic_shuffle,
    hash_split,
)


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(
        [(i, f"doc text {i}") for i in range(2000)], "doc_id long, text string"
    )


def test_hash_split_fractions_and_determinism(spark, docs):
    out = hash_split(docs, fractions={"train": 0.8, "val": 0.1, "test": 0.1})
    counts = {r.split: r.cnt for r in out.groupBy("split").agg(
        F.count(F.lit(1)).alias("cnt")).collect()}
    assert set(counts) == {"train", "val", "test"}
    assert counts["train"] > 1400                  # ~80% of 2000
    assert 100 < counts["val"] + counts["test"] < 500
    # determinism: same seed -> identical assignment
    again = {r.doc_id: r.split for r in hash_split(
        docs, fractions={"train": 0.8, "val": 0.1, "test": 0.1}).collect()}
    first = {r.doc_id: r.split for r in out.collect()}
    assert first == again
    # different seed -> a different assignment for at least some rows
    other = {r.doc_id: r.split for r in hash_split(
        docs, fractions={"train": 0.8, "val": 0.1, "test": 0.1}, seed=99
    ).collect()}
    assert other != first


def test_hash_split_prefix_stability(spark, docs):
    """Growing the train fraction only moves rows OUT of the adjacent
    split — no train row flips to test."""
    a = {r.doc_id: r.split for r in hash_split(
        docs, fractions={"train": 0.8, "val": 0.2}).collect()}
    b = {r.doc_id: r.split for r in hash_split(
        docs, fractions={"train": 0.9, "val": 0.1}).collect()}
    for k, v in a.items():
        if v == "train":
            assert b[k] == "train"


def test_hash_split_bad_fractions(spark, docs):
    with pytest.raises(ValueError, match="sum to 1"):
        hash_split(docs, fractions={"train": 0.5, "val": 0.1}).collect()


def test_cluster_safe_split_coassigns_near_dups(spark, docs):
    # every 10 consecutive ids form one near-dup cluster
    labels = spark.createDataFrame(
        [(i, i // 10) for i in range(2000)], "doc_id long, cluster long"
    )
    out = cluster_safe_split(docs, labels)
    per_cluster = (
        out.withColumn("cl", F.col("doc_id") / 10)
        .withColumn("cl", F.floor("cl"))
        .groupBy("cl")
        .agg(F.count_distinct("split").alias("nsplits"))
        .agg(F.max("nsplits").alias("mx"))
        .collect()[0]
        .mx
    )
    assert per_cluster == 1   # a cluster never straddles splits


def test_cluster_safe_split_singleton_fallback(spark):
    docs = spark.createDataFrame(
        [(1, "a"), (2, "b")], "doc_id long, text string"
    )
    labels = spark.createDataFrame([], "doc_id long, cluster long")
    out = cluster_safe_split(docs, labels)
    assert out.count() == 2
    assert set(out.columns) == {"doc_id", "text", "split"}
    # singleton key == hash_split on the id (same coin)
    hs = {r.doc_id: r.split for r in hash_split(docs).collect()}
    cs = {r.doc_id: r.split for r in out.collect()}
    assert hs == cs


def test_deterministic_shuffle_is_a_permutation(spark, docs):
    out = deterministic_shuffle(docs, n_shards=8)
    rows = out.select("doc_id", "shard", "pos").collect()
    assert len(rows) == 2000
    # (shard, pos) is a dense rank within each shard
    by_shard: dict[int, list[int]] = {}
    for r in rows:
        by_shard.setdefault(r.shard, []).append(r.pos)
    assert set(by_shard) <= set(range(8))
    for poss in by_shard.values():
        assert sorted(poss) == list(range(1, len(poss) + 1))
    # stable across runs; different seed -> different order
    again = {(r.doc_id): (r.shard, r.pos) for r in
             deterministic_shuffle(docs, n_shards=8).collect()}
    assert {(r.doc_id): (r.shard, r.pos) for r in rows} == again
    moved = {(r.doc_id): (r.shard, r.pos) for r in
             deterministic_shuffle(docs, n_shards=8, seed=18).collect()}
    assert moved != again


def test_deterministic_shuffle_shard_bound(spark):
    import pytest as _pytest

    from opentelemetry_collector_contrib_spark.training.splits import (
        deterministic_shuffle,
    )

    df = spark.createDataFrame([(1,)], "doc_id long")
    with _pytest.raises(ValueError, match=r"\[1, 10000\]"):
        deterministic_shuffle(df, n_shards=20000)


def test_hash_split_fraction_property(spark):
    """Property: across arbitrary fraction dicts, realized proportions
    track the requested ones within binomial noise, and every row gets
    exactly one split."""
    from hypothesis import given, settings, strategies as st

    docs = spark.createDataFrame(
        [(i,) for i in range(4000)], "doc_id long"
    ).cache()
    docs.count()

    @settings(max_examples=8, deadline=None)
    @given(
        st.lists(
            st.floats(min_value=0.05, max_value=1.0), min_size=2, max_size=4
        )
    )
    def check(weights):
        total = sum(weights)
        fr = {f"s{i}": w / total for i, w in enumerate(weights)}
        # renormalize exactly: fix the last fraction so they sum to 1
        fr[f"s{len(weights)-1}"] = 1.0 - sum(
            v for k, v in fr.items() if k != f"s{len(weights)-1}"
        )
        from opentelemetry_collector_contrib_spark.training.splits import (
            hash_split,
        )

        out = hash_split(docs, fractions=fr)
        counts = {r.split: r.cnt for r in out.groupBy("split").agg(
            F.count(F.lit(1)).alias("cnt")).collect()}
        assert sum(counts.values()) == 4000
        for name, frac in fr.items():
            got = counts.get(name, 0) / 4000
            assert abs(got - frac) < 0.05, (name, got, frac)

    check()


# -- token_budget_cut ------------------------------------------------------

def _budget_docs(spark):
    rows = [
        (i, float((i * 37) % 100), 10 + (i % 7)) for i in range(500)
    ]
    return spark.createDataFrame(rows, "doc_id long, score double, toks long")


def test_token_budget_cut_matches_global_order(spark):
    from opentelemetry_collector_contrib_spark.training.curation import (
        token_budget_cut,
    )

    docs = _budget_docs(spark)
    budget = 2000
    got = {r.doc_id for r in token_budget_cut(
        docs, "score", "toks", budget).collect()}
    # reference: the one-window global definition
    rows = sorted(docs.collect(), key=lambda r: (-r.score, r.doc_id))
    cum, want = 0, set()
    for r in rows:
        cum += r.toks
        if cum <= budget:
            want.add(r.doc_id)
    assert got == want and len(want) > 0


def test_token_budget_cut_edges(spark):
    import pytest as _pytest

    from opentelemetry_collector_contrib_spark.training.curation import (
        token_budget_cut,
    )

    docs = _budget_docs(spark)
    # budget covers everything -> whole corpus kept
    assert token_budget_cut(docs, "score", "toks", 10**9).count() == 500
    # zero budget -> nothing
    assert token_budget_cut(docs, "score", "toks", 0).count() == 0
    with _pytest.raises(ValueError):
        token_budget_cut(docs, "score", "toks", -1)
    # null scores dropped, null tokens free
    import pyspark.sql.functions as Fn
    d2 = docs.withColumn(
        "score", Fn.when(Fn.col("doc_id") % 2 == 0, Fn.col("score"))
    ).withColumn(
        "toks", Fn.when(Fn.col("doc_id") % 3 != 0, Fn.col("toks"))
    )
    out = token_budget_cut(d2, "score", "toks", 10**9)
    assert out.filter(Fn.col("score").isNull()).count() == 0


def test_token_budget_cut_nan_inf_scores_dropped(spark):
    from opentelemetry_collector_contrib_spark.training.curation import (
        token_budget_cut,
    )

    docs = spark.createDataFrame(
        [
            (1, 90.0, 10), (2, 50.0, 10), (3, 10.0, 10),
            (4, float("nan"), 10), (5, float("inf"), 10),
            (6, float("-inf"), 10),
        ],
        "doc_id long, score double, toks long",
    )
    got = {r.doc_id for r in token_budget_cut(
        docs, "score", "toks", 20).collect()}
    assert got == {1, 2}          # NaN/Inf never rank or spend budget


def test_token_budget_cut_constant_scores_distributed(spark, monkeypatch):
    """Degenerate scorer: EVERY row lands in one bin. The boundary-bin
    cut must take the distributed prefix-sum path (no unpartitioned
    window over the data-scale frame) and still match the one-window
    global definition exactly."""
    from opentelemetry_collector_contrib_spark.training import curation

    monkeypatch.setattr(curation, "BOUNDARY_WINDOW_MAX_ROWS", 64)
    rows = [(i, 1.0, 1 + (i % 3)) for i in range(1000)]
    docs = spark.createDataFrame(rows, "doc_id long, score double, toks long")
    budget = 777
    out = curation.token_budget_cut(docs, "score", "toks", budget)
    plan = out._jdf.queryExecution().executedPlan().toString()
    # plan guard: the big bin's window is partitioned (__pid__), never
    # a single-partition global window
    assert "__pid__" in plan
    assert "Exchange SinglePartition" not in plan
    got = {r.doc_id for r in out.collect()}
    cum, want = 0, set()
    for r in sorted(rows, key=lambda r: (-r[1], r[0])):
        cum += r[2]
        if cum <= budget:
            want.add(r[0])
    assert got == want and len(want) > 0


def test_token_budget_cut_distributed_matches_single_task(spark, monkeypatch):
    """Same input, both boundary-bin strategies -> identical keep set."""
    from opentelemetry_collector_contrib_spark.training import curation

    docs = _budget_docs(spark)
    budget = 2000
    single = {r.doc_id for r in curation.token_budget_cut(
        docs, "score", "toks", budget).collect()}
    monkeypatch.setattr(curation, "BOUNDARY_WINDOW_MAX_ROWS", 0)
    forced = {r.doc_id for r in curation.token_budget_cut(
        docs, "score", "toks", budget).collect()}
    assert forced == single
