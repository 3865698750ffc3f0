"""DSIR importance resampling + domain-quota curation (round-4 late
additions): the two remaining standard stages of a web-scale
pretraining curation pipeline — target-distribution-matched selection
(Xie et al. 2023) and RefinedWeb-style per-domain caps — plus the
skew-safe salted two-phase ``topk_per_key`` primitive the quota runs
on, whose whole point is EXACT equality with the naive one-window rank
under a total order."""

from __future__ import annotations

import pytest
from pyspark.sql import Row, Window
from pyspark.sql import functions as F

from opentelemetry_collector_contrib_spark.training import (
    domain_quota,
    dsir_sample,
    topk_per_key,
)


def _docs(spark, rows):
    return spark.createDataFrame(
        [Row(doc_id=i, text=t, lang=lg, source=s) for i, t, lg, s in rows]
    )


# ---------------------------------------------------------------- DSIR


def test_dsir_prefers_target_like_documents(spark):
    # target docs speak in 'alpha beta'; off-target docs in 'zeta yota'.
    # A raw doc written in the target's vocabulary must outrank a raw
    # doc written in the off-target vocabulary by WEIGHT (not noise).
    rows = [(i, "alpha beta alpha beta", "en", "t") for i in range(20)]
    rows += [(100 + i, "zeta yota zeta yota", "xx", "r") for i in range(20)]
    rows += [(200, "alpha beta alpha beta alpha beta", "xx", "r")]
    rows += [(201, "zeta yota zeta yota zeta yota", "xx", "r")]
    out = dsir_sample(
        _docs(spark, rows), F.col("lang") == "en", k=50, n_buckets=64
    )
    w = {r.doc_id: r.dsir_w_q4 for r in out.collect()}
    assert w[200] > 0 > w[201]


def test_dsir_deterministic_across_partitioning(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    a = dsir_sample(docs, F.col("lang") == "en", k=25, n_buckets=128)
    b = dsir_sample(
        docs.repartition(17), F.col("lang") == "en", k=25, n_buckets=128
    )
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_dsir_k_cap_and_zero_token_docs_excluded(spark):
    rows = [(i, "w" + str(i % 3), "en", "s") for i in range(10)]
    rows += [(99, "", "en", "s"), (98, "   ", "en", "s")]
    out = dsir_sample(_docs(spark, rows), F.col("lang") == "en", k=5).collect()
    assert len(out) == 5
    assert {r.doc_id for r in out}.isdisjoint({98, 99})
    for r in out:
        assert r.score_q4 == r.dsir_w_q4 + r.gumbel_q4


def test_dsir_empty_target_slice_is_uniform_prior(spark):
    # no doc matches the target: every bucket's target count is 0, so
    # the log-ratio is the same constant for every OBSERVED bucket only
    # through the raw term — weights still materialize (no ANSI throw,
    # no div-by-zero) and selection degrades to Gumbel order.
    rows = [(i, f"tok{i} tok{i + 1}", "en", "s") for i in range(8)]
    out = dsir_sample(_docs(spark, rows), F.lit(False), k=8).collect()
    assert len(out) == 8


# ---------------------------------------------------- salted top-k


@pytest.mark.parametrize("n_salts", [1, 2, 7, 64])
def test_topk_per_key_equals_single_window(spark, n_salts):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    scored = docs.select("doc_id", "source", F.length("text").alias("v"))
    order = [F.col("v").desc(), F.col("doc_id").asc()]
    naive = (
        scored.withColumn(
            "rank",
            F.row_number().over(
                Window.partitionBy("source").orderBy(*order)
            ),
        )
        .filter(F.col("rank") <= 3)
    )
    got = topk_per_key(
        scored, ["source"], order, 3, F.col("doc_id"), n_salts=n_salts
    )
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, naive.collect())
    )


def test_topk_per_key_hot_key(spark):
    # one viral key with 500 rows, one cold key with 2: the salted plan
    # must return exactly the true top-k of each
    rows = [Row(id=i, key="hot", v=i % 97) for i in range(500)]
    rows += [Row(id=1000, key="cold", v=5), Row(id=1001, key="cold", v=9)]
    df = spark.createDataFrame(rows)
    got = topk_per_key(
        df, ["key"], [F.col("v").desc(), F.col("id")], 2, F.col("id"),
        n_salts=16,
    ).collect()
    by_key = {}
    for r in got:
        by_key.setdefault(r.key, []).append((r.rank, r.id, r.v))
    assert sorted(by_key["cold"]) == [(1, 1001, 9), (2, 1000, 5)]
    # hot top-2: v=96 rows with smallest ids are 96 and 193
    assert sorted(by_key["hot"]) == [(1, 96, 96), (2, 193, 96)]


def test_topk_per_key_stage1_partitions_by_salt(spark):
    # plan guard: the first window exchange must include the salt —
    # that's the skew-safety property itself
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    scored = docs.select("doc_id", "source", F.length("text").alias("v"))
    plan = (
        topk_per_key(
            scored, ["source"], [F.col("v").desc(), F.col("doc_id")], 3,
            F.col("doc_id"),
        )
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "__salt" in plan


# ---------------------------------------------------- domain quota


def test_domain_quota_blocklist_and_cap(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    out = domain_quota(docs, max_per_domain=2, blocklist=("src1",))
    rows = out.collect()
    assert all(r.source != "src1" for r in rows)
    per = {}
    for r in rows:
        per[r.source] = per.get(r.source, 0) + 1
    assert per and all(c <= 2 for c in per.values())
    # ranks are 1..n per domain and ordered by quality desc, id asc
    for s in per:
        members = sorted(
            (r for r in rows if r.source == s), key=lambda r: r.rank
        )
        assert [m.rank for m in members] == list(range(1, len(members) + 1))
        keys = [(-m.quality_q4, m.doc_id) for m in members]
        assert keys == sorted(keys)


def test_domain_quota_empty_blocklist(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    srcs = {
        r.source
        for r in domain_quota(docs, max_per_domain=1).select("source").collect()
    }
    assert len(srcs) == docs.select("source").distinct().count()


# ------------------------------------------- LSH -> Jaccard verify


def test_jaccard_verify_matches_exact_on_candidates(spark):
    from opentelemetry_collector_contrib_spark.training import (
        jaccard_verify_pairs,
        lsh_candidate_pairs,
        minhash_signatures,
        ngram_jaccard_pairs,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    pairs = lsh_candidate_pairs(
        minhash_signatures(docs, n_hashes=8), bands=4, rows_per_band=2,
        max_bucket=200,
    )
    got = {
        (r.a_id, r.b_id): r.jaccard
        for r in jaccard_verify_pairs(docs, pairs, threshold=0.3).collect()
    }
    # verify == corpus-wide exact baseline restricted to the candidates
    cand = {(r.a_id, r.b_id) for r in pairs.collect()}
    exact = {
        (r.a_id, r.b_id): r.jaccard
        for r in ngram_jaccard_pairs(docs, threshold=0.3).collect()
        if (r.a_id, r.b_id) in cand
    }
    assert got == exact


def test_jaccard_verify_false_positive_dropped(spark):
    from pyspark.sql import Row

    from opentelemetry_collector_contrib_spark.training import (
        jaccard_verify_pairs,
    )

    docs = spark.createDataFrame(
        [
            Row(doc_id=1, text="a b c d e f"),
            Row(doc_id=2, text="a b c d e f"),
            Row(doc_id=3, text="x y z p q r"),
        ]
    )
    pairs = spark.createDataFrame(
        [Row(a_id=1, b_id=2), Row(a_id=1, b_id=3)]  # (1,3) is a false positive
    )
    out = {(r.a_id, r.b_id): r.jaccard for r in
           jaccard_verify_pairs(docs, pairs, threshold=0.5).collect()}
    assert out == {(1, 2): 1.0}
