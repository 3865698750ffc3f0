"""fuzzy_dedup_funnel — the end-to-end verified fuzzy-dedup query.

Composition-level invariants: the verify stage can only SPLIT raw-LSH
clusters (never merge), keep flags select exactly one canonical per
cluster, and a planted band-collision false positive is excluded from
the verified components. Value-lockstep vs the nested recursive-CTE
DuckDB oracle runs via tools/ansi_sweep.py and the driver gate.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

import __spark_entry__ as entry
from opentelemetry_collector_contrib_spark.training.dedup import (
    connected_components,
    jaccard_verify_pairs,
)


@pytest.fixture(scope="module")
def funnel(spark, sf_dir):
    return entry.queries()["fuzzy_dedup_funnel"](spark, sf_dir).cache()


def test_every_doc_labeled_once(funnel, spark, sf_dir):
    n_docs = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    assert funnel.count() == n_docs
    assert funnel.select("doc_id").distinct().count() == n_docs


def test_keep_is_the_canonical_member(funnel):
    bad = funnel.filter(
        (F.col("doc_id") == F.col("cluster_id")) != F.col("keep")
    ).count()
    assert bad == 0
    n_clusters = funnel.select("cluster_id").distinct().count()
    assert funnel.filter("keep").count() == n_clusters


def test_member_counts_consistent(funnel):
    recount = funnel.groupBy("cluster_id").count()
    bad = (
        funnel.join(recount, "cluster_id")
        .filter(F.col("n_members") != F.col("count"))
        .count()
    )
    assert bad == 0


def test_nonvacuous_and_refines_raw_clusters(funnel, spark, sf_dir):
    # at sf0.001 the corpus has planted near-dups: some clusters must
    # be multi-member, or the funnel verifies nothing
    assert funnel.filter("n_members > 1").count() > 0
    # verify can only SPLIT raw-LSH clusters: every funnel cluster's
    # members must share one raw dedup_clusters label
    raw = entry.queries()["dedup_clusters"](spark, sf_dir).withColumnRenamed(
        "cluster_id", "raw_cluster"
    )
    mixed = (
        funnel.join(raw, "doc_id")
        .groupBy("cluster_id")
        .agg(F.countDistinct("raw_cluster").alias("nraw"))
        .filter("nraw > 1")
        .count()
    )
    assert mixed == 0


def test_planted_false_positive_split(spark):
    # A=B exact dup; C is a candidate PAIRED to A by a (simulated) band
    # collision but with low true Jaccard -> verify must cut the A-C
    # edge, so C stays its own cluster while A-B merge
    docs = spark.createDataFrame(
        [
            (0, "w1 w2 w3 w4 w5 w6 w7 w8"),
            (1, "w1 w2 w3 w4 w5 w6 w7 w8"),
            (2, "x1 x2 x3 x4 x5 x6 x7 x8"),
        ],
        "doc_id int, text string",
    )
    cand = spark.createDataFrame(
        [(0, 1), (0, 2)], "a_id int, b_id int"
    )
    verified = jaccard_verify_pairs(docs, cand, threshold=0.8).select(
        "a_id", "b_id"
    )
    cl = {
        r["doc_id"]: r["cluster_id"]
        for r in connected_components(docs, verified).collect()
    }
    assert cl[0] == cl[1] == 0
    assert cl[2] == 2
