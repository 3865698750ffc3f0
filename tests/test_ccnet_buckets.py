"""ccnet_ppl_buckets — the CCNet head/middle/tail perplexity split.

Composition invariants at sf0.001: every scored doc gets a bucket,
buckets are ordered by score (head <= middle <= tail pointwise across
bucket boundaries), tertile masses are balanced up to sketch bucket
width, and unscored docs are exactly the sub-bigram ones. Value
lockstep vs the composed DuckDB oracle runs via tools/ansi_sweep.py
and the driver gate.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

import __spark_entry__ as entry


@pytest.fixture(scope="module")
def buckets(spark, sf_dir):
    return entry.queries()["ccnet_ppl_buckets"](spark, sf_dir).cache()


def test_total_and_unscored(buckets, spark, sf_dir):
    n_docs = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    assert buckets.count() == n_docs
    # unscored <=> no bigrams <=> null score, and nothing else
    bad = buckets.filter(
        (F.col("ppl_bucket") == "unscored") != F.col("xent_q4").isNull()
    ).count()
    assert bad == 0


def test_buckets_ordered_by_score(buckets):
    agg = (
        buckets.filter("xent_q4 IS NOT NULL")
        .groupBy("ppl_bucket")
        .agg(F.min("xent_q4").alias("lo"), F.max("xent_q4").alias("hi"))
        .collect()
    )
    rng = {r["ppl_bucket"]: (r["lo"], r["hi"]) for r in agg}
    assert set(rng) == {"head", "middle", "tail"}  # non-vacuous split
    assert rng["head"][1] <= rng["middle"][0] or rng["head"][1] < rng["middle"][1]
    # boundaries are thresholds on the score, so ranges cannot overlap
    assert rng["head"][1] <= rng["middle"][0]
    assert rng["middle"][1] <= rng["tail"][0]


def test_tertile_masses_balanced(buckets):
    n = buckets.filter("xent_q4 IS NOT NULL").count()
    head = buckets.filter("ppl_bucket = 'head'").count()
    headmid = buckets.filter("ppl_bucket IN ('head','middle')").count()
    # the sketch threshold is the smallest bucket edge whose CDF
    # reaches ceil(p*n): mass below it is >= p*n by construction, and
    # overshoot is bounded by the histogram bucket mass; allow 15%
    assert head >= 0.33 * n
    assert head <= 0.48 * n
    assert headmid >= 0.66 * n
    assert headmid <= 0.81 * n
