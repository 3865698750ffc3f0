"""Eighth review pass: ANSI-on degenerate-input audit of the late
round-4 additions (c4_line_filter, lm_score, mixture_sample,
rotate_vectors, the opq oracle rewrite) — the same empty-doc /
null-field / zero-vector probe matrix that caught the round-3 expo
crash class, with values MATERIALIZED under an ANSI session.
"""

from __future__ import annotations

import re

import pytest


@pytest.fixture(scope="module")
def ansi_spark(spark):
    # flip ANSI on the SHARED session and restore it — the repo-wide
    # pattern (test_review_r4.py). Never builder.getOrCreate()+stop():
    # getOrCreate returns the session-scoped singleton, so stop() would
    # kill the SparkContext under every later test module.
    old = spark.conf.get("spark.sql.ansi.enabled")
    spark.conf.set("spark.sql.ansi.enabled", "true")
    try:
        yield spark
    finally:
        spark.conf.set("spark.sql.ansi.enabled", old)


def _degenerate_docs(s):
    return s.createDataFrame(
        [(1, "src0", ""), (2, "src0", "one"), (3, None, "a b"), (4, "src1", None)],
        "doc_id long, source string, text string",
    )


def test_c4_ansi_degenerate_docs(ansi_spark):
    from opentelemetry_collector_contrib_spark.training import c4_line_filter

    # empty, 1-token, null-source and null-text docs all vanish quietly
    assert c4_line_filter(_degenerate_docs(ansi_spark)).collect() == []


def test_lm_ansi_degenerate_docs(ansi_spark):
    import math

    from opentelemetry_collector_contrib_spark.training import lm_score

    out = sorted(
        (r.doc_id, r.n_bigrams, r.xent_q4)
        for r in lm_score(_degenerate_docs(ansi_spark)).collect()
    )
    # the only scorable doc is "a b": V=3 tokens ('' docs contribute
    # nothing), C(a b)=1, C(a.)=1 -> -ln((1+1)/(1+3)) = ln 2
    ln2_q4 = float(math.floor(math.log(2) * 10000 + 0.5))
    assert out == [(1, 0, None), (2, 0, None), (3, 1, ln2_q4), (4, 0, None)]


def test_mixture_ansi_degenerate_docs(ansi_spark):
    from opentelemetry_collector_contrib_spark.training.sampling import (
        mixture_sample,
    )

    rows = mixture_sample(
        _degenerate_docs(ansi_spark), {"src0": 1.0}, 1000
    ).collect()
    # null-source and unweighted rows drop; zero-token docs keep n=0
    assert sorted((r.doc_id, r.n_tokens) for r in rows) == [(1, 0), (2, 1)]


def test_rotate_ansi_zero_and_null_vectors(ansi_spark):
    from opentelemetry_collector_contrib_spark.training import rotate_vectors

    emb = ansi_spark.createDataFrame(
        [(1, [0.0] * 64), (2, None)], "vec_id long, embedding array<double>"
    )
    rows = {r[0]: r[1] for r in rotate_vectors(emb).collect()}
    # the trailing-zero fold normalizes -0.0: every coord is +0.0
    assert all(str(x) == "0.0" for x in rows[1])
    assert rows[2] == [None] * 64


def test_opq_oracle_rewrite_is_complete():
    # the regex swap must leave no bare `embeddings` table reference
    # after the rotation CTE — a missed one would silently score
    # unrotated vectors on the oracle side only
    import __spark_entry__ as e

    sql = e.oracle_sql()["ann_opq_topk"]
    body = sql.split("CROSS JOIN rmat r)", 1)[1]
    assert re.findall(r"\bembeddings\b", body) == []
