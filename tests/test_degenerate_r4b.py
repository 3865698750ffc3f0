"""Ninth review pass: ANSI-on degenerate-input audit of the late-r4
training ops (the round-3 crash class — null text, empty strings, null
embeddings, empty frames — exercised with VALUE MATERIALIZATION under
``spark.sql.ansi.enabled=true``, the driver's session default; a bare
count() prunes the failing projection and proves nothing).
"""

from __future__ import annotations

import contextlib

import pytest
from pyspark.sql import functions as F  # noqa: F401

from opentelemetry_collector_contrib_spark.training import (
    cluster_size_histogram,
    compression_ratio,
    corpus_health,
    incremental_dedup,
    line_dedup,
    minhash_jaccard_estimate,
    minhash_signatures,
    mixture_temperature,
    semantic_decontaminate,
    token_entropy,
    winnow_fingerprints,
    winnow_match_pairs,
)


@contextlib.contextmanager
def ansi_on(spark):
    prev = spark.conf.get("spark.sql.ansi.enabled")
    spark.conf.set("spark.sql.ansi.enabled", "true")
    try:
        yield
    finally:
        spark.conf.set("spark.sql.ansi.enabled", prev)


@pytest.fixture(scope="module")
def degen(spark):
    return spark.createDataFrame(
        [
            (1, None, None, None),           # all-null row
            (2, "a b c d e f g h", "en", "web"),
            (3, "", "de", "web"),            # empty text
        ],
        "doc_id long, text string, lang string, source string",
    )


def test_text_ops_materialize_ansi_on(degen):
    spark = degen.sparkSession
    with ansi_on(spark):
        # null text drops through explode paths, never crashes
        ld = {r["doc_id"] for r in line_dedup(degen).collect()}
        assert 2 in ld and 1 not in ld
        wf = winnow_fingerprints(degen).collect()
        assert {r["doc_id"] for r in wf} == {2}
        assert winnow_match_pairs(
            winnow_fingerprints(degen)
        ).collect() == []
        te = {r["doc_id"]: r for r in token_entropy(degen).collect()}
        assert set(te) == {2}  # null + zero-token docs dropped
        cr = {r["doc_id"]: r for r in compression_ratio(degen).collect()}
        assert cr[1]["ratio_q4"] is None  # null text -> 0 bytes
        mt = mixture_temperature(degen).collect()
        assert {r["source"] for r in mt} == {None, "web"}
        ch = corpus_health(degen).collect()
        # 3 (source,lang) groups (null source is a real group) +
        # 2 (source) + 1 overall = 6; lvl disambiguates null-as-group
        # from null-as-rollup
        assert len(ch) == 6
        sigs = minhash_signatures(degen, n_hashes=4)
        est = minhash_jaccard_estimate(
            sigs,
            spark.createDataFrame([(1, 2)], "a_id long, b_id long"),
        ).collect()
        assert est[0]["n_valid"] == 0 and est[0]["est_jaccard"] is None


def test_frame_ops_materialize_ansi_on(degen):
    spark = degen.sparkSession
    with ansi_on(spark):
        # empty corpus / empty batch both fine
        empty = degen.filter("doc_id < 0")
        assert {
            r["doc_id"] for r in incremental_dedup(degen, empty).collect()
        } == {1, 2, 3}
        assert incremental_dedup(empty, degen).collect() == []
        vecs = spark.createDataFrame(
            [(1, None), (2, [1.0, 0.0])],
            "vec_id long, embedding array<float>",
        )
        # null embedding scores null cosine -> never flagged, no crash
        out = semantic_decontaminate(
            vecs, vecs.filter("vec_id = 2"), threshold=0.5
        ).collect()
        assert [r["vec_id"] for r in out] == [2]
        assert cluster_size_histogram(
            spark.createDataFrame([], "doc_id long, cluster_id long")
        ).collect() == []
