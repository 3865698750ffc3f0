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


def test_null_text_default_session_semantics(degen):
    """The review-pass bugs: under the factory DEFAULT session
    (ansi OFF) size(null array) is -1, which silently corrupted
    corpus_health and mixture_temperature token masses. Null-text docs
    must contribute NULL (sum-skipped) counts in BOTH modes."""
    spark = degen.sparkSession
    assert spark.conf.get("spark.sql.ansi.enabled") == "false"
    ch = {
        (r["source"], r["lang"], r["lvl"]): r
        for r in corpus_health(degen, short_tokens=3).collect()
    }
    total = ch[(None, None, 3)]
    # doc2 has 8 tokens, doc3 has 0, doc1 (null) contributes nothing
    assert total["n_tokens"] == 8
    assert total["n_docs"] == 3
    assert total["short_frac_q4"] == 3333  # only the empty doc is short
    mt = {r["source"]: r for r in mixture_temperature(degen).collect()}
    assert mt["web"]["n_tokens"] == 8      # not 7 (=-1 contamination)
    assert mt[None]["n_tokens"] is None    # all-null source: no NaN
    assert mt["web"]["p_raw"] == 1.0


def test_incremental_dedup_null_text_suppressed(degen):
    """Null text is one dedup class across batches: a null-text doc in
    the corpus suppresses null-text batch rows (null-safe anti-join +
    forced candidate path), and intra-batch null dups collapse."""
    spark = degen.sparkSession
    batch = spark.createDataFrame(
        [(10, None, "en"), (11, None, "de"), (12, "new doc", "en")],
        "doc_id long, text string, lang string",
    )
    seen_with_null = spark.createDataFrame(
        [(1, None, "en")], "doc_id long, text string, lang string"
    )
    kept = sorted(
        r["doc_id"]
        for r in incremental_dedup(batch, seen_with_null).collect()
    )
    assert kept == [12]  # both null-text rows suppressed by the corpus
    no_null_seen = spark.createDataFrame(
        [(1, "other", "en")], "doc_id long, text string, lang string"
    )
    kept2 = sorted(
        r["doc_id"]
        for r in incremental_dedup(batch, no_null_seen).collect()
    )
    assert kept2 == [10, 12]  # intra-batch null dup collapses to 10
