"""Bigram-LM cross-entropy scoring (CCNet-style perplexity filter).

Hand-computed tiny-corpus vectors, short-doc/left-join behavior, and
sf0.001 oracle parity for the registered query (`text_lm_score`); the
ANSI-on sweep re-checks parity at sf0.01 under driver confs.
"""

from __future__ import annotations

import math

from opentelemetry_collector_contrib_spark.training import lm_score


def _scores(spark, docs):
    df = spark.createDataFrame(docs, "doc_id long, text string")
    return {r["doc_id"]: r.asDict() for r in lm_score(df).collect()}


def test_hand_computed_bigram_model(spark):
    # corpus: c2(a,b)=3, c2(b,a)=1; c1(a)=3, c1(b)=1; V=2
    # P(b|a) = 4/5 -> nlp_q4 = floor(-ln(.8)*1e4+.5) = 2231
    # P(a|b) = 2/3 -> nlp_q4 = 4055
    out = _scores(spark, [(1, "a b a b"), (2, "a b")])
    assert math.floor(-math.log(0.8) * 10000 + 0.5) == 2231
    assert math.floor(-math.log(2 / 3) * 10000 + 0.5) == 4055
    # doc1: (2*2231 + 4055)/3 = 8517/3 = 2839 exactly
    assert out[1] == {"doc_id": 1, "n_bigrams": 3, "xent_q4": 2839.0}
    assert out[2] == {"doc_id": 2, "n_bigrams": 1, "xent_q4": 2231.0}


def test_short_docs_get_null_score(spark):
    out = _scores(spark, [(1, "solo"), (2, ""), (3, "x y")])
    assert out[1] == {"doc_id": 1, "n_bigrams": 0, "xent_q4": None}
    assert out[2] == {"doc_id": 2, "n_bigrams": 0, "xent_q4": None}
    assert out[3]["n_bigrams"] == 1


def test_rare_bigrams_score_higher(spark):
    # a doc of one repeated bigram vs a doc of singleton bigrams drawn
    # from the same vocabulary: the repeated one must be lower-entropy
    out = _scores(spark, [(1, "x y x y x y x y"), (2, "x q y p x z")])
    assert out[1]["xent_q4"] < out[2]["xent_q4"]


def test_query_matches_oracle_sf0001(spark, duck, sf_dir):
    import __spark_entry__ as e
    from tests.conftest import assert_frames_equal

    spk = e.queries()["text_lm_score"](spark, sf_dir)
    orc = duck.sql(e.oracle_sql()["text_lm_score"])
    assert_frames_equal(spk, orc, float_cols=("xent_q4",))
