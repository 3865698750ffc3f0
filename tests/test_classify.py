"""hashed_logit_score — the fastText-posture hashed linear classifier.

Hand-computed expectations on tiny frames (the weight table is chosen
so the arithmetic is checkable by eye), degenerate inputs under both
ANSI modes, and the zero-shuffle plan guard. The DuckDB value-lockstep
runs via tools/ansi_sweep.py and the driver gate
(``quality_linear_logit``).
"""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from opentelemetry_collector_contrib_spark.training.classify import (
    hashed_logit_score,
    pseudo_weights_q4,
)


def _bucket(tok: str, n: int = 4) -> int:
    return int(hashlib.md5(tok.encode()).hexdigest()[:15], 16) % n


@pytest.fixture(scope="module")
def frame(spark):
    return spark.createDataFrame(
        [
            (0, "aa bb aa"),
            (1, "cc"),
            (2, ""),          # zero tokens
            (3, None),        # null text
            (4, "aa aa aa aa"),
        ],
        "doc_id int, text string",
    )


def test_hand_computed_logit(frame):
    # 4 buckets, weights picked so each token's contribution is obvious
    w = [1000, -2000, 3000, -4000]
    out = {
        r["doc_id"]: r
        for r in hashed_logit_score(frame, w, text_col="text").collect()
    }
    for did, toks in ((0, ["aa", "bb", "aa"]), (1, ["cc"]), (4, ["aa"] * 4)):
        exp_sum = sum(w[_bucket(t, 4)] for t in toks)
        n = len(toks)
        mag = abs(exp_sum)
        mean = (2 * mag + n) // (2 * n)
        exp_logit = mean if exp_sum >= 0 else -mean
        assert out[did]["sum_w_q4"] == exp_sum, did
        assert out[did]["logit_q4"] == exp_logit, did
        assert out[did]["keep"] == (exp_logit >= 0), did
        assert out[did]["n_tokens"] == n


def test_zero_token_docs_never_kept(frame):
    out = {r["doc_id"]: r for r in hashed_logit_score(frame, [5000] * 4).collect()}
    for did in (2, 3):
        r = out[did]
        assert r["n_tokens"] == 0
        assert r["sum_w_q4"] is None
        assert r["logit_q4"] is None
        assert r["keep"] is False
    # every non-empty doc under an all-positive table is kept
    assert out[0]["keep"] and out[1]["keep"] and out[4]["keep"]


def test_bias_and_threshold(frame):
    w = [0, 0, 0, 0]
    kept = (
        hashed_logit_score(frame, w, bias_q4=7, threshold_q4=8)
        .filter("keep")
        .count()
    )
    assert kept == 0  # logit 7 < threshold 8 everywhere
    kept = (
        hashed_logit_score(frame, w, bias_q4=8, threshold_q4=8)
        .filter("keep")
        .count()
    )
    assert kept == 3  # the three docs with tokens


def test_rounding_half_away_from_zero(spark):
    # one token in bucket b with weight +3, n=2 -> mean 1.5 -> 2;
    # weight -3 -> mean -1.5 -> -2 (half away from zero, both signs)
    df = spark.createDataFrame([(0, "aa aa")], "doc_id int, text string")
    b = _bucket("aa", 4)
    for sign in (1, -1):
        w = [0, 0, 0, 0]
        w[b] = sign * 3  # per-token, sum = sign*6 over n=2 -> mean 3
        r = hashed_logit_score(df, w).collect()[0]
        assert r["logit_q4"] == sign * 3
        w[b] = sign * 1  # sum = sign*2, n=2 -> mean 1
        r = hashed_logit_score(df, w).collect()[0]
        assert r["logit_q4"] == sign * 1
    # force a true .5: sum = 3 over n = 2 needs an odd total — use one
    # 'aa' (w=3) and one token in a different bucket with w=0
    other = next(t for t in ("bb", "cc", "dd", "ee") if _bucket(t, 4) != b)
    df2 = spark.createDataFrame([(0, f"aa {other}")], "doc_id int, text string")
    w = [0, 0, 0, 0]
    w[b] = 3
    r = hashed_logit_score(df2, w).collect()[0]
    assert r["sum_w_q4"] == 3 and r["logit_q4"] == 2  # 1.5 -> 2
    w[b] = -3
    r = hashed_logit_score(df2, w).collect()[0]
    assert r["sum_w_q4"] == -3 and r["logit_q4"] == -2  # -1.5 -> -2


def test_ansi_on_degenerate_inputs(frame):
    # empty + null text must survive the driver's ANSI-on session:
    # materialize values, not count() (the round-3 expo lesson)
    spark = frame.sparkSession
    old = spark.conf.get("spark.sql.ansi.enabled")
    spark.conf.set("spark.sql.ansi.enabled", "true")
    try:
        rows = hashed_logit_score(frame, pseudo_weights_q4(16)).collect()
        assert len(rows) == 5
    finally:
        spark.conf.set("spark.sql.ansi.enabled", old)


def test_zero_shuffle_plan(frame):
    plan = hashed_logit_score(
        frame, pseudo_weights_q4()
    )._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan


def test_pseudo_weights_deterministic():
    w = pseudo_weights_q4()
    assert len(w) == 256
    assert all(-10000 <= x <= 10000 for x in w)
    assert w == pseudo_weights_q4()
    assert len(set(w)) > 200  # spread, not constant


def test_stream_batch_parity(spark, tmp_path):
    # the scorer is a pure projection, so it must run UNCHANGED on a
    # stream (the model-gate-at-ingest deployment) and agree with batch
    docs = spark.createDataFrame(
        [(i, f"tok{i % 7} tok{i % 3} filler") for i in range(40)],
        "doc_id int, text string",
    )
    d = str(tmp_path / "docs_in")
    docs.write.mode("overwrite").parquet(d)
    w = pseudo_weights_q4(32)
    stream = spark.readStream.schema("doc_id int, text string").parquet(d)
    q = (
        hashed_logit_score(stream, w)
        .writeStream.format("memory")
        .queryName("hls_mem")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ck_hls"))
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["doc_id"], r["logit_q4"], r["keep"])
        for r in spark.sql("SELECT * FROM hls_mem").collect()
    }
    want = {
        (r["doc_id"], r["logit_q4"], r["keep"])
        for r in hashed_logit_score(spark.read.parquet(d), w).collect()
    }
    assert got == want and len(got) == 40
