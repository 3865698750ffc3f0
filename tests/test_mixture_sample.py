"""Token-budget mixture sampling (training-data mixing tables).

Deterministic-rate semantics on hand-built corpora, the min(1, .) cap,
unknown-source drop, a no-window plan guard, and sf0.001 oracle parity
for the registered query (`mixture_sample`).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from opentelemetry_collector_contrib_spark.training.sampling import mixture_sample


def _corpus(spark):
    rows = [
        (i, "web" if i < 8 else ("books" if i < 12 else "junk"),
         "w" + " w" * (i % 5 + 4))  # 5..9 tokens each
        for i in range(16)
    ]
    return spark.createDataFrame(rows, "doc_id long, source string, text string")


def test_budget_cap_keeps_whole_small_source(spark):
    # budget far above the corpus: every weighted doc survives (p_s
    # capped at 1), the unweighted 'junk' source is dropped entirely
    out = mixture_sample(
        _corpus(spark), {"web": 0.5, "books": 0.5}, 1_000_000
    ).collect()
    assert {r["source"] for r in out} == {"web", "books"}
    assert len(out) == 12
    # n_tokens is the whitespace token count of each kept doc
    assert {r["doc_id"]: r["n_tokens"] for r in out}[0] == 5


def test_zero_budget_drops_everything(spark):
    assert mixture_sample(_corpus(spark), {"web": 1.0}, 0).count() == 0


def test_rate_tracks_weight_and_is_deterministic(spark):
    docs = spark.createDataFrame(
        [(i, "web", "a b c d") for i in range(400)],
        "doc_id long, source string, text string",
    )
    # 400 docs x 4 tokens = 1600; budget 400 -> p = 0.25
    out1 = mixture_sample(docs, {"web": 1.0}, 400)
    out2 = mixture_sample(docs, {"web": 1.0}, 400)
    n = out1.count()
    assert 60 <= n <= 140  # ~100 expected, binomial noise
    assert sorted(r["doc_id"] for r in out1.collect()) == sorted(
        r["doc_id"] for r in out2.collect()
    )


def test_plan_no_window_and_broadcast_rates(spark):
    plan = (
        mixture_sample(_corpus(spark), {"web": 1.0}, 100)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Window" not in plan  # rate-based, never a per-source cumsum
    assert "BroadcastHashJoin" in plan  # rates come back broadcast


def test_query_matches_oracle_sf0001(spark, duck, sf_dir):
    import __spark_entry__ as e
    from tests.conftest import assert_frames_equal

    spk = e.queries()["mixture_sample"](spark, sf_dir)
    orc = duck.sql(e.oracle_sql()["mixture_sample"])
    assert_frames_equal(spk, orc)
