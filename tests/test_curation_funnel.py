"""End-to-end curation funnel: Gopher gate ∩ LM threshold ∩ mixture
draw composed in ONE Spark plan, verified against the literal SQL
composition of the three stage oracles.
"""

from __future__ import annotations

import __spark_entry__ as e


def test_funnel_is_the_stage_intersection(spark, sf_dir):
    from opentelemetry_collector_contrib_spark.training import lm_score
    from opentelemetry_collector_contrib_spark.training.sampling import (
        mixture_sample,
    )
    from opentelemetry_collector_contrib_spark.training.textstats import (
        gopher_quality_filter,
    )

    docs = e._docs(spark, sf_dir)
    gate = {r[0] for r in gopher_quality_filter(docs, min_words=20)
            .select("doc_id").collect()}
    lm = {r[0] for r in lm_score(docs).filter("xent_q4 <= 34000")
          .select("doc_id").collect()}
    mix = {r[0] for r in mixture_sample(docs, e.MIX_WEIGHTS, e.MIX_BUDGET_TOKENS)
           .select("doc_id").collect()}
    funnel = {r[0] for r in e.queries()["curation_funnel"](spark, sf_dir)
              .select("doc_id").collect()}
    assert funnel == gate & lm & mix
    assert funnel  # non-vacuous at the test SF


def test_query_matches_oracle_sf0001(spark, duck, sf_dir):
    from tests.conftest import assert_frames_equal

    spk = e.queries()["curation_funnel"](spark, sf_dir)
    orc = duck.sql(e.oracle_sql()["curation_funnel"])
    assert_frames_equal(spk, orc, float_cols=("xent_q4",))
