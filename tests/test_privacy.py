"""PII scrubbing: masking, counts, null/ANSI behavior, plan shape."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from opentelemetry_collector_contrib_spark.training import pii_scrub


@pytest.fixture()
def frame(spark):
    return spark.createDataFrame(
        [
            (0, "mail a.b+c@ex-1.org now"),
            (1, "host 10.0.255.7 and 1.2.3.4567 mixed"),
            (2, "clean text"),
            (3, None),
            (4, "two bob@x.io carol@y.co and 8.8.8.8"),
        ],
        "doc_id long, text string",
    )


def test_masks_and_counts(spark, frame):
    out = {r.doc_id: r for r in pii_scrub(frame).collect()}
    assert out[0].scrubbed == "mail <EMAIL> now"
    assert (out[0].n_email, out[0].n_ipv4) == (1, 0)
    # 1.2.3.4567: the trailing digit breaks the \b — NOT an IPv4
    assert out[1].scrubbed == "host <IPV4> and 1.2.3.4567 mixed"
    assert (out[1].n_email, out[1].n_ipv4) == (0, 1)
    # clean text is untouched (idempotent stage)
    assert out[2].scrubbed == "clean text" and out[2].n_email == 0
    assert out[4].scrubbed == "two <EMAIL> <EMAIL> and <IPV4>"
    assert (out[4].n_email, out[4].n_ipv4) == (2, 1)


def test_null_text_zero_counts_both_ansi_modes(spark, frame):
    # size(NULL) is -1 ANSI-off and NULL ANSI-on; the scrubber must
    # report 0 matches for null text under BOTH session modes
    for ansi in ("false", "true"):
        old = spark.conf.get("spark.sql.ansi.enabled")
        spark.conf.set("spark.sql.ansi.enabled", ansi)
        try:
            r = pii_scrub(frame).filter(F.col("doc_id") == 3).collect()[0]
            assert (r.n_email, r.n_ipv4) == (0, 0)
            assert r.scrubbed is None
        finally:
            spark.conf.set("spark.sql.ansi.enabled", old)


def test_plan_is_a_pure_projection(spark, frame):
    plan = (
        pii_scrub(frame)._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan  # zero shuffles: scan-speed stage
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
