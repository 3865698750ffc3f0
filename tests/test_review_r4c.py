"""Regression tests for the sixth review pass (compiler / data /
metrics / envelope / pipeline findings)."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from opentelemetry_collector_contrib_spark.data import (
    TRANSCRIPTS_ORACLE_CTE,
    derive_transcripts,
    role_groups_df,
    synth_transcripts,
    tool_catalog_df,
)
from opentelemetry_collector_contrib_spark.envelope import field_get
from opentelemetry_collector_contrib_spark.metrics import MetricsCollector
from opentelemetry_collector_contrib_spark.plans.compiler import (
    compile_pipeline,
    config_from_dict,
)


def test_synth_conv_id_no_truncation_past_1m(spark):
    """lpad(…, 6) TRUNCATED 7-digit conv_n to its 6-char prefix, merging
    distinct conversations above 999,999 (the bench runs ~2.4M). Every
    conv_n must map to a unique conv_id."""
    # max_turns=1, minimal hot block -> total rows ~= n_conv
    n_conv = 1_000_050
    t = synth_transcripts(
        spark, n_conv=n_conv, max_turns=1, hot_conv_frac=1e-9, hot_multiplier=2
    )
    assert t.select("conv_id").distinct().count() == n_conv
    # 7-digit ids keep all 7 digits
    longest = t.agg(F.max(F.length("conv_id"))).collect()[0][0]
    assert longest == len("conv-1000049")


def test_synth_conv_id_unchanged_below_1m(spark):
    """The fix is output-identical for the sub-1M range every fixture uses."""
    t = synth_transcripts(spark, n_conv=12, max_turns=2)
    ids = sorted(r.conv_id for r in t.select("conv_id").distinct().collect())
    assert ids[0] == "conv-000000" and ids[-1] == "conv-000011"


def test_derive_turn_idx_null_ts_matches_oracle(spark, tmp_path):
    """Spark window ASC = NULLS FIRST; DuckDB default is NULLS LAST.
    The oracle CTE pins NULLS FIRST so a null ts yields the same
    turn_idx on both engines."""
    duckdb = pytest.importorskip("duckdb")
    rows = [
        (1, 100, "click", None, 5.0, "{}"),
        (1, 101, "view", "2024-01-01 00:00:01", 6.0, "{}"),
        (1, 102, "error", "2024-01-01 00:00:00", 7.0, "{}"),
    ]
    events = spark.createDataFrame(
        rows,
        "user_id long, event_id long, event_type string, "
        "ts string, value double, props string",
    ).withColumn("ts", F.col("ts").cast("timestamp_ntz"))
    got = {
        r.conv_id + ":" + str(r.ts): r.turn_idx
        for r in derive_transcripts(events).collect()
    }
    # null ts sorts FIRST in Spark
    assert got["conv-1:None"] == 0

    pq = str(tmp_path / "events.parquet")
    events.write.parquet(pq)
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{pq}/*.parquet')"
    )
    oracle = con.execute(
        f"WITH {TRANSCRIPTS_ORACLE_CTE.strip()} "
        "SELECT conv_id, ts, turn_idx FROM transcripts"
    ).fetchall()
    for conv_id, ts, turn_idx in oracle:
        assert got[f"{conv_id}:{ts}"] == turn_idx


def test_stanza_config_id_output_if_keys(spark):
    """Real stanza operator lists carry id/output/if on every operator
    (pkg/stanza/operator/config.go). id is a label, a linear output
    chain is honored, and `if` maps to if_expr."""
    doc = {
        "operators": [
            {
                "type": "add",
                "id": "tag",
                "output": "parse",
                "field": "attributes.src",
                "value": "stanza",
                "if": "body LIKE 'at=%'",
            },
            {
                "type": "regex_parser",
                "id": "parse",
                "pattern": r"^at=(?P<at>\S+)",
                "parse_from": "body",
                "on_error": "send",
            },
        ]
    }
    pipe = compile_pipeline(config_from_dict(doc))
    df = spark.createDataFrame(
        [("at=2024-01-01T00:00:00 INFO", None), ("garbled", None)],
        "body string, attributes map<string,string>",
    )
    out = {r.body: r for r in pipe(df).collect()}
    assert out["at=2024-01-01T00:00:00 INFO"].attributes["src"] == "stanza"
    attrs = out["garbled"].attributes
    assert attrs is None or "src" not in attrs  # `if` guard held


def test_stanza_config_nonlinear_output_rejected():
    doc = {
        "operators": [
            {"type": "noop", "id": "a", "output": "c"},
            {"type": "noop", "id": "b"},
        ]
    }
    with pytest.raises(ValueError, match="non-linear"):
        config_from_dict(doc)


def test_metrics_repeated_stage_accumulates(spark):
    """A repeated stage name (warm-up + timed run) SUMS counters instead
    of silently dropping the first observation (obsreport counters
    accumulate across operations)."""
    c = MetricsCollector("r1")
    d1 = c.observe(spark.range(3).toDF("id"), "receiver")
    d1.count()
    d2 = c.observe(spark.range(5).toDF("id"), "receiver")
    d2.count()
    snap = {
        (r.stage, r.metric): r.value for r in c.snapshot(spark).collect()
    }
    assert snap[("receiver", "rows")] == 8.0


def test_metrics_non_numeric_observation_skipped(spark):
    """observe() accepts arbitrary Columns; snapshot() must not crash on
    a non-numeric aggregate — it reports the numeric counters and skips
    the rest."""
    c = MetricsCollector("r2")
    df = spark.createDataFrame([(1, "a"), (2, "b")], "n int, s string")
    out = c.observe(df, "stage", rows=F.count(F.lit(1)), latest=F.max("s"))
    out.count()
    snap = {
        (r.stage, r.metric): r.value for r in c.snapshot(spark).collect()
    }
    assert snap[("stage", "rows")] == 2.0
    assert ("stage", "latest") not in snap


def test_field_get_nested_map_path_clear_error():
    with pytest.raises(ValueError, match="nested map path"):
        field_get("attributes.a.b")


def test_dim_frames_cached_per_session(spark):
    assert tool_catalog_df(spark) is tool_catalog_df(spark)
    assert role_groups_df(spark) is role_groups_df(spark)
    # cached frame still has the right content
    assert tool_catalog_df(spark).count() == 5


def test_passage_dedup_stats_planted_duplicates(spark):
    """Passage-window exact-substring dedup: a 10-word passage shared
    by two documents marks it duplicate in BOTH; unique passages and
    the trailing short passage stay clean; an empty doc keeps a row."""
    from opentelemetry_collector_contrib_spark.training import (
        passage_dedup_stats,
    )

    shared = " ".join(f"w{i}" for i in range(10))  # one full passage
    uniq_a = " ".join(f"a{i}" for i in range(10))
    uniq_b = " ".join(f"b{i}" for i in range(10))
    rows = [
        (1, f"{shared} {uniq_a} tail words"),   # 3 passages, 1 dup
        (2, f"{shared} {uniq_b}"),              # 2 passages, 1 dup
        (3, "only four words here"),            # 1 passage, clean
        (4, ""),                                # 0 passages
    ]
    got = {
        r.doc_id: r
        for r in passage_dedup_stats(
            spark.createDataFrame(rows, "doc_id int, text string"),
            words_per_passage=10,
        ).collect()
    }
    assert (got[1].n_passages, got[1].dup_passages) == (3, 1)
    assert got[1].dup_passage_frac == 0.3333
    assert (got[2].n_passages, got[2].dup_passages) == (2, 1)
    assert (got[3].n_passages, got[3].dup_passages) == (1, 0)
    assert (got[4].n_passages, got[4].dup_passages) == (0, 0)
    assert got[4].dup_passage_frac is None


def test_passage_dedup_plan_partial_aggregation(spark):
    """The passage-frequency table must reduce via partial/final
    HashAggregate (a boilerplate passage in millions of docs collapses
    map-side) and never through a window or cartesian product."""
    from opentelemetry_collector_contrib_spark.training import (
        passage_dedup_stats,
    )

    df = spark.createDataFrame(
        [(i, f"t{i % 4} " * 12) for i in range(16)], "doc_id int, text string"
    )
    plan = (
        passage_dedup_stats(df)._jdf.queryExecution().executedPlan().toString()
    )
    assert "HashAggregate" in plan
    assert "Window" not in plan
    assert "CartesianProduct" not in plan
