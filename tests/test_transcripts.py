"""Transcript derivation must be bit-identical between Spark and DuckDB —
this is what makes every downstream oracle valid."""

from __future__ import annotations

from opentelemetry_collector_contrib_spark.data import (
    TRANSCRIPTS_ORACLE_CTE,
    derive_transcripts,
    synth_transcripts,
)


def test_derive_matches_duckdb(spark, duck, sf_dir):
    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    spk = derive_transcripts(events)
    dck = duck.sql(f"WITH {TRANSCRIPTS_ORACLE_CTE} SELECT * FROM transcripts")
    from tests.conftest import assert_frames_equal

    assert_frames_equal(spk, dck)


def test_synth_deterministic_across_parallelism(spark):
    a = synth_transcripts(spark, n_conv=50, max_turns=6, parallelism=2)
    b = synth_transcripts(spark, n_conv=50, max_turns=6, parallelism=16)
    ra = sorted(map(tuple, a.collect()))
    rb = sorted(map(tuple, b.collect()))
    assert ra == rb
    assert len(ra) == 1 * 600 + 49 * 6  # 1 hot conv x 600 turns + 49 x 6


def test_synth_schema_and_skew(spark):
    df = synth_transcripts(spark, n_conv=100, max_turns=4)
    assert [f.name for f in df.schema.fields] == [
        "conv_id", "turn_idx", "role", "text", "tool", "ts",
    ]
    counts = {r["conv_id"]: r["cnt"] for r in df.groupBy("conv_id").count().withColumnRenamed("count", "cnt").collect()}
    assert max(counts.values()) >= 100 * min(counts.values())  # hot conv skew present
