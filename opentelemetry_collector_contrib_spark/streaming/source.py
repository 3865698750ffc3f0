"""Streaming sources for transcript rows.

- ``file_stream``: the streaming twin of the filelog receiver
  (reference receiver/filelogreceiver/filelog.go:31-62) — watch a
  directory of parquet/json files; Spark's file-source checkpointing
  plays the role of the reference's offset/fingerprint tracking
  (pkg/stanza/fileconsumer/internal/checkpoint/checkpoint.go:20-42).
- ``rate_transcripts``: deterministic load generator on the ``rate``
  source (the testbed's LoadGenerator role,
  testbed/tests/scenarios.go:129-150): maps each rate tick to a
  transcript row with the same arithmetic text recipe as
  ``data.synth_transcripts`` so parse semantics are exercised.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TRANSCRIPT_DDL = (
    "conv_id string, turn_idx int, role string, text string, "
    "tool string, ts timestamp"
)


def file_stream(
    spark: SparkSession,
    path: str,
    fmt: str = "parquet",
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    reader = spark.readStream.format(fmt).schema(TRANSCRIPT_DDL)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.load(path)


def rate_transcripts(
    spark: SparkSession, rows_per_second: int = 10_000, turns_per_conv: int = 10
) -> DataFrame:
    """rate source -> transcript rows (deterministic in `value`)."""
    rate = (
        spark.readStream.format("rate")
        .option("rowsPerSecond", rows_per_second)
        .load()
    )
    conv = (F.col("value") / turns_per_conv).cast("long")
    turn = (F.col("value") % turns_per_conv).cast("int")
    h = F.pmod(conv * 2654435761 + turn * 40503, F.lit(1000000))
    level = (
        F.when(h % 100 < 5, "FATAL")
        .when(h % 100 < 20, "ERROR")
        .when(h % 100 < 35, "WARN")
        .when(h % 100 < 55, "DEBUG")
        .otherwise("INFO")
    )
    tool = (
        F.when(h % 7 == 0, "bash")
        .when(h % 7 == 1, "search")
        .when(h % 7 == 2, "editor")
        .when(h % 7 == 3, "http")
        .otherwise("none")
    )
    role = (
        F.when(turn % 4 == 0, "user")
        .when(turn % 4 == 1, "assistant")
        .when(turn % 4 == 2, "system")
        .otherwise("tool")
    )
    text = F.when(h % 20 == 19, F.lit("garbled turn !!")).otherwise(
        F.concat(
            F.lit("at="),
            F.date_format("timestamp", "yyyy-MM-dd'T'HH:mm:ss"),
            F.lit(" "),
            level,
            F.lit(" ["),
            tool,
            F.lit("] evt=stream code="),
            (h % 7).cast("string"),
            F.lit(" dur_ms="),
            (h % 5000).cast("string"),
            F.lit(" k="),
            (h % 100).cast("string"),
        )
    )
    return rate.select(
        F.concat(F.lit("conv-"), conv.cast("string")).alias("conv_id"),
        turn.alias("turn_idx"),
        role.alias("role"),
        text.alias("text"),
        tool.alias("tool"),
        F.col("timestamp").alias("ts"),
    )
