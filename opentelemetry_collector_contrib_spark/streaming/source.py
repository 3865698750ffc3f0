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


def socket_stream(
    spark: SparkSession,
    host: str,
    port: int,
    framing: str = "newline",
    stream_id: str | None = None,
) -> DataFrame:
    """Live TCP receiver: the streaming twin of the tcplog/syslog socket
    inputs (pkg/stanza/operator/input/tcp/input.go,
    receiver/syslogreceiver/syslog.go:61-71), feeding the same framing
    operators the batch path uses (sources/socket.py).

    - ``framing="newline"``: non-transparent framing. Spark's socket
      source already yields one row per newline-delimited message, so
      each row IS a frame.
    - ``framing="octet"``: RFC6587 octet counting. Each socket row is a
      newline-flushed blob that may hold several ``<len> <len bytes>``
      frames; the batch ``split_octet_frames`` (Arrow-batched
      mapInPandas) applies to the stream unchanged — stream/batch
      parity is the point, and is pytest-asserted.

    Returns frames in the batch framing schema
    (stream_id, frame_idx, body, valid); pipe into SyslogParser etc.
    """
    from ..sources.socket import split_octet_frames

    raw = (
        spark.readStream.format("socket")
        .option("host", host)
        .option("port", str(port))
        .load()
    )
    sid = stream_id or f"{host}:{port}"
    if framing == "newline":
        return raw.select(
            F.lit(sid).alias("stream_id"),
            F.lit(0).alias("frame_idx"),
            F.col("value").alias("body"),
            F.lit(True).alias("valid"),
        )
    if framing == "octet":
        blobs = raw.select(
            F.lit(sid).alias("stream_id"), F.col("value").alias("data")
        )
        return split_octet_frames(blobs, blob_col="data")
    raise ValueError("framing must be 'newline' or 'octet'")


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
