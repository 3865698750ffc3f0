"""stdin / named-pipe inputs: captured line streams -> entry rows.

Reference:
- ``pkg/stanza/operator/input/stdin/input.go:43-67``: a
  ``bufio.Scanner`` over stdin emits one entry per line (scanner strips
  the newline; empty lines ARE emitted; no encoding/trim/size config —
  the Config is bare InputConfig).
- ``pkg/stanza/operator/input/namedpipe/input.go:36-131`` +
  ``config_linux.go:22-52``: a FIFO is scanned with the configured
  split function (default newline, flush-at-EOF), each token is trimmed
  (``pkg/stanza/trim/trim.go:26-42`` — default trims both-side
  ``\\r\\n\\t `` whitespace), EMPTY tokens are skipped
  (``input.go:118``), and the scanner buffer caps a single log at
  ``max_log_size`` (a longer token kills the scan with ErrTooLong).

Table restatement (same snapshot posture as every input here — the
transport has no batch meaning, the per-line semantics do): the
captured stream lands as one text blob per capture session;
``spark.read`` ``wholetext``/``binaryFile`` keeps each capture intact
and a ``posexplode(split(...))`` restores exact line order. Everything
is Catalyst Columns — zero Python in the row path. Where the reference
KILLS the scanner (oversized token), a table op can't stop a goroutine,
so the oversized row is emitted with ``valid = false`` and all
remaining rows of that capture are dropped — byte-equivalent to what a
restarted reference scanner would have delivered.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


@dataclass
class StdinSource:
    """One entry per line, newline stripped, empty lines kept
    (stdin input.go:56-65: ``e.Body = scanner.Text()`` with the default
    line splitter and no empty-skip)."""

    def __call__(self, spark: SparkSession, paths: list[str] | str) -> DataFrame:
        raw = spark.read.text(paths, wholetext=True)
        lines = F.split(
            F.regexp_replace(F.col("value"), "\r?\n$", ""), "\r?\n"
        )
        return raw.select(
            F.input_file_name().alias("capture"),
            F.posexplode(lines).alias("line_idx", "body"),
        )


@dataclass
class NamedPipeSource:
    """Newline-split + trim + empty-skip + max_log_size over a decoded
    capture (namedpipe input.go process loop)."""

    encoding: str = "utf-8"
    max_log_size: int = 1024 * 1024  # DefaultMaxLogSize, config_all.go
    preserve_leading: bool = False
    preserve_trailing: bool = False

    def _trim(self, body):
        if self.preserve_leading and self.preserve_trailing:
            return body
        if self.preserve_leading:
            return F.regexp_replace(body, r"[\r\n\t ]+$", "")
        if self.preserve_trailing:
            return F.regexp_replace(body, r"^[\r\n\t ]+", "")
        return F.regexp_replace(body, r"^[\r\n\t ]+|[\r\n\t ]+$", "")

    def __call__(self, spark: SparkSession, paths: list[str] | str) -> DataFrame:
        raw = spark.read.format("binaryFile").load(paths)
        text = F.decode(F.col("content"), self.encoding)
        lines = F.split(F.regexp_replace(text, "\r?\n$", ""), "\r?\n")
        exploded = raw.select(
            F.col("path").alias("capture"),
            F.posexplode(lines).alias("line_idx", "raw_body"),
        )
        oversize = F.length(F.col("raw_body")) > self.max_log_size
        w = (
            Window.partitionBy("capture")
            .orderBy("line_idx")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        # rows after the first oversized token never reach the pipeline
        # (the reference scanner dies there); the oversized row itself
        # is kept with valid=false so drops are countable
        dead_before = F.count(F.when(oversize, 1)).over(w) - F.when(
            oversize, F.lit(1)
        ).otherwise(F.lit(0))
        out = (
            exploded.withColumn("__dead__", dead_before > 0)
            .filter(~F.col("__dead__"))
            .select(
                "capture",
                "line_idx",
                self._trim(F.col("raw_body")).alias("body"),
                (~oversize).alias("valid"),
            )
        )
        # empty tokens skipped AFTER trim (input.go:118 checks the
        # token the split func already trimmed)
        return out.filter((F.col("body") != "") | ~F.col("valid"))
