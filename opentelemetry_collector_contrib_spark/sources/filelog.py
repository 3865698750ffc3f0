"""filelog receiver: file glob -> line rows with file attributes.

Reference: receiver/filelogreceiver/filelog.go:31-62 + fileconsumer
manager (pkg/stanza/fileconsumer/file.go:25-263). The collector tails
files with fingerprints/offsets; under table/batch semantics the scan
is declarative: ``spark.read.text(glob)`` with ``input_file_name()``
supplying the ``log.file.name``/``log.file.path`` attributes
(pkg/stanza/fileconsumer/attrs/attrs.go:14-40).

Multiline recombination (line_start_pattern / line_end_pattern,
pkg/stanza/split/split.go:23-160) maps to the Recombine operator keyed
by file path — expressed here as an optional post-step.

Offset checkpointing (start_at, fingerprints) is subsumed by snapshot
semantics of the SnapshotTable source (sources/table.py) — see
SURVEY.md section 2.10.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..envelope import try_element_at


@dataclass
class FileLogSource:
    paths: list[str] | str
    encoding: str = "utf-8"
    include_file_name: bool = True
    include_file_path: bool = False
    line_start_pattern: str | None = None  # multiline: recombine lines

    def __call__(self, spark: SparkSession) -> DataFrame:
        paths = self.paths if isinstance(self.paths, list) else [self.paths]
        if self.encoding.lower() in ("utf-8", "utf8"):
            df = spark.read.text(paths)
        else:
            # real charset decode (stanza decode.go semantics): the text
            # datasource is UTF-8-only, so non-UTF-8 files read as whole
            # binaries and decode JVM-side (`decode(bytes, charset)`),
            # then explode back to lines. One file = one task, same
            # constraint as the multiline path below.
            raw = (
                spark.read.format("binaryFile")
                .load(paths)
                .select(F.decode(F.col("content"), self.encoding).alias("value"))
            )
            df = raw.select(
                F.explode(
                    F.split(F.regexp_replace("value", "\r?\n$", ""), "\r?\n")
                ).alias("value")
            )
        df = df.withColumnRenamed("value", "body")
        df = df.withColumn("observed_ts", F.current_timestamp())
        if self.include_file_name or self.include_file_path:
            fp = F.input_file_name()
            if self.include_file_path:
                df = df.withColumn("log_file_path", fp)
            if self.include_file_name:
                df = df.withColumn("log_file_name", try_element_at(F.split(fp, "/"), -1))
        if self.line_start_pattern:
            # multiline: group physical lines into logical entries.
            # Read whole files (one row per file) and posexplode the line
            # split: the position IS the true line offset within the file.
            # A plain spark.read.text + monotonically_increasing_id would
            # interleave wrongly once a file spans multiple input splits —
            # mono-ids order by (partition, row) and split order within a
            # file is not the byte order at exactly the multi-split sizes
            # this engine targets. Trade-off: one file = one task (the
            # reference's fileconsumer is likewise a per-file reader,
            # pkg/stanza/fileconsumer/file.go:25-263); parallelism comes
            # from the file count, and a file must fit in executor memory.
            # the window/group key is ALWAYS the full path: two files with
            # the same basename in different directories must not collide
            # into one partition (their posexplode positions would
            # interleave and corrupt grouping); log_file_name is derived
            # as an output column only
            if self.encoding.lower() in ("utf-8", "utf8"):
                whole = spark.read.text(paths, wholetext=True)
                fp = F.input_file_name()
                whole = whole.withColumn("log_file_path", fp)
            else:
                # same charset rule as the single-line branch: wholetext
                # is UTF-8-only, so decode the whole binary (a UTF-8
                # re-read here silently mojibake'd non-ASCII bytes)
                whole = (
                    spark.read.format("binaryFile")
                    .load(paths)
                    .select(
                        F.decode(F.col("content"), self.encoding).alias("value"),
                        F.col("path").alias("log_file_path"),
                    )
                )
            whole = whole.withColumn("observed_ts", F.current_timestamp())
            lines = whole.select(
                "log_file_path",
                "observed_ts",
                F.posexplode(
                    F.split(F.regexp_replace("value", "\r?\n$", ""), "\r?\n")
                ).alias("__line__", "body"),
            )
            w = Window.partitionBy("log_file_path").orderBy("__line__")
            grp = F.sum(
                F.col("body").rlike(self.line_start_pattern).cast("int")
            ).over(w)
            df = (
                lines.withColumn("__grp__", grp)
                .groupBy("log_file_path", "__grp__")
                .agg(
                    F.array_join(
                        F.transform(
                            F.sort_array(
                                F.collect_list(F.struct("__line__", "body"))
                            ),
                            lambda s: s.getField("body"),
                        ),
                        "\n",
                    ).alias("body"),
                    F.min("observed_ts").alias("observed_ts"),
                )
                .drop("__grp__")
            )
            if self.include_file_name:
                df = df.withColumn(
                    "log_file_name",
                    try_element_at(F.split("log_file_path", "/"), -1),
                )
            if not self.include_file_path:
                df = df.drop("log_file_path")
        return df
