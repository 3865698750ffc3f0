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


@dataclass
class FileLogSource:
    paths: list[str] | str
    encoding: str = "utf-8"
    include_file_name: bool = True
    include_file_path: bool = False
    line_start_pattern: str | None = None  # multiline: recombine lines

    def __call__(self, spark: SparkSession) -> DataFrame:
        paths = self.paths if isinstance(self.paths, list) else [self.paths]
        df = spark.read.text(paths)
        if self.encoding.lower() not in ("utf-8", "utf8"):
            df = spark.read.format("text").option("encoding", self.encoding).load(paths)
        df = df.withColumnRenamed("value", "body")
        df = df.withColumn("observed_ts", F.current_timestamp())
        if self.include_file_name or self.include_file_path:
            fp = F.input_file_name()
            if self.include_file_path:
                df = df.withColumn("log_file_path", fp)
            if self.include_file_name:
                df = df.withColumn("log_file_name", F.element_at(F.split(fp, "/"), -1))
        if self.line_start_pattern:
            # multiline: group physical lines into logical entries.
            # order within a file = read order; capture it per partition
            # (monotonically_increasing_id preserves file order for text)
            key = "log_file_path" if self.include_file_path else "log_file_name"
            if key not in df.columns:
                df = df.withColumn(key, F.input_file_name())
            df = df.withColumn("__line__", F.monotonically_increasing_id())
            w = Window.partitionBy(key).orderBy("__line__")
            grp = F.sum(
                F.col("body").rlike(self.line_start_pattern).cast("int")
            ).over(w)
            df = (
                df.withColumn("__grp__", grp)
                .groupBy(key, "__grp__")
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
        return df
