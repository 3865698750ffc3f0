"""Iceberg table posture for the transcript sinks.

The north-star deployment reads/writes Iceberg tables (snapshot reads
stand in for file-offset checkpoints, SURVEY.md section 2.10; routed
sinks are per-tenant tables). This module keeps that posture explicit
while degrading cleanly in environments without the
``iceberg-spark-runtime`` jar (this sandbox):

- :func:`iceberg_confs` — the standard Hadoop-catalog session confs
  from the public Iceberg Spark quickstart; pass as ``extra_conf`` to
  :func:`~..session.get_spark`.
- :func:`has_iceberg` — classpath probe for the runtime.
- :class:`TableSink` — ``writeTo(table).append()`` (V2 writer) when the
  runtime is present, else a partitioned-parquet directory laid out
  with the SAME partition spec (``days(ts)``-style partition column +
  any identity partitions), so the physical layout — the thing that
  gives partition pruning at 100 TB — is identical either way. The
  ``replace`` mode maps to Iceberg ``overwritePartitions()`` (dynamic
  partition overwrite), which is what makes lineage-checkpointed
  re-runs idempotent (SURVEY.md section 2.10: task retry + overwrite
  = exactly-once table state).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def iceberg_confs(warehouse: str, catalog: str = "local") -> dict[str, str]:
    """Session confs for a Hadoop-catalog Iceberg warehouse (public
    Iceberg runtime documentation)."""
    return {
        f"spark.sql.catalog.{catalog}":
            "org.apache.iceberg.spark.SparkCatalog",
        f"spark.sql.catalog.{catalog}.type": "hadoop",
        f"spark.sql.catalog.{catalog}.warehouse": warehouse,
        "spark.sql.extensions":
            "org.apache.iceberg.spark.extensions"
            ".IcebergSparkSessionExtensions",
    }


def has_iceberg(spark: SparkSession) -> bool:
    """True when the iceberg-spark-runtime jar is on the classpath."""
    try:
        spark._jvm.java.lang.Class.forName(  # type: ignore[union-attr]
            "org.apache.iceberg.spark.SparkCatalog"
        )
        return True
    except Exception:
        return False


@dataclass
class TableSink:
    """Append/overwrite a DataFrame into an Iceberg table (or its
    parquet-fallback layout).

    ``partition_days_col`` adds a ``<col>_day`` date partition (the
    moral equivalent of Iceberg's ``days(col)`` transform — expressed
    as a real column so the fallback layout prunes identically);
    ``partition_by`` adds identity partitions (e.g. the route/sink
    column)."""

    table: str                      # catalog.db.table OR a fallback path
    partition_days_col: str | None = "ts"
    partition_by: list[str] = field(default_factory=list)
    mode: str = "append"            # append | replace (dynamic overwrite)

    def _prepared(self, df: DataFrame) -> tuple[DataFrame, list[str]]:
        parts = list(self.partition_by)
        if self.partition_days_col and self.partition_days_col in df.columns:
            day_col = f"{self.partition_days_col}_day"
            df = df.withColumn(
                day_col, F.to_date(F.col(self.partition_days_col))
            )
            parts = [day_col, *parts]
        return df, parts

    def __call__(self, df: DataFrame) -> None:
        out, parts = self._prepared(df)
        spark = out.sparkSession
        if has_iceberg(spark):
            writer = out.writeTo(self.table)
            if parts:
                # ONE varargs call: each partitionedBy() REPLACES the
                # previous spec (DataFrameWriterV2.partitioning is a
                # single Option), so a per-column loop keeps only the
                # last column
                writer = writer.partitionedBy(*[F.col(p) for p in parts])
            # partitionedBy only applies at CREATE time; append()/
            # overwritePartitions() require the table to exist and
            # inherit its spec — so create-with-spec when absent
            if not spark.catalog.tableExists(self.table):
                writer.create()
                return
            if self.mode == "replace":
                writer.overwritePartitions()
            else:
                writer.append()
            return
        # parquet fallback: same partition layout, dynamic partition
        # overwrite for the idempotent-replace posture
        writer = out.write.format("parquet")
        if parts:
            writer = writer.partitionBy(*parts)
        if self.mode == "replace":
            writer = writer.mode("overwrite").option(
                "partitionOverwriteMode", "dynamic"
            )
        else:
            writer = writer.mode("append")
        writer.save(self.table)
