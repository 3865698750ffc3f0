"""otlpjsonfile receiver: OTLP-JSON lines -> envelope rows.

Reference: receiver/otlpjsonfilereceiver — reads files of
ExportLogsServiceRequest JSON (resourceLogs -> scopeLogs -> logRecords)
and emits LogRecords. Spark restatement: ``spark.read.json`` with the
OTLP schema + a double explode, flattening the 3-level nesting into the
columnar envelope (SURVEY.md 1.1b: converter.go grouping in reverse).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

# attributes are OTLP KeyValue lists: [{key, value: {stringValue: ...}}]
_KV = "array<struct<key:string, value:struct<stringValue:string>>>"
OTLP_LOGS_SCHEMA = (
    "resourceLogs array<struct<"
    f"resource:struct<attributes:{_KV}>,"
    "scopeLogs:array<struct<"
    "scope:struct<name:string>,"
    "logRecords:array<struct<timeUnixNano:string,observedTimeUnixNano:string,"
    "severityNumber:int,severityText:string,body:struct<stringValue:string>,"
    f"attributes:{_KV},traceId:string,spanId:string>>"
    ">>"
    ">>"
)


def _kv_to_map(col):
    return F.map_from_entries(
        F.transform(
            col,
            lambda e: F.struct(
                e.getField("key").alias("key"),
                e.getField("value").getField("stringValue").alias("value"),
            ),
        )
    )


@dataclass
class OtlpJsonFileSource:
    paths: list[str] | str

    def __call__(self, spark: SparkSession) -> DataFrame:
        df = spark.read.schema(OTLP_LOGS_SCHEMA).json(self.paths)
        rl = df.select(F.explode("resourceLogs").alias("rl"))
        sl = rl.select(
            F.col("rl.resource.attributes").alias("res_attrs"),
            F.explode("rl.scopeLogs").alias("sl"),
        )
        lr = sl.select(
            "res_attrs",
            F.col("sl.scope.name").alias("scope"),
            F.explode("sl.logRecords").alias("lr"),
        )
        def _ns_to_ts(col: Column) -> Column:
            # exact integer ns -> us: a double divide near 1.7e18 is only
            # good to ~256 ns, shifting ~12% of values by a microsecond
            return F.timestamp_micros(
                (col.cast("decimal(38,0)") / F.lit(1000)).cast("long")
            )

        return lr.select(
            _ns_to_ts(F.col("lr.timeUnixNano")).alias("ts"),
            _ns_to_ts(F.col("lr.observedTimeUnixNano")).alias("observed_ts"),
            F.col("lr.body.stringValue").alias("body"),
            _kv_to_map(F.col("lr.attributes")).alias("attributes"),
            _kv_to_map(F.col("res_attrs")).alias("resource"),
            F.col("lr.severityText").alias("severity_text"),
            F.col("lr.severityNumber").alias("severity_number"),
            F.unhex("lr.traceId").alias("trace_id"),
            F.unhex("lr.spanId").alias("span_id"),
            F.col("scope"),
        )
