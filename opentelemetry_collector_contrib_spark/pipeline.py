"""The canonical parse -> enrich -> route -> aggregate pipeline
(SURVEY.md 7.2 minimum end-to-end slice, and the north-star DAG).

    read transcripts
    -> parse: regex named groups over ``text`` (level/evt/code/dur_ms/k)
    -> enrich: broadcast join tool_catalog (+ role_groups)
    -> route: [level ERROR/FATAL -> sink_errors, tool_category exec ->
       sink_exec] with default sink, match_once both modes
    -> aggregate: per-sink counts grouped by role (+ severity metrics)

Everything is one fused projection until the aggregate shuffle; the
route fan-out writes from a single tagged frame.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .envelope import try_element_at

from .connectors import CountConnector, MetricDef, Route, RoutingConnector
from .data import role_groups_df, tool_catalog_df
from .metrics import MetricsCollector
from .operators import RegexParser, SeverityParser, TimeParser, chain
from .processors import LookupEnrich

TEXT_PATTERN = (
    r"^at=(?P<at>\S+) (?P<level>[A-Z]+) \[(?P<tool_name>\w+)\] "
    r"evt=(?P<evt>\w+) code=(?P<code>\d+) dur_ms=(?P<dur_ms>\d+) k=(?P<k>\d+)$"
)

ROUTES = [
    Route("level = 'ERROR' OR level = 'FATAL'", "sink_errors"),
    Route("tool_category = 'exec'", "sink_exec"),
]

COUNTS = [
    MetricDef("log.record.count", attributes=[("route", None), ("role", None)]),
    MetricDef(
        "log.error.count",
        conditions=["severity_number >= 17"],
        attributes=[("route", None)],
    ),
]


@dataclass
class TranscriptPipeline:
    match_once: bool = True
    salt_hot_convs: bool = False  # salt conv_id for skewed recombine/agg stages
    salt_buckets: int = 16
    collector: MetricsCollector | None = None

    def parse(self, df: DataFrame) -> DataFrame:
        ops = [
            RegexParser(TEXT_PATTERN, parse_from="text", on_error="send"),
            TimeParser(parse_from="at", to_field="event_ts", on_error="send"),
            SeverityParser(parse_from="level", on_error="send"),
        ]
        return chain(df, ops)

    def enrich(self, df: DataFrame) -> DataFrame:
        spark = df.sparkSession
        df = LookupEnrich(tool_catalog_df(spark), keys=["tool"])(df)
        df = LookupEnrich(role_groups_df(spark), keys=["role"])(df)
        return df

    def route(self, df: DataFrame) -> DataFrame:
        rc = RoutingConnector(
            ROUTES, default_sinks=["sink_default"], match_once=self.match_once
        )
        return rc(df)

    def aggregate(self, routed: DataFrame) -> DataFrame:
        return CountConnector(COUNTS)(routed)

    def __call__(self, df: DataFrame) -> tuple[DataFrame, DataFrame]:
        """Returns (routed_rows, per_sink_counts)."""
        c = self.collector
        if c:
            df = c.observe(df, "receiver")
        out = self.route(self.enrich(self.parse(df)))
        if self.salt_hot_convs:
            # skew handling for downstream keyed stages (north rule):
            # spread a hot conv_id over N sub-keys; group-bys that need
            # exact conv_id granularity aggregate the salt away
            out = out.withColumn(
                "conv_salt",
                F.concat(
                    F.col("conv_id"),
                    F.lit("#"),
                    F.pmod(F.xxhash64("turn_idx"), F.lit(self.salt_buckets)).cast(
                        "string"
                    ),
                ),
            )
        if c:
            out = c.observe(
                out,
                "router",
                rows=F.count(F.lit(1)),
                # coalesce: sum over an EMPTY frame (filtered batch,
                # empty micro-batch) is NULL, and a null counter
                # silently vanishes from record_batch folds downstream
                errors=F.coalesce(
                    F.sum((F.col("route") == "sink_errors").cast("long")),
                    F.lit(0).cast("long"),
                ),
            )
        counts = self.aggregate(out)
        return out, counts


def run_flagship(
    spark: SparkSession, sf_dir: str = "/root/testdata/sf0.001"
) -> DataFrame:
    """entry() implementation: full DAG over the derived transcripts,
    returning the per-sink aggregate counts frame."""
    from .data import derive_transcripts

    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    transcripts = derive_transcripts(events)
    routed, counts = TranscriptPipeline()(transcripts)
    return counts.select(
        "metric_name",
        try_element_at("attrs", "route").alias("route"),
        try_element_at("attrs", "role").alias("role"),
        "count",
    ).orderBy("metric_name", "route", "role")
