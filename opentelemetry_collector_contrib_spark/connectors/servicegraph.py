"""servicegraph-shaped connector: request/response pair matching -> edges.

Reference: connector/servicegraphconnector/config.go:11-56 — pairs
client and server spans of the same trace through an in-memory store
(TTL, max items) and emits per-edge request counts + latency metrics.

Batch restatement: pairing is a window ``lead()`` within the
correlation group (trace ≅ conversation) ordered by event order — a
client row pairs with the IMMEDIATELY FOLLOWING row when that row
matches the server predicate. One shuffle (partitionBy correlation
key); the store's TTL/max-items caps are replaced by exact grouping
(batch has no unbounded state). The streaming twin would be a
stream-stream self-join with watermarks (SURVEY.md 2.6).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


@dataclass
class ServiceGraphConnector:
    client_condition: str            # SQL predicate marking request rows
    server_condition: str            # predicate for the paired response row
    correlation_key: str = "conv_id"
    order_col: str = "turn_idx"
    ts_col: str = "ts"
    client_dim: str = "role"         # edge source attribute
    server_dim: str = "tool"         # edge target attribute
    # reference config.go Histogram buckets (seconds): when set, the
    # output is per-(edge, le) bucketed latency counts — the
    # traces_service_graph_request_duration histogram — instead of the
    # scalar count+sum edge summary
    latency_buckets_s: list[float] | None = None

    def __call__(self, df: DataFrame) -> DataFrame:
        w = Window.partitionBy(self.correlation_key).orderBy(self.order_col)
        nxt = df.select(
            F.col(self.correlation_key),
            F.col(self.order_col),
            F.col(self.ts_col),
            F.col(self.client_dim),
            F.col(self.server_dim),
            F.expr(self.client_condition).alias("__is_client"),
            F.lead(F.expr(self.server_condition)).over(w).alias("__next_is_server"),
            F.lead(F.col(self.server_dim)).over(w).alias("__server"),
            F.lead(F.col(self.ts_col)).over(w).alias("__server_ts"),
        )
        edges = nxt.filter(
            F.coalesce(F.col("__is_client"), F.lit(False))
            & F.coalesce(F.col("__next_is_server"), F.lit(False))
        )
        # Sum EXACT integer microseconds and divide once post-agg: float
        # addition is order-sensitive across partitions, so summing
        # per-row double seconds drifts in the last bits vs any oracle
        # (the round-1 hash_match failure). BIGINT sums are associative,
        # so the result is bit-stable at any parallelism.
        latency_us = F.unix_micros(
            F.col("__server_ts").cast("timestamp")
        ) - F.unix_micros(F.col(self.ts_col).cast("timestamp"))
        if self.latency_buckets_s is not None:
            # explicit-bounds bucket on INTEGER microseconds: the
            # boundary comparison is exact, so bucket assignment is
            # bit-stable across engines (same posture as the sum fix)
            le = None
            for b in sorted(self.latency_buckets_s):
                c = latency_us <= int(b * 1_000_000)
                lbl = F.lit(f"{b:g}")
                le = F.when(c, lbl) if le is None else le.when(c, lbl)
            le = le.otherwise(F.lit("+Inf"))
            return edges.groupBy(
                F.col(self.client_dim).alias("client"),
                F.col("__server").alias("server"),
                le.alias("le"),
            ).agg(F.count(F.lit(1)).alias("request_count"))
        return edges.groupBy(
            F.col(self.client_dim).alias("client"),
            F.col("__server").alias("server"),
        ).agg(
            F.count(F.lit(1)).alias("request_count"),
            (F.sum(latency_us) / F.lit(1000000.0)).alias("latency_sum_s"),
        )
