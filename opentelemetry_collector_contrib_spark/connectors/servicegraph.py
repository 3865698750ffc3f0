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

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..envelope import try_element_at

# store/edge.go:15-18
CONN_UNKNOWN = ""
CONN_MESSAGING = "messaging_system"
CONN_DATABASE = "database"
CONN_VIRTUAL = "virtual_node"

# connector.go:43-48 defaults
DEFAULT_PEER_ATTRIBUTES = ["peer.service", "db.name", "db.system"]
DEFAULT_DB_NAME_ATTRIBUTE = "db.name"


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
            # bit-stable across engines (same posture as the sum fix).
            # Shared CASE chain with spanmetrics, seconds -> micros.
            from .spanmetrics import explicit_bucket_label

            le = explicit_bucket_label(
                latency_us,
                self.latency_buckets_s,
                to_native=lambda b: int(b * 1_000_000),
            )
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


@dataclass
class SpanServiceGraph:
    """Reference-faithful span-pair service graph.

    Reference: connector/servicegraphconnector/connector.go:216-307 —
    CLIENT/PRODUCER spans key the edge store on (trace_id, span_id);
    SERVER/CONSUMER spans key on (trace_id, PARENT span_id); an edge
    completes when both sides arrive. PRODUCER/CONSUMER mark the edge
    ``messaging_system``; a client span carrying the database-name
    attribute completes immediately as a ``database`` edge whose server
    is the db name (connector.go:262-267). Edges still incomplete when
    the store expires become VIRTUAL edges (onExpire, connector.go:338-367):
    an unmatched ROOT server span gains client "user"; an unmatched
    client span gains the first configured peer attribute as its server.
    ``Failed`` is true if either side has STATUS_CODE_ERROR
    (connector.go:255,282). Per-edge metrics: request count, failed
    count, client/server latency (connector.go:369-385 + update*Metrics).

    Batch restatement: the store IS a full outer equi-join on
    (trace_id, edge span id) between the client-kind and server-kind
    projections — ONE shuffle each side, co-partitioned by the join key;
    batch end == store expiry, so the outer join's unmatched rows are
    exactly the reference's expired edges. The output aggregation is one
    hash agg keyed on the edge dimensions.

    Naming note: the reference's PUBLISHED histograms are cross-wired —
    ``traces_service_graph_request_server_seconds`` is filled from the
    reqCLIENTDuration maps and ``..._client_seconds`` from
    reqSERVERDuration (collectServerLatencyMetrics/
    collectClientLatencyMetrics, connector.go:530-585; verified against
    testdata/virtual-node-label-server-expected-metrics.yaml where the
    lone client span's duration lands in the server-named series). The
    columns here use HONEST sides: ``client_latency_sum_s`` sums client
    span durations; map to the reference's published names by swapping.
    """

    dimensions: list[str] = field(default_factory=list)  # config.Dimensions
    peer_attributes: list[str] = field(default_factory=lambda: list(DEFAULT_PEER_ATTRIBUTES))
    database_name_attribute: str = DEFAULT_DB_NAME_ATTRIBUTE
    virtual_node_extra_label: bool = False
    trace_id_col: str = "trace_id"
    span_id_col: str = "span_id"
    parent_col: str = "parent_span_id"
    kind_col: str = "span_kind"
    service_col: str = "service_name"
    status_col: str = "status_code"
    duration_col: str = "duration_s"
    attrs_col: str = "attributes"

    def _dims(self, side: str) -> list[Column]:
        # upsertDimensions (connector.go:310-316): kind-prefixed, from
        # span attributes (the resource/span split collapses in the flat
        # span frame)
        return [
            try_element_at(F.col(self.attrs_col), d).alias(f"{side}_{d}")
            for d in self.dimensions
        ]

    def edges(self, spans: DataFrame) -> DataFrame:
        is_err = F.col(self.status_col) == "STATUS_CODE_ERROR"
        kind = F.col(self.kind_col)
        client_kind = kind.isin("SPAN_KIND_CLIENT", "SPAN_KIND_PRODUCER")
        server_kind = kind.isin("SPAN_KIND_SERVER", "SPAN_KIND_CONSUMER")

        peer = F.coalesce(
            *[try_element_at(F.col(self.attrs_col), a) for a in self.peer_attributes],
            F.lit(None).cast("string"),
        )
        db_name = try_element_at(F.col(self.attrs_col), self.database_name_attribute)

        clients = spans.filter(client_kind).select(
            F.col(self.trace_id_col).alias("__tid"),
            F.col(self.span_id_col).alias("__eid"),
            F.col(self.service_col).alias("client"),
            F.col(self.duration_col).cast("double").alias("client_latency_s"),
            is_err.alias("__c_err"),
            (kind == "SPAN_KIND_PRODUCER").alias("__c_msg"),
            peer.alias("__peer"),
            db_name.alias("__db"),
            *self._dims("client"),
        )
        servers = spans.filter(server_kind).select(
            F.col(self.trace_id_col).alias("__tid"),
            F.col(self.parent_col).alias("__eid"),
            F.col(self.span_id_col).alias("__ssid"),
            (F.col(self.parent_col).isNull() | (F.col(self.parent_col) == "")).alias(
                "__root"
            ),
            F.col(self.service_col).alias("server"),
            F.col(self.duration_col).cast("double").alias("server_latency_s"),
            is_err.alias("__s_err"),
            (kind == "SPAN_KIND_CONSUMER").alias("__s_msg"),
            *self._dims("server"),
        )
        # the reference store completes ONE edge per (trace, span-id)
        # key — the first matching server/consumer child — and the rest
        # surface as their own unpaired entries (store/store.go
        # UpsertEdge completes + evicts the key). Joining ALL children
        # would fan the single client span out N times, re-counting its
        # latency and request once per child. Batch analog: rank the
        # children per key (deterministic smallest child span id = the
        # batch stand-in for arrival order) and pair only the first;
        # later children flow through as server-only rows.
        skey = Window.partitionBy("__tid", "__eid").orderBy("__ssid")
        servers = servers.withColumn("__srn", F.row_number().over(skey))
        first_child = servers.filter(F.col("__srn") == 1).drop("__srn", "__ssid")
        extra_children = servers.filter(F.col("__srn") > 1).drop("__srn", "__ssid")
        joined = clients.join(first_child, ["__tid", "__eid"], "full_outer")
        joined = joined.unionByName(extra_children, allowMissingColumns=True)

        has_client = F.col("client").isNotNull()
        has_server = F.col("server").isNotNull()
        msg = F.coalesce(F.col("__c_msg"), F.lit(False)) | F.coalesce(
            F.col("__s_msg"), F.lit(False)
        )
        is_db = has_client & F.col("__db").isNotNull()

        conn = (
            F.when(is_db, F.lit(CONN_DATABASE))
            .when(~has_client | (~has_server & ~is_db), F.lit(CONN_VIRTUAL))
            .when(msg, F.lit(CONN_MESSAGING))
            .otherwise(F.lit(CONN_UNKNOWN))
        )
        # db edges complete from the client span alone (connector.go:262-267);
        # virtual completions fill the missing side (onExpire)
        server_svc = (
            F.when(is_db & ~has_server, F.col("__db"))
            .when(has_server, F.col("server"))
            # getPeerHost (connector.go:614-623): no peer attribute found
            # -> literal "unknown"
            .otherwise(F.coalesce(F.col("__peer"), F.lit("unknown")))
        )
        server_lat = F.when(
            is_db & ~has_server, F.col("client_latency_s")
        ).otherwise(F.col("server_latency_s"))
        client_svc = F.when(has_client, F.col("client")).otherwise(
            F.when(F.col("__root"), F.lit("user"))
        )
        vlabel = (
            F.when(~has_client & F.col("__root"), F.lit("client"))
            .when(~has_server & ~is_db & has_client, F.lit("server"))
            .otherwise(F.lit(""))
        )

        out = joined.select(
            client_svc.alias("client"),
            server_svc.alias("server"),
            conn.alias("connection_type"),
            F.coalesce("client_latency_s", F.lit(0.0)).alias("client_latency_s"),
            F.coalesce(server_lat, F.lit(0.0)).alias("server_latency_s"),
            (
                F.coalesce(F.col("__c_err"), F.lit(False))
                | F.coalesce(F.col("__s_err"), F.lit(False))
            ).alias("failed"),
            vlabel.alias("virtual_node"),
            *[
                F.col(f"{side}_{d}")
                for side in ("client", "server")
                for d in self.dimensions
            ],
        )
        # an unmatched NON-ROOT server span never emits (onExpire fires
        # neither branch: client empty but span id set, server present);
        # an unmatched client with no peer attribute emits no server
        return out.filter(F.col("client").isNotNull() & F.col("server").isNotNull())

    def __call__(self, spans: DataFrame) -> DataFrame:
        keys = ["client", "server", "connection_type"] + [
            f"{side}_{d}" for side in ("client", "server") for d in self.dimensions
        ]
        if self.virtual_node_extra_label:
            keys.append("virtual_node")
        # integer-microsecond sums: associative, bit-stable at any
        # parallelism (same posture as ServiceGraphConnector above)
        return (
            self.edges(spans)
            .groupBy(*keys)
            .agg(
                F.count(F.lit(1)).alias("request_count"),
                F.sum(F.when(F.col("failed"), 1).otherwise(0)).alias("failed_count"),
                (
                    F.sum((F.col("client_latency_s") * 1e6).cast("bigint"))
                    / F.lit(1000000.0)
                ).alias("client_latency_sum_s"),
                (
                    F.sum((F.col("server_latency_s") * 1e6).cast("bigint"))
                    / F.lit(1000000.0)
                ).alias("server_latency_sum_s"),
            )
        )
