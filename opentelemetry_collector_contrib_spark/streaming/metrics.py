"""Streaming forms of the metric-producing operators.

Two reference behaviors are genuinely periodic-flush shaped — the
interval processor ("keep the last datapoint per stream, emit every
interval", processor/intervalprocessor/processor.go export ticker) and
the spanmetrics connector (RED aggregation flushed every
``flush_interval``, connector/spanmetricsconnector/connector.go
exportMetrics ticker). Their batch twins treat the whole table as one
flush; these operators are the watermarked tumbling-window analogs —
each event-time window IS one flush tick, finalized when the watermark
passes the window end.

Both reuse the batch operators' column builders (the interval bucket
arithmetic, spanmetrics ``_key_dims``/``bucket_label``/``exp_index``)
so bucketing and dimension-resolution semantics cannot drift between
batch and stream; parity is pytest-asserted against the batch outputs.

Scale posture: plain watermarked window aggregations — Spark keeps one
state row per (window x key), evicted at the watermark; partial
aggregation runs map-side before the shuffle. No applyInPandas, no
Python in the row path.

Deviation from the batch twins, by necessity: rows with a NULL event
time cannot be windowed and are excluded from the streaming
aggregations, while the batch operators (which never consult the
timestamp for bucketing, or emit a null-bucket group) include them —
the parity tests therefore use non-null timestamps. Filter or stamp
null-ts rows upstream if they carry signal.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def streaming_interval_last(
    stream: DataFrame,
    interval: str = "60 seconds",
    stream_keys: list[str] | None = None,
    value_col: str = "value",
    order_col: str = "ts",
    tiebreak_col: str | None = None,
    watermark: str = "0 seconds",
) -> DataFrame:
    """Streaming interval processor: the LAST datapoint per (stream,
    tumbling interval), emitted when the watermark closes the interval
    — the reference's export-ticker flush
    (processor/intervalprocessor/processor.go:125-143 exportMetrics).

    ``max_by(value, (event time, tiebreak))`` inside a
    ``window(ts, interval)`` group reproduces the batch
    ``IntervalProcessor`` row pick exactly (same bucket arithmetic:
    Spark tumbling windows are epoch-aligned, as is the batch
    ``floor(unix_micros / interval_us)``); append-mode output carries
    ``interval_start`` like the batch form.
    """
    unit = interval.split()[-1].lower().rstrip("s")
    if unit in ("month", "year"):
        # Spark tumbling windows need fixed-width durations; the batch
        # IntervalProcessor handles calendar grains via date_trunc
        raise ValueError(
            f"calendar intervals ({interval!r}) are batch-only; "
            "use IntervalProcessor"
        )
    keys = stream_keys or ["metric"]
    ts = F.col(order_col).cast("timestamp")
    order = (
        F.struct(ts, F.col(tiebreak_col))
        if tiebreak_col
        else F.struct(ts)
    )
    return (
        stream.withColumn("__ts__", ts)
        .withWatermark("__ts__", watermark)
        .groupBy(F.window("__ts__", interval).alias("__w__"), *keys)
        .agg(
            F.max_by(F.col(value_col), order).alias(value_col),
            F.max_by(ts, order).alias(order_col),
        )
        .select(
            *keys,
            F.col("__w__.start").alias("interval_start"),
            order_col,
            value_col,
        )
    )


def streaming_spanmetrics(
    stream: DataFrame,
    connector,
    ts_col: str = "ts",
    flush_interval: str = "60 seconds",
    watermark: str = "0 seconds",
) -> DataFrame:
    """Streaming spanmetrics: the connector's explicit/exponential
    latency histogram per flush window
    (connector/spanmetricsconnector/connector.go exportMetrics ticker;
    each event-time window is one flush).

    Dimension resolution and bucketing are the CONNECTOR'S OWN column
    builders (``_key_dims`` + ``bucket_label``/``exp_index``) applied to
    the stream — the aggregation is the same single
    map-side-combined count/sum, keyed additionally by the flush
    window. Summing ``bucket_count``/``duration_sum`` across windows
    equals the batch connector output (pytest-asserted), which is the
    delta-temporality contract of the reference's periodic flush.
    """
    dur = F.col(connector.duration_col).cast("double")
    dims, names = connector._key_dims(stream)
    bucket = (
        connector.exp_index(dur).alias("bucket_idx")
        if connector.histogram == "exponential"
        else connector.bucket_label(dur).alias("le")
    )
    bname = "bucket_idx" if connector.histogram == "exponential" else "le"
    ts = F.col(ts_col).cast("timestamp")
    return (
        stream.filter(dur.isNotNull())
        .select(*dims, bucket, dur.alias("__d"), ts.alias("__ts__"))
        .withWatermark("__ts__", watermark)
        .groupBy(F.window("__ts__", flush_interval).alias("__w__"), *names, bname)
        .agg(
            F.count(F.lit(1)).alias("bucket_count"),
            F.sum("__d").alias("duration_sum"),
        )
        .select(
            F.col("__w__.start").alias("flush_start"),
            *names,
            bname,
            "bucket_count",
            "duration_sum",
        )
    )


def streaming_servicegraph_pairs(
    client_stream: DataFrame,
    server_stream: DataFrame | None = None,
    *,
    client_condition: str,
    server_condition: str,
    correlation_key: str = "conv_id",
    order_col: str = "turn_idx",
    ts_col: str = "ts",
    client_dim: str = "role",
    server_dim: str = "tool",
    store_ttl: str = "30 seconds",
    watermark: str = "10 seconds",
    how: str = "inner",
) -> DataFrame:
    """Streaming servicegraph pairing: the reference's span-pair store
    as a watermarked stream-stream self-join.

    The reference keeps unpaired spans in an in-memory store and evicts
    them after ``store_expiration_ttl``
    (connector/servicegraphconnector/config.go:11-56, internal/store).
    Spark's stream-stream join state IS that store: the join condition
    bounds the server row's event time to
    ``[client ts, client ts + store_ttl]``, so the watermark can prove
    when a client row can no longer pair and drop it from state —
    exactly the TTL eviction, with zero user code and zero Python.

    Pairing rule matches the batch connector (a client row pairs with
    the immediately following row of its correlation group when that
    row satisfies the server predicate): join on the correlation key +
    ``server.order == client.order + 1`` + the TTL time bound.
    REQUIRES DENSE order indices (transcript ``turn_idx`` is dense by
    construction): with gaps in ``order_col`` the batch ``lead()``
    pairs across the gap while this join does not — feed contiguous
    indices (e.g. re-rank upstream) if the source can have holes.

    ``how='inner'`` emits an edge row per pair as soon as both sides
    arrive. ``how='left_outer'`` additionally emits client rows that
    EXPIRED unpaired (null server columns, once the watermark passes
    their TTL window) — the reference's expired-item accounting.

    Emits ``(correlation_key, order, client, server, latency_us)``;
    aggregate downstream (windowed, or at the sink) exactly like the
    batch connector's groupBy.
    """
    if server_stream is None:
        server_stream = client_stream
    c = (
        client_stream.filter(F.expr(client_condition))
        .select(
            F.col(correlation_key).alias("__ck"),
            F.col(order_col).alias("__ord"),
            F.col(ts_col).cast("timestamp").alias("__cts"),
            F.col(client_dim).alias("client"),
        )
        .withWatermark("__cts", watermark)
    )
    s = (
        server_stream.filter(F.expr(server_condition))
        .select(
            F.col(correlation_key).alias("__sk"),
            F.col(order_col).alias("__sord"),
            F.col(ts_col).cast("timestamp").alias("__sts"),
            F.col(server_dim).alias("server"),
        )
        .withWatermark("__sts", watermark)
    )
    ttl = F.expr(f"INTERVAL {store_ttl}")
    joined = c.join(
        s,
        (F.col("__ck") == F.col("__sk"))
        & (F.col("__sord") == F.col("__ord") + 1)
        & (F.col("__sts") >= F.col("__cts"))
        & (F.col("__sts") <= F.col("__cts") + ttl),
        how,
    )
    return joined.select(
        F.col("__ck").alias(correlation_key),
        F.col("__ord").alias(order_col),
        # the client's event time rides along so downstream WINDOWED
        # aggregation (per-flush edge metrics) has a column to
        # watermark on — without it the docstring's "aggregate
        # downstream" would be impossible in append mode
        F.col("__cts").alias("event_ts"),
        F.col("client"),
        F.col("server"),
        (
            F.unix_micros(F.col("__sts")) - F.unix_micros(F.col("__cts"))
        ).alias("latency_us"),
    )
