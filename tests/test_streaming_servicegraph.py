"""Streaming servicegraph pairing: stream-stream self-join with the
TTL store expressed as the join's event-time bound.

Parity: the inner-join pairs equal the batch connector's pre-aggregation
edge rows (same client/server/latency per pair) on identical spans;
left_outer additionally emits expired unpaired clients once the
watermark passes their TTL window.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from opentelemetry_collector_contrib_spark.connectors.servicegraph import (
    ServiceGraphConnector,
)
from opentelemetry_collector_contrib_spark.streaming.metrics import (
    streaming_servicegraph_pairs,
)

DDL = "conv_id string, turn_idx int, ts timestamp, role string, tool string"
T0 = dt.datetime(2024, 1, 1)


def _spans():
    s = dt.timedelta(seconds=1)
    rows = []
    for i in range(40):
        cid = f"c{i:02d}"
        # user -> tool pair; every 4th conv lacks the tool response
        rows.append((cid, 0, T0 + i * s, "user", f"svc{i % 3}"))
        if i % 4 != 0:
            rows.append((cid, 1, T0 + i * s + 2 * s, "tool", f"svc{i % 3}"))
        # a trailing user turn that must NOT pair (next row not server)
        rows.append((cid, 2, T0 + i * s + 3 * s, "user", "none"))
    return rows


def test_streaming_pairs_match_batch_edges(spark, tmp_path):
    df = spark.createDataFrame(_spans(), DDL)
    src = str(tmp_path / "in")
    df.coalesce(1).write.parquet(src)

    conn = ServiceGraphConnector(
        client_condition="role = 'user'",
        server_condition="role = 'tool'",
        client_dim="role",
        server_dim="tool",
    )
    # batch edges pre-aggregation are internal; the expected pair set
    # follows directly from the generator: convs with a tool response
    want = {
        (f"c{i:02d}", 0, "user", f"svc{i % 3}", 2_000_000)
        for i in range(40)
        if i % 4 != 0
    }

    stream = spark.readStream.schema(DDL).parquet(src)
    out = streaming_servicegraph_pairs(
        stream,
        client_condition="role = 'user'",
        server_condition="role = 'tool'",
        store_ttl="30 seconds",
        watermark="5 seconds",
    )
    q = (
        out.writeStream.format("memory")
        .queryName("sg_mem")
        .outputMode("append")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ck"))
        .start()
    )
    q.awaitTermination(180)
    got = {
        (r.conv_id, r.turn_idx, r.client, r.server, r.latency_us)
        for r in spark.sql("SELECT * FROM sg_mem").collect()
    }
    assert got == want
    # and the aggregated edge counts match the batch connector
    batch_edges = {
        (r.client, r.server): r.request_count for r in conn(df).collect()
    }
    stream_edges = {
        (r.client, r.server): r.cnt
        for r in spark.sql(
            "SELECT client, server, COUNT(*) cnt FROM sg_mem "
            "GROUP BY client, server"
        ).collect()
    }
    assert stream_edges == batch_edges


def test_streaming_pairs_left_outer_expires_unpaired(spark, tmp_path):
    src = str(tmp_path / "in2")
    s = dt.timedelta(seconds=1)
    spark.createDataFrame(
        [
            ("p1", 0, T0, "user", "svcA"),
            ("p1", 1, T0 + 2 * s, "tool", "svcA"),
            ("p2", 0, T0, "user", "svcB"),   # never answered -> expires
        ],
        DDL,
    ).coalesce(1).write.parquet(src)
    # sentinels must advance BOTH sides' watermarks (the stream-stream
    # join's global watermark is the min), so each flush file carries a
    # client-role AND a server-role row
    for k, days in (("f1", 1), ("f2", 2)):
        spark.createDataFrame(
            [
                (f"__{k}__", 0, T0 + dt.timedelta(days=days), "user", "x"),
                (f"__{k}__", 9, T0 + dt.timedelta(days=days), "tool", "x"),
            ],
            DDL,
        ).coalesce(1).write.mode("append").parquet(src)

    stream = spark.readStream.schema(DDL).option(
        "maxFilesPerTrigger", 1
    ).parquet(src)
    out = streaming_servicegraph_pairs(
        stream,
        client_condition="role = 'user'",
        server_condition="role = 'tool'",
        store_ttl="10 seconds",
        watermark="0 seconds",
        how="left_outer",
    )
    q = (
        out.writeStream.format("memory")
        .queryName("sg_mem2")
        .outputMode("append")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ck2"))
        .start()
    )
    q.awaitTermination(180)
    rows = {
        r.conv_id: r
        for r in spark.sql("SELECT * FROM sg_mem2").collect()
        if not r.conv_id.startswith("__")
    }
    assert rows["p1"].server == "svcA" and rows["p1"].latency_us == 2_000_000
    # the expired client surfaces with null server = the reference's
    # expired-item accounting
    assert rows["p2"].server is None and rows["p2"].latency_us is None
