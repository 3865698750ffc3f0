"""Structured Streaming pipeline: file source -> parse/enrich/route ->
windowed counts / session recombine / per-sink writes.

Each test feeds a small parquet directory through the streaming path
with ``availableNow`` + memory/foreachBatch sinks and compares against
the batch pipeline on the same rows (stream/batch parity is the
invariant — same operators, same results).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from opentelemetry_collector_contrib_spark.data import synth_transcripts
from opentelemetry_collector_contrib_spark.pipeline import TranscriptPipeline
from opentelemetry_collector_contrib_spark.streaming import (
    file_stream,
    read_rollup,
    session_recombine,
    streaming_dedup_exact,
    streaming_pipeline,
    streaming_rollup,
    windowed_counts,
    write_routed_stream,
)


@pytest.fixture(scope="module")
def stream_dir(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("stream_in"))
    synth_transcripts(spark, n_conv=50, max_turns=8, parallelism=4).write.mode(
        "overwrite"
    ).parquet(d)
    return d


def _drain(q):
    q.awaitTermination(120)


def test_stream_batch_parity_routing(spark, stream_dir, tmp_path):
    stream = file_stream(spark, stream_dir)
    assert stream.isStreaming
    routed = streaming_pipeline(stream)
    q = (
        routed.writeStream.format("memory")
        .queryName("routed_mem")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ck1"))
        .start()
    )
    _drain(q)
    got = spark.sql(
        "SELECT route, count(*) AS n FROM routed_mem GROUP BY route"
    ).collect()
    batch_df = spark.read.parquet(stream_dir)
    p = TranscriptPipeline()
    want = (
        p.route(p.enrich(p.parse(batch_df)))
        .groupBy("route")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    assert {(r.route, r.n) for r in got} == {(r.route, r.n) for r in want}


def test_windowed_counts(spark, stream_dir, tmp_path):
    routed = streaming_pipeline(file_stream(spark, stream_dir))
    wc = windowed_counts(routed, window="1 hour", watermark="2 hours")
    q = (
        wc.writeStream.format("memory")
        .queryName("wc_mem")
        .outputMode("append")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ck2"))
        .start()
    )
    _drain(q)
    rows = spark.sql("SELECT * FROM wc_mem").collect()
    # availableNow + watermark: completed windows are emitted
    assert rows, "no windows emitted"
    total = sum(r["count"] for r in rows)
    n_input = spark.read.parquet(stream_dir).count()
    assert total <= n_input
    assert all(r.window_start < r.window_end for r in rows)


def test_session_recombine_parity(spark, stream_dir, tmp_path):
    stream = file_stream(spark, stream_dir)
    sr = session_recombine(stream, gap="30 minutes", watermark="1 hour")
    q = (
        sr.writeStream.format("memory")
        .queryName("sr_mem")
        .outputMode("append")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ck3"))
        .start()
    )
    _drain(q)
    rows = spark.sql("SELECT * FROM sr_mem").collect()
    assert rows
    # per-conv turns are 7s apart, sessions gap at 30min -> one session
    # per conv among EMITTED (watermark-closed) sessions; text must be
    # ordered by turn_idx within the session
    by_conv = {r.conv_id: r for r in rows}
    batch = spark.read.parquet(stream_dir)
    for conv_id, r in list(by_conv.items())[:5]:
        want = "\n".join(
            x.text
            for x in batch.filter(F.col("conv_id") == conv_id)
            .orderBy("turn_idx")
            .collect()
        )
        assert r.text == want
        assert r.n_turns == 8


def test_streaming_dedup_exact_parity(spark, tmp_path):
    # duplicate texts across convs: streaming dedup keeps exactly one
    # row per distinct text (all rows inside the watermark window), the
    # same distinct-key set the batch exact dedup retains
    rows = [
        (f"c{i}", t, f"msg {t % 3}", "user")
        for i in range(4)
        for t in range(6)
    ]
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, text string, role string"
    ).withColumn(
        "ts",
        F.timestamp_seconds(F.lit(1_700_000_000) + F.col("turn_idx") * 7),
    )
    src = str(tmp_path / "dd_in")
    df.write.parquet(src)
    stream = spark.readStream.schema(df.schema).parquet(src)
    out = streaming_dedup_exact(stream, key_col="text", watermark="1 hour")
    q = (
        out.writeStream.format("memory")
        .queryName("dd_mem")
        .outputMode("append")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ck_dd"))
        .start()
    )
    _drain(q)
    got = spark.sql("SELECT * FROM dd_mem").collect()
    # exactly one survivor per distinct text, no helper column leaked
    assert sorted(r.text for r in got) == ["msg 0", "msg 1", "msg 2"]
    assert "__h" not in spark.sql("SELECT * FROM dd_mem").columns


def test_stateful_delta_to_cumulative_across_restarts(spark, tmp_path):
    """applyInPandasWithState running totals survive micro-batches AND a
    full query restart (checkpointed state store = the collector's
    storage-extension persistence for deltatocumulative)."""
    import datetime as dt

    from opentelemetry_collector_contrib_spark.streaming import (
        stateful_delta_to_cumulative,
    )

    ddl = "metric string, ts timestamp, value double"
    in_dir, ckpt, out_dir = (
        str(tmp_path / "in"), str(tmp_path / "ckpt"), str(tmp_path / "out")
    )
    t0 = dt.datetime(2024, 1, 1)
    sec = dt.timedelta(seconds=1)
    spark.createDataFrame(
        [("A", t0, 1.0), ("A", t0 + sec, 2.0), ("B", t0, 5.0)], ddl
    ).write.mode("overwrite").parquet(in_dir)

    def run_once():
        stream = spark.readStream.schema(ddl).parquet(in_dir)
        out = stateful_delta_to_cumulative(stream, stream_keys=["metric"])
        q = (
            out.writeStream.format("parquet")
            .option("checkpointLocation", ckpt)
            .option("path", out_dir)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    run_once()
    # new delta arrives AFTER a restart: the running total must resume
    spark.createDataFrame([("A", t0 + 2 * sec, 4.0)], ddl).write.mode(
        "append"
    ).parquet(in_dir)
    run_once()
    res = {
        (r.metric, r.value): r.cumulative
        for r in spark.read.parquet(out_dir).collect()
    }
    assert res[("A", 1.0)] == 1.0
    assert res[("A", 2.0)] == 3.0
    assert res[("B", 5.0)] == 5.0
    assert res[("A", 4.0)] == 7.0  # restored state: 3 + 4


def test_routed_stream_fanout_writes(spark, stream_dir, tmp_path):
    routed = streaming_pipeline(file_stream(spark, stream_dir))
    out = str(tmp_path / "sinks")
    q = write_routed_stream(
        routed, out, str(tmp_path / "ck4"), trigger_available_now=True
    )
    _drain(q)
    written = spark.read.parquet(out)
    n_input = spark.read.parquet(stream_dir).count()
    assert written.count() == n_input
    routes = {r.route for r in written.select("route").distinct().collect()}
    assert "sink_default" in routes and "sink_errors" in routes


def _serve_then(send_payloads):
    """Start a one-shot TCP server; Spark's socket source connects as a
    client, receives the payloads, then the server closes."""
    import socket
    import threading

    srv = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
    srv.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
    srv.bind(("127.0.0.1", 0))
    srv.listen(1)
    port = srv.getsockname()[1]
    done = threading.Event()

    def run():
        conn, _ = srv.accept()
        try:
            for p in send_payloads:
                conn.sendall(p)
            done.wait(60)  # keep the connection open until test signals
        finally:
            conn.close()
            srv.close()

    threading.Thread(target=run, daemon=True).start()
    return port, done


def test_socket_stream_newline_framing(spark, tmp_path):
    """Live tcplog receiver (pkg/stanza/operator/input/tcp): newline
    frames arrive as rows of the batch framing schema."""
    from opentelemetry_collector_contrib_spark.streaming import socket_stream

    port, done = _serve_then([b"<13>Feb  5 17:32:18 host app: one\nmsg two\n"])
    frames = socket_stream(spark, "127.0.0.1", port, framing="newline")
    q = (
        frames.writeStream.format("memory")
        .queryName("sock_nl")
        .option("checkpointLocation", str(tmp_path / "ck_nl"))
        .start()
    )
    try:
        for _ in range(120):
            if spark.sql("SELECT * FROM sock_nl").count() >= 2:
                break
            q.processAllAvailable()
    finally:
        done.set()
        q.stop()
    rows = spark.sql("SELECT * FROM sock_nl").collect()
    bodies = sorted(r.body for r in rows)
    assert bodies == ["<13>Feb  5 17:32:18 host app: one", "msg two"]
    assert all(r.valid for r in rows)


def test_socket_stream_octet_framing_stream_batch_parity(spark, tmp_path):
    """RFC6587 octet counting over a live socket matches the batch
    framing operator on the same blob (receiver/syslogreceiver/
    syslog.go:61-71)."""
    from opentelemetry_collector_contrib_spark.sources.socket import (
        split_octet_frames,
    )
    from opentelemetry_collector_contrib_spark.streaming import socket_stream

    blob = "5 hello11 world again6 stream"
    port, done = _serve_then([blob.encode() + b"\n"])
    frames = socket_stream(spark, "127.0.0.1", port, framing="octet")
    q = (
        frames.writeStream.format("memory")
        .queryName("sock_oct")
        .option("checkpointLocation", str(tmp_path / "ck_oct"))
        .start()
    )
    try:
        for _ in range(120):
            if spark.sql("SELECT * FROM sock_oct").count() >= 3:
                break
            q.processAllAvailable()
    finally:
        done.set()
        q.stop()
    got = {
        (r.frame_idx, r.body, r.valid)
        for r in spark.sql("SELECT * FROM sock_oct").collect()
    }
    batch = spark.createDataFrame([("s", blob)], "stream_id string, data string")
    want = {
        (r.frame_idx, r.body, r.valid)
        for r in split_octet_frames(batch).collect()
    }
    assert got == want
    assert {b for _, b, _ in got} == {"hello", "world again", "stream"}


def test_streaming_rollup_merges_to_batch_rollup(spark, stream_dir, tmp_path):
    """Continuous aggregate parity: per-micro-batch additive partials,
    summed at read time, equal the one-shot batch hypertable_rollup —
    with maxFilesPerTrigger=1 forcing MULTIPLE micro-batches so the
    cross-batch merge is actually exercised."""
    from opentelemetry_collector_contrib_spark.operators import hypertable_rollup

    grains = [("1h", "hour"), ("1d", "day")]
    aggs = lambda: [  # noqa: E731 — additive partials only
        F.count(F.lit(1)).alias("n_turns"),
        F.sum(F.length("text")).alias("chars"),
    ]
    out = str(tmp_path / "rollup_parts")
    q = streaming_rollup(
        file_stream(spark, stream_dir, max_files_per_trigger=1),
        "ts",
        grains,
        ["role"],
        aggs,
        out,
        str(tmp_path / "ck_rollup"),
        trigger_available_now=True,
    )
    _drain(q)
    import glob as _glob
    import os as _os

    n_batches = len(_glob.glob(_os.path.join(out, "batch_id=*")))
    assert n_batches > 1, "expected several micro-batches to merge"
    got = {
        (r["grain"], r["bucket"], r["role"]): (r["n_turns"], r["chars"])
        for r in read_rollup(spark, out, ["role"]).collect()
    }
    want = {
        (r["grain"], r["bucket"], r["role"]): (r["n_turns"], r["chars"])
        for r in hypertable_rollup(
            spark.read.parquet(stream_dir), "ts", grains, ["role"], aggs()
        ).collect()
    }
    assert got == want


def test_streaming_ingest_dedup_cross_batch(spark, tmp_path):
    """Corpus ingest dedup across micro-batches: duplicate texts in
    LATER batches are dropped against the accumulated seen-hash table,
    intra-batch dups collapse, and the final docs dir holds exactly one
    row per distinct text (stream/batch parity with global exact
    dedup's row set, modulo which duplicate id was first to arrive)."""
    from opentelemetry_collector_contrib_spark.streaming import (
        streaming_ingest_dedup,
    )

    src = str(tmp_path / "ingest_in")
    rows = [
        # file 0: one intra-file dup pair
        [(0, "alpha doc"), (1, "alpha doc"), (2, "beta doc")],
        # file 1: re-sends alpha (cross-batch dup) + a new doc
        [(10, "alpha doc"), (11, "gamma doc")],
        # file 2: re-sends everything + one new doc
        [(20, "beta doc"), (21, "gamma doc"), (22, "delta doc")],
    ]
    import os

    for i, part in enumerate(rows):
        spark.createDataFrame(part, "doc_id long, text string").coalesce(
            1
        ).write.mode("overwrite").parquet(os.path.join(src, f"f{i}"))
    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(src + "/*")
    )
    base = str(tmp_path / "ingest_out")
    q = streaming_ingest_dedup(
        stream,
        base,
        str(tmp_path / "ck_ingest"),
        trigger_available_now=True,
    )
    _drain(q)
    import glob

    n_batches = len(glob.glob(os.path.join(base, "docs", "batch_id=*")))
    assert n_batches > 1, "expected several micro-batches"
    out = spark.read.parquet(os.path.join(base, "docs"))
    got = [(r["doc_id"], r["text"]) for r in out.collect()]
    texts = [t for _, t in got]
    assert sorted(texts) == sorted(
        ["alpha doc", "beta doc", "gamma doc", "delta doc"]
    ), got
    all_rows = dict(p for part in rows for p in part)
    assert all(all_rows[i] == t for i, t in got)  # kept ids bear their text
    # the seen table holds exactly one hash per distinct text
    seen = spark.read.parquet(os.path.join(base, "seen"))
    assert seen.select("__h").distinct().count() == 4
    assert seen.count() == 4


def test_routed_stream_obsreport_counters(spark, stream_dir, tmp_path):
    """Per-micro-batch obsreport counters ride the write action via
    observe() — totals and per-route counts must equal what landed in
    the sinks."""
    from opentelemetry_collector_contrib_spark.metrics import MetricsCollector

    coll = MetricsCollector(run_id="stream_obs")
    routed = streaming_pipeline(file_stream(spark, stream_dir))
    out = str(tmp_path / "obs_sinks")
    q = write_routed_stream(
        routed, out, str(tmp_path / "ck_obs"),
        trigger_available_now=True,
        collector=coll, routes=["sink_errors", "sink_default"],
    )
    q.awaitTermination(120)
    written = spark.read.parquet(out)
    snap = {
        (r.stage, r.metric): r.value
        for r in coll.snapshot(spark).collect()
    }
    assert snap[("stream_sink", "rows")] == written.count() > 0
    assert snap[("stream_sink", "rows_sink_errors")] == written.filter(
        F.col("route") == "sink_errors"
    ).count()
    # replay safety: re-recording the same batch overwrites, not adds
    before = snap[("stream_sink", "rows")]
    per = coll._batch_pending["stream_sink"]
    some_bid = max(per)
    coll.record_batch("stream_sink", some_bid, per[some_bid])
    again = {
        (r.stage, r.metric): r.value for r in coll.snapshot(spark).collect()
    }
    assert again[("stream_sink", "rows")] == before


def test_stateful_cumulative_to_delta_parity_and_restart(spark, tmp_path):
    """Streaming c2d matches the batch CumulativeToDelta (basic and
    monotonic modes) on the same points, with state crossing a
    micro-batch boundary — the MetricTracker reference-value
    semantics."""
    import datetime as dt

    from opentelemetry_collector_contrib_spark.processors.metrics_state import (
        CumulativeToDelta,
    )
    from opentelemetry_collector_contrib_spark.streaming.stateful import (
        stateful_cumulative_to_delta,
    )

    ddl = "metric string, ts timestamp, value double"
    t0 = dt.datetime(2024, 1, 1)
    s = dt.timedelta(seconds=1)
    # A: rising with a counter restart at t3; B: plain rising
    rows1 = [("A", t0, 10.0), ("A", t0 + s, 13.0), ("B", t0, 5.0)]
    rows2 = [("A", t0 + 2 * s, 20.0), ("A", t0 + 3 * s, 2.0),
             ("A", t0 + 4 * s, 6.0), ("B", t0 + s, 9.0)]
    in_dir = str(tmp_path / "c2d_in")
    spark.createDataFrame(rows1, ddl).coalesce(1).write.parquet(in_dir)
    spark.createDataFrame(rows2, ddl).coalesce(1).write.mode(
        "append"
    ).parquet(in_dir)

    for monotonic in (False, True):
        batch_proc = CumulativeToDelta(
            stream_keys=["metric"],
            monotonic_col="__mono__" if monotonic else None,
        )
        batch_df = spark.createDataFrame(rows1 + rows2, ddl)
        if monotonic:
            batch_df = batch_df.withColumn("__mono__", F.lit(True))
        want = {
            (r.metric, r.value): r.delta for r in batch_proc(batch_df).collect()
        }
        stream = spark.readStream.schema(ddl).option(
            "maxFilesPerTrigger", 1
        ).parquet(in_dir)
        out = stateful_cumulative_to_delta(
            stream, stream_keys=["metric"], monotonic=monotonic
        )
        name = f"c2d_mem_{int(monotonic)}"
        q = (
            out.writeStream.format("memory")
            .queryName(name)
            .outputMode("append")
            .trigger(availableNow=True)
            .option("checkpointLocation", str(tmp_path / f"ck_{int(monotonic)}"))
            .start()
        )
        q.awaitTermination(120)
        got = {
            (r.metric, r.value): r.delta
            for r in spark.sql(f"SELECT * FROM {name}").collect()
        }
        assert got == want, monotonic
    # restart case sanity: monotonic drops the 2.0 point, next delta is 4
    assert got[("A", 6.0)] == 4.0 and ("A", 2.0) not in got


def test_stateful_c2d_nan_never_updates_reference(spark, tmp_path):
    """[1.0, NaN, 5.0]: the NaN point is emitted (NaN delta) but the
    next delta is taken against the last VALID value — and a NaN last
    point must not poison the state-store reference (batch
    CumulativeToDelta reference semantics)."""
    import datetime as dt
    import math

    from opentelemetry_collector_contrib_spark.streaming.stateful import (
        stateful_cumulative_to_delta,
    )

    ddl = "metric string, ts timestamp, value double"
    t0 = dt.datetime(2024, 1, 1)
    s = dt.timedelta(seconds=1)
    in_dir = str(tmp_path / "c2dnan")
    # batch 1 ends on NaN -> the stored reference must stay 1.0
    spark.createDataFrame(
        [("A", t0, 1.0), ("A", t0 + s, float("nan"))], ddl
    ).coalesce(1).write.parquet(in_dir)
    spark.createDataFrame(
        [("A", t0 + 2 * s, 5.0)], ddl
    ).coalesce(1).write.mode("append").parquet(in_dir)
    stream = spark.readStream.schema(ddl).option(
        "maxFilesPerTrigger", 1
    ).parquet(in_dir)
    out = stateful_cumulative_to_delta(stream, stream_keys=["metric"])
    q = (
        out.writeStream.format("memory")
        .queryName("c2dnan")
        .outputMode("append")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ck_nan"))
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql("SELECT * FROM c2dnan ORDER BY ts").collect()
    # first valid point dropped; the NaN point IS emitted (surfacing as
    # NULL value/delta: Arrow from_pandas maps NaN to null at the
    # stateful-op boundary); 5.0 diffs against 1.0, not against the NaN
    assert len(rows) == 2
    assert rows[0].value is None or math.isnan(rows[0].value)
    assert rows[0].delta is None or math.isnan(rows[0].delta)
    assert rows[1].value == 5.0 and rows[1].delta == 4.0
