"""Streaming tail sampling: event-time decision_wait semantics with
stream/batch decision parity.

The reference buffers spans per trace and decides at
`ArrivalTime + DecisionWait` (processor/tailsamplingprocessor/
processor.go). The streaming operator maps DecisionTime onto
`GroupStateTimeout.EventTimeTimeout`; these tests assert its decisions
are IDENTICAL to the batch ``TailSampling.decisions()`` (which is
DuckDB-oracle-gated) over the same spans, and that the
O(1)-state aggregates carry across micro-batches.
"""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from opentelemetry_collector_contrib_spark.processors.tail_sampling import (
    TailPolicy,
    TailSampling,
)
from opentelemetry_collector_contrib_spark.streaming.stateful import (
    streaming_tail_sampling,
)

DDL = "conv_id string, ts timestamp, role string, status_code string"
T0 = dt.datetime(2024, 1, 1, 0, 0, 0)


def _spans():
    s = dt.timedelta(seconds=1)
    rows = []
    for i in range(12):
        cid = f"c{i:02d}"
        n = 1 + (i % 4)                      # 1..4 spans
        for j in range(n):
            # traces with i%3==0 stretch 30 s (latency hits); others 1 s/span
            gap = 30 if i % 3 == 0 else 1
            rows.append(
                (
                    cid,
                    T0 + j * gap * s,
                    "tool" if (i + j) % 5 == 0 else "user",
                    "ERROR" if i % 4 == 1 else "OK",
                )
            )
    return rows


POLICIES = [
    TailPolicy(name="slow", type="latency", threshold_ms=25_000),
    TailPolicy(name="err", type="status_code", key="status_code",
               status_codes=["ERROR"]),
    TailPolicy(name="big", type="span_count", min_spans=4),
    TailPolicy(
        name="tool_and_pair",
        type="and",
        sub_policies=[
            TailPolicy(name="t", type="condition", condition="role = 'tool'"),
            TailPolicy(name="p", type="span_count", min_spans=2, max_spans=3),
        ],
    ),
    TailPolicy(
        name="noisy", type="string_attribute", key="role",
        values=["spammer"], invert_match=True,
    ),
]


def _run_stream(spark, tmp_path, policies, wait_ms=5_000):
    in_dir = str(tmp_path / "in")
    df = spark.createDataFrame(_spans(), DDL)
    df.coalesce(1).write.parquet(in_dir)
    # two flush files: file 2 advances the watermark past every
    # DecisionTime; file 3 runs a batch under that watermark so the
    # EventTimeTimeout branch fires (timeouts use the watermark computed
    # from the PREVIOUS batch's data)
    for k, days in (("flush1", 1), ("flush2", 2)):
        spark.createDataFrame(
            [(f"__{k}__", T0 + dt.timedelta(days=days), "user", "OK")], DDL
        ).coalesce(1).write.mode("append").parquet(in_dir)
    stream = spark.readStream.schema(DDL).option(
        "maxFilesPerTrigger", 1
    ).parquet(in_dir)
    out = streaming_tail_sampling(
        stream, policies, trace_key="conv_id", ts_col="ts",
        watermark="0 seconds", decision_wait_ms=wait_ms,
    )
    q = (
        out.writeStream.format("memory")
        .queryName("tsdec")
        .outputMode("append")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ck"))
        .start()
    )
    q.awaitTermination(180)
    got = spark.sql("SELECT * FROM tsdec").collect()
    return {r.conv_id: r for r in got if not r.conv_id.startswith("__")}


def test_streaming_decisions_match_batch(spark, tmp_path):
    batch = {
        r.conv_id: r
        for r in TailSampling(POLICIES, trace_key="conv_id", ts_col="ts")
        .decisions(spark.createDataFrame(_spans(), DDL))
        .collect()
    }
    stream = _run_stream(spark, tmp_path, POLICIES)
    assert set(stream) == set(batch)          # every trace decided
    for cid, r in stream.items():
        assert r.sampled == batch[cid].sampled, cid
        assert r.span_count == batch[cid].span_count, cid


def test_streaming_state_carries_across_microbatches(spark, tmp_path):
    """Spans of ONE trace split across two files/micro-batches: the
    aggregate state (count, min/max ts, any-match) must merge, so the
    decision sees the COMPLETE trace, exactly like the reference's
    buffered trace."""
    in_dir = str(tmp_path / "in2")
    s = dt.timedelta(seconds=1)
    spark.createDataFrame(
        [("cx", T0, "user", "OK"), ("cx", T0 + s, "user", "OK")], DDL
    ).coalesce(1).write.parquet(in_dir)
    spark.createDataFrame(
        [("cx", T0 + 2 * s, "user", "ERROR"),
         ("cx", T0 + 3 * s, "user", "OK")], DDL
    ).coalesce(1).write.mode("append").parquet(in_dir)
    for k, days in (("flush1", 1), ("flush2", 2)):
        spark.createDataFrame(
            [(f"__{k}__", T0 + dt.timedelta(days=days), "user", "OK")], DDL
        ).coalesce(1).write.mode("append").parquet(in_dir)
    pol = [
        TailPolicy(name="err", type="status_code", key="status_code",
                   status_codes=["ERROR"]),
        TailPolicy(name="big", type="span_count", min_spans=4),
    ]
    stream = spark.readStream.schema(DDL).option(
        "maxFilesPerTrigger", 1
    ).parquet(in_dir)
    out = streaming_tail_sampling(
        stream, pol, trace_key="conv_id", ts_col="ts",
        watermark="0 seconds", decision_wait_ms=5_000,
    )
    q = (
        out.writeStream.format("memory")
        .queryName("tsdec2")
        .outputMode("append")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ck2"))
        .start()
    )
    q.awaitTermination(180)
    rows = {
        r.conv_id: r
        for r in spark.sql("SELECT * FROM tsdec2").collect()
        if not r.conv_id.startswith("__")
    }
    assert rows["cx"].span_count == 4       # both batches merged
    assert rows["cx"].sampled is True       # ERROR arrived in batch 2
    assert rows["cx"].dur_ms == 3000.0


def test_rate_policies_rejected(spark):
    with pytest.raises(ValueError, match="batch-only"):
        streaming_tail_sampling(
            spark.createDataFrame([], DDL),
            [TailPolicy(name="r", type="rate_limiting", spans_per_second=5)],
        )


def test_late_spans_do_not_reopen_a_decided_trace(spark, tmp_path):
    """Spans arriving AFTER the decision fired must not rebuild state
    and emit a second, conflicting decision row — the reference serves
    late spans from its decision cache (processor.go)."""
    in_dir = str(tmp_path / "in3")
    day = dt.timedelta(days=1)
    s = dt.timedelta(seconds=1)
    files = [
        [("cx", T0, "user", "ERROR")],                       # the trace
        [("__s1__", T0 + day, "user", "OK")],                # wm -> +1d
        [("__s2__", T0 + day + s, "user", "OK")],            # decision fires
        [("cx", T0 + day + 2 * s, "user", "OK")],            # LATE span
        [("__s3__", T0 + 2 * day, "user", "OK")],            # drain
    ]
    for i, rows in enumerate(files):
        spark.createDataFrame(rows, DDL).coalesce(1).write.mode(
            "append"
        ).parquet(in_dir)
    pol = [TailPolicy(name="err", type="status_code", key="status_code",
                      status_codes=["ERROR"])]
    stream = spark.readStream.schema(DDL).option(
        "maxFilesPerTrigger", 1
    ).parquet(in_dir)
    out = streaming_tail_sampling(
        stream, pol, trace_key="conv_id", ts_col="ts",
        watermark="0 seconds", decision_wait_ms=5_000,
    )
    q = (
        out.writeStream.format("memory")
        .queryName("tsdec3")
        .outputMode("append")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ck3"))
        .start()
    )
    q.awaitTermination(180)
    cx = [r for r in spark.sql("SELECT * FROM tsdec3").collect()
          if r.conv_id == "cx"]
    assert len(cx) == 1                      # exactly one decision row
    assert cx[0].span_count == 1 and cx[0].sampled is True


def test_decision_state_survives_query_restart(spark, tmp_path):
    """The trace's aggregate state is in the checkpointed state store:
    a NEW query instance over the same checkpoint must resume it, so a
    trace whose spans straddle the restart still gets ONE decision over
    the complete trace (the collector's storage-extension persistence)."""
    in_dir = str(tmp_path / "in4")
    ck = str(tmp_path / "ck4")
    s = dt.timedelta(seconds=1)
    day = dt.timedelta(days=1)
    pol = [TailPolicy(name="big", type="span_count", min_spans=2)]

    def run_once():
        stream = spark.readStream.schema(DDL).option(
            "maxFilesPerTrigger", 1
        ).parquet(in_dir)
        out = streaming_tail_sampling(
            stream, pol, trace_key="conv_id", ts_col="ts",
            watermark="0 seconds", decision_wait_ms=5_000,
        )
        q = (
            out.writeStream.format("parquet")
            .option("checkpointLocation", ck)
            .option("path", str(tmp_path / "out4"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)

    # run 1: half the trace, no decision possible yet
    spark.createDataFrame([("cx", T0, "user", "OK")], DDL).coalesce(
        1
    ).write.parquet(in_dir)
    run_once()
    # run 2 (fresh query instance, same checkpoint): the second span +
    # watermark advancers
    for rows in (
        [("cx", T0 + s, "user", "OK")],
        [("__f1__", T0 + day, "user", "OK")],
        [("__f2__", T0 + 2 * day, "user", "OK")],
    ):
        spark.createDataFrame(rows, DDL).coalesce(1).write.mode(
            "append"
        ).parquet(in_dir)
    run_once()
    rows = {
        r.conv_id: r
        for r in spark.read.parquet(str(tmp_path / "out4")).collect()
        if not r.conv_id.startswith("__")
    }
    assert rows["cx"].span_count == 2      # state restored across restart
    assert rows["cx"].sampled is True
