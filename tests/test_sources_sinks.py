"""Sources (filelog, otlpjson, SnapshotTable) + sinks + lineage/resume."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from opentelemetry_collector_contrib_spark.lineage import CheckpointedWriter
from opentelemetry_collector_contrib_spark.sinks import FileSink, write_routed
from opentelemetry_collector_contrib_spark.sources import (
    FileLogSource,
    OtlpJsonFileSource,
    SnapshotTable,
)


def test_filelog_source(spark, tmp_path):
    p = tmp_path / "app.log"
    p.write_text("line one\nline two\nline three\n")
    df = FileLogSource(str(p))(spark)
    rows = df.collect()
    assert {r["body"] for r in rows} == {"line one", "line two", "line three"}
    assert all(r["log_file_name"] == "app.log" for r in rows)


def test_filelog_non_utf8_encoding_decode(spark, tmp_path):
    # stanza decode.go semantics: bytes decode with the configured
    # charset (the text datasource alone is UTF-8-only)
    p = tmp_path / "latin.log"
    p.write_bytes("caf\xe9 one\nna\xefve two\n".encode("latin-1"))
    df = FileLogSource(str(p), encoding="ISO-8859-1")(spark)
    assert {r["body"] for r in df.collect()} == {"café one", "naïve two"}
    assert all(r["log_file_name"] == "latin.log" for r in df.collect())


def test_filelog_multiline_recombine(spark, tmp_path):
    p = tmp_path / "stack.log"
    p.write_text(
        "2024-01-01 ERROR boom\n  at frame1\n  at frame2\n2024-01-01 INFO ok\n"
    )
    df = FileLogSource(str(p), line_start_pattern=r"^\d{4}-\d{2}-\d{2}")(spark)
    bodies = sorted(r["body"] for r in df.collect())
    assert bodies == [
        "2024-01-01 ERROR boom\n  at frame1\n  at frame2",
        "2024-01-01 INFO ok",
    ]


def test_filelog_multiline_order_survives_multisplit(spark, tmp_path):
    """A file big enough to span many input splits must still recombine
    in exact line order (the old mono-id ordering broke here)."""
    p = tmp_path / "big.log"
    blocks = []
    for i in range(2000):
        blocks.append(f"2024-01-01 ENTRY {i:05d}\n  detail line {i:05d}")
    p.write_text("\n".join(blocks) + "\n")
    # force tiny splits so spark.read.text would shatter the file
    spark.conf.set("spark.sql.files.maxPartitionBytes", str(4 * 1024))
    try:
        df = FileLogSource(str(p), line_start_pattern=r"^\d{4}-\d{2}-\d{2}")(spark)
        rows = sorted(r["body"] for r in df.collect())
    finally:
        spark.conf.unset("spark.sql.files.maxPartitionBytes")
    assert len(rows) == 2000
    for i, body in enumerate(rows):
        assert body == f"2024-01-01 ENTRY {i:05d}\n  detail line {i:05d}"


def test_otlpjson_source(spark, tmp_path):
    doc = {
        "resourceLogs": [
            {
                "resource": {"attributes": [
                    {"key": "service.name", "value": {"stringValue": "svc"}}]},
                "scopeLogs": [
                    {
                        "scope": {"name": "lib"},
                        "logRecords": [
                            {
                                "timeUnixNano": "1704067200000000000",
                                "observedTimeUnixNano": "1704067201000000000",
                                "severityNumber": 17,
                                "severityText": "ERROR",
                                "body": {"stringValue": "kaboom"},
                                "attributes": [
                                    {"key": "k", "value": {"stringValue": "v"}}],
                                "traceId": "0102030405060708090a0b0c0d0e0f10",
                                "spanId": "0102030405060708",
                            }
                        ],
                    }
                ],
            }
        ]
    }
    p = tmp_path / "otlp.json"
    p.write_text(json.dumps(doc) + "\n")
    row = OtlpJsonFileSource(str(p))(spark).collect()[0]
    assert row["body"] == "kaboom"
    assert row["severity_number"] == 17
    assert row["resource"]["service.name"] == "svc"
    assert row["attributes"]["k"] == "v"
    assert row["trace_id"].hex() == "0102030405060708090a0b0c0d0e0f10"
    assert str(row["ts"]).startswith("2024-01-01 00:00:00")


def test_socket_framing_octet_and_newline(spark):
    """RFC6587 octet counting + non-transparent newline framing
    (receiver/syslogreceiver syslog.go:61-71)."""
    from opentelemetry_collector_contrib_spark.sources import (
        split_newline_frames,
        split_octet_frames,
    )

    m1, m2 = "<13>Aug  5 12:00:07 h app: hi", "<14>Aug  5 12:00:08 h app: yo"
    blob = f"{len(m1)} {m1}{len(m2)} {m2}"
    df = spark.createDataFrame(
        [("conn1", blob), ("conn2", "garbage-without-prefix")],
        "stream_id string, data string",
    )
    out = split_octet_frames(df).collect()
    frames = {(r.stream_id, r.frame_idx): r for r in out}
    assert frames[("conn1", 0)].body == m1 and frames[("conn1", 0)].valid
    assert frames[("conn1", 1)].body == m2 and frames[("conn1", 1)].valid
    assert frames[("conn2", 0)].valid is False  # malformed prefix surfaces

    nl = split_newline_frames(
        spark.createDataFrame([("c", f"{m1}\n{m2}\n")], "stream_id string, data string")
    ).collect()
    assert [r.body for r in sorted(nl, key=lambda r: r.frame_idx)] == [m1, m2]


def test_snapshot_table_append_and_incremental(spark, tmp_path):
    tbl = SnapshotTable(str(tmp_path / "t"))
    s1 = tbl.append(spark.range(3).select(F.col("id")))
    s2 = tbl.append(spark.range(10, 12).select(F.col("id")))
    assert (s1, s2) == (1, 2)
    assert tbl.read(spark).count() == 5
    assert tbl.read(spark, snapshot_id=1).count() == 3  # time travel
    inc = tbl.read_incremental(spark, from_snapshot_id=1)
    assert sorted(r["id"] for r in inc.collect()) == [10, 11]


def test_snapshot_table_overwrite_blocks_incremental(spark, tmp_path):
    tbl = SnapshotTable(str(tmp_path / "t2"))
    tbl.append(spark.range(3))
    tbl.overwrite(spark.range(5))
    assert tbl.read(spark).count() == 5
    with pytest.raises(ValueError):
        tbl.read_incremental(spark, from_snapshot_id=1)


def test_file_sink_group_by(spark, tmp_path):
    df = spark.createDataFrame(
        [("a", "x1"), ("b", "x2"), ("a", "x3")], "grp string, v string"
    )
    FileSink(str(tmp_path / "out"), group_by="grp")(df)
    dirs = {d for d in os.listdir(tmp_path / "out") if d.startswith("grp=")}
    assert dirs == {"grp=a", "grp=b"}


def test_write_routed_single_job(spark, tmp_path):
    df = spark.createDataFrame(
        [(1, "sink_a"), (2, "sink_b"), (3, "sink_a")], "id int, route string"
    )
    paths = write_routed(df, str(tmp_path / "routed"))
    assert set(paths) == {"sink_a", "sink_b"}
    a = spark.read.parquet(paths["sink_a"])
    assert sorted(r["id"] for r in a.collect()) == [1, 3]


def _job_count(spark, fn):
    """Spark jobs triggered by fn() (job-group scoped via statusTracker)."""
    import uuid

    sc = spark.sparkContext
    grp = f"jobcount-{uuid.uuid4().hex}"
    sc.setJobGroup(grp, grp)
    try:
        fn()
    finally:
        sc.setJobGroup("", "")
    return len(sc.statusTracker().getJobIdsForGroup(grp))


def test_write_routed_no_second_scan(spark, tmp_path):
    """Sink-name discovery must be a filesystem metadata call, not a
    second .distinct() scan: write_routed triggers exactly as many Spark
    jobs as the bare partitioned write of the same frame."""
    df = spark.createDataFrame(
        [(i, "sink_a" if i % 2 else "sink_b") for i in range(100)],
        "id int, route string",
    )
    bare = _job_count(
        spark,
        lambda: df.write.mode("overwrite")
        .partitionBy("route")
        .parquet(str(tmp_path / "bare")),
    )
    routed = _job_count(
        spark, lambda: write_routed(df, str(tmp_path / "routed"))
    )
    assert routed == bare


def test_lineage_commit_no_recount(spark, tmp_path):
    """CheckpointedWriter.commit must observe the row count during the
    write, not re-run the input DAG with df.count(): commit costs exactly
    one more job than a bare append (the tiny lineage-row write)."""
    sink = SnapshotTable(str(tmp_path / "sink"))
    bare_sink = SnapshotTable(str(tmp_path / "bare"))
    lineage = SnapshotTable(str(tmp_path / "lineage"))
    w = CheckpointedWriter(lineage)
    df = spark.range(50).select(F.col("id"))

    bare = _job_count(spark, lambda: bare_sink.append(df))
    committed = _job_count(spark, lambda: w.commit(sink, df, 0, 1))
    assert committed == bare + 1  # + the one-row lineage append
    row = lineage.read(spark).collect()[0]
    assert row["rows_out"] == 50 and row["status"] == "committed"


def test_checkpointed_resume_idempotent(spark, tmp_path):
    """Kill-rerun produces identical sinks (FIXTURES.md section 8)."""
    inp = SnapshotTable(str(tmp_path / "in"))
    sink = SnapshotTable(str(tmp_path / "sink"))
    lineage = SnapshotTable(str(tmp_path / "lineage"))
    w = CheckpointedWriter(lineage)

    s1 = inp.append(spark.range(5))
    # first run: process snapshot range (0, s1]
    df1 = inp.read_incremental(spark, 0)
    assert w.commit(sink, df1, 0, s1) == 1
    # simulated crash AFTER sink commit, BEFORE next input: rerun the
    # same increment -> no-op (no duplicates)
    assert w.commit(sink, df1, 0, s1) is None
    assert sink.read(spark).count() == 5
    # new input arrives; resume from the sink's own checkpoint
    s2 = inp.append(spark.range(100, 103))
    frm = w.last_processed(sink)
    assert frm == s1
    df2 = inp.read_incremental(spark, frm)
    w.commit(sink, df2, frm, s2)
    assert sink.read(spark).count() == 8
    # lineage table records both commits
    assert lineage.read(spark).count() == 2


def test_otlp_json_write_read_roundtrip(spark, tmp_path):
    """write_otlp_json -> OtlpJsonFileSource round-trips the envelope
    (field mapping parity between exporter and receiver)."""
    import datetime as dt

    from opentelemetry_collector_contrib_spark.sinks import write_otlp_json

    rows = [
        (
            dt.datetime(2024, 1, 1, 0, 0, 0), dt.datetime(2024, 1, 1, 0, 0, 1),
            "kaboom", {"k": "v"}, {"service.name": "svc"}, "ERROR", 17,
            bytes.fromhex("0102030405060708090a0b0c0d0e0f10"),
            bytes.fromhex("0102030405060708"), "lib",
        )
    ]
    ddl = (
        "ts timestamp, observed_ts timestamp, body string, "
        "attributes map<string,string>, resource map<string,string>, "
        "severity_text string, severity_number int, trace_id binary, "
        "span_id binary, scope string"
    )
    df = spark.createDataFrame(rows, ddl)
    out = str(tmp_path / "otlp")
    write_otlp_json(df, out)
    back = OtlpJsonFileSource(f"{out}/*.txt")(spark).collect()[0]
    assert back["body"] == "kaboom"
    assert back["severity_number"] == 17 and back["severity_text"] == "ERROR"
    assert dict(back["attributes"]) == {"k": "v"}
    assert dict(back["resource"]) == {"service.name": "svc"}
    assert back["trace_id"].hex() == "0102030405060708090a0b0c0d0e0f10"
    assert back["span_id"].hex() == "0102030405060708"
    assert back["scope"] == "lib"
    assert back["ts"] == dt.datetime(2024, 1, 1, 0, 0, 0)
    assert back["observed_ts"] == dt.datetime(2024, 1, 1, 0, 0, 1)


def test_load_balance_consistent_hash(spark):
    from opentelemetry_collector_contrib_spark.sinks.writers import load_balance
    from pyspark.sql import functions as F

    df = spark.range(0, 1000).withColumn("key", (F.col("id") % 50).cast("string"))
    out = load_balance(df, n=8, key="key")
    assert out.rdd.getNumPartitions() == 8
    # consistent: every row of one key lands in exactly one partition
    parts = (
        out.withColumn("pid", F.spark_partition_id())
        .groupBy("key")
        .agg(F.countDistinct("pid").alias("n"))
        .filter(F.col("n") > 1)
        .count()
    )
    assert parts == 0


# --- journald input (pkg/stanza/operator/input/journald) --------------------

# the reference's own fake-journalctl response line, verbatim
# (input_test.go:36)
JOURNALD_GOLDEN = (
    '{ "_BOOT_ID": "c4fa36de06824d21835c05ff80c54468", "_CAP_EFFECTIVE": "0", '
    '"_TRANSPORT": "journal", "_UID": "1000", "_EXE": "/usr/lib/systemd/systemd", '
    '"_AUDIT_LOGINUID": "1000", "MESSAGE": "run-docker-netns-4f76d707d45f.mount: Succeeded.", '
    '"_PID": "13894", "_CMDLINE": "/lib/systemd/systemd --user", '
    '"_MACHINE_ID": "d777d00e7caf45fbadedceba3975520d", "_SELINUX_CONTEXT": "unconfined\\n", '
    '"CODE_FUNC": "unit_log_success", "SYSLOG_IDENTIFIER": "systemd", '
    '"_HOSTNAME": "myhostname", "MESSAGE_ID": "7ad2d189f7e94e70a38c781354912448", '
    '"_SYSTEMD_CGROUP": "/user.slice/user-1000.slice/user@1000.service/init.scope", '
    '"_SOURCE_REALTIME_TIMESTAMP": "1587047866229317", '
    '"USER_UNIT": "run-docker-netns-4f76d707d45f.mount", "SYSLOG_FACILITY": "3", '
    '"_SYSTEMD_SLICE": "user-1000.slice", "_AUDIT_SESSION": "286", '
    '"CODE_FILE": "../src/core/unit.c", "_SYSTEMD_USER_UNIT": "init.scope", '
    '"_COMM": "systemd", "USER_INVOCATION_ID": "88f7ca6bbf244dc8828fa901f9fe9be1", '
    '"CODE_LINE": "5487", "_SYSTEMD_INVOCATION_ID": "83f7fc7799064520b26eb6de1630429c", '
    '"PRIORITY": "6", "_GID": "1000", "__REALTIME_TIMESTAMP": "1587047866229555", '
    '"_SYSTEMD_UNIT": "user@1000.service", "_SYSTEMD_USER_SLICE": "-.slice", '
    '"__CURSOR": "s=b1e713b587ae4001a9ca482c4b12c005;i=1eed30;'
    'b=c4fa36de06824d21835c05ff80c54468;m=9f9d630205;t=5a369604ee333;'
    'x=16c2d4fd4fdb7c36", "__MONOTONIC_TIMESTAMP": "685540311557", '
    '"_SYSTEMD_OWNER_UID": "1000" }'
)


def _write_journal(tmp_path, lines):
    p = tmp_path / "journal.jsonl"
    p.write_text("\n".join(lines) + "\n")
    return str(p)


def test_journald_golden_line_parses_like_reference(spark, tmp_path):
    """input_test.go TestInputJournald: timestamp from
    __REALTIME_TIMESTAMP (micros, deleted from body), __CURSOR kept."""
    import datetime as dt

    from opentelemetry_collector_contrib_spark.sources import JournaldSource

    path = _write_journal(tmp_path, [JOURNALD_GOLDEN])
    rows = JournaldSource()(spark, path).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r.valid
    assert r.ts == dt.datetime(2020, 4, 16, 14, 37, 46, 229555)
    assert r.cursor.startswith("s=b1e713b587ae4001a9ca482c4b12c005")
    body = dict(r.body)
    assert "__REALTIME_TIMESTAMP" not in body
    assert body["__CURSOR"] == r.cursor  # stays in body (input.go:194)
    assert body["MESSAGE"] == "run-docker-netns-4f76d707d45f.mount: Succeeded."
    assert body["PRIORITY"] == "6"
    assert len(body) == 34  # every field except the deleted timestamp


def test_journald_filters_match_journalctl_args(spark, tmp_path):
    from opentelemetry_collector_contrib_spark.sources import JournaldSource

    mk = (
        '{{"__CURSOR": "c{i}", "__REALTIME_TIMESTAMP": "160000000000{i}", '
        '"PRIORITY": "{p}", "_SYSTEMD_UNIT": "{u}", "MESSAGE": "{m}", '
        '"SYSLOG_IDENTIFIER": "{ident}", "_TRANSPORT": "{tr}"}}'
    )
    lines = [
        mk.format(i=0, p=6, u="ssh.service", m="accepted key", ident="sshd", tr="journal"),
        mk.format(i=1, p=7, u="ssh.service", m="debug detail", ident="sshd", tr="journal"),
        mk.format(i=2, p=3, u="cron.service", m="job failed", ident="cron", tr="journal"),
        mk.format(i=3, p=2, u="kernel", m="oops", ident="kernel", tr="kernel"),
    ]
    path = _write_journal(tmp_path, lines)
    src = JournaldSource  # alias

    # default priority=info drops the debug row (journalctl -p info)
    assert {r.cursor for r in src()(spark, path).collect()} == {"c0", "c2", "c3"}
    # units filter (-u ssh.service)
    assert {r.cursor for r in src(units=["ssh.service"])(spark, path).collect()} == {"c0"}
    # identifiers (-t cron)
    assert {r.cursor for r in src(identifiers=["cron"])(spark, path).collect()} == {"c2"}
    # grep (-g) on MESSAGE
    assert {r.cursor for r in src(grep="fail")(spark, path).collect()} == {"c2"}
    # dmesg -> _TRANSPORT=kernel
    assert {r.cursor for r in src(dmesg=True)(spark, path).collect()} == {"c3"}
    # matches: OR across configs, AND within one config
    m = src(matches=[
        {"_SYSTEMD_UNIT": "ssh.service", "PRIORITY": "6"},
        {"_SYSTEMD_UNIT": "cron.service"},
    ])
    assert {r.cursor for r in m(spark, path).collect()} == {"c0", "c2"}
    # priority=err keeps only err-and-worse
    assert {r.cursor for r in src(priority="err")(spark, path).collect()} == {"c2", "c3"}
    import pytest as _pytest
    with _pytest.raises(ValueError):
        src(priority="verbose")


def test_journald_invalid_lines_flagged_not_dropped(spark, tmp_path):
    from opentelemetry_collector_contrib_spark.sources import JournaldSource

    lines = [
        '{"__CURSOR": "c0", "__REALTIME_TIMESTAMP": "1600000000000000", "PRIORITY": "5", "MESSAGE": "ok"}',
        '{"__REALTIME_TIMESTAMP": "1600000000000001", "PRIORITY": "5", "MESSAGE": "no cursor"}',
        'not json at all',
    ]
    path = _write_journal(tmp_path, lines)
    rows = JournaldSource()(spark, path).collect()
    by_valid = {}
    for r in rows:
        by_valid.setdefault(r.valid, []).append(r)
    assert len(by_valid[True]) == 1 and by_valid[True][0].cursor == "c0"
    assert len(by_valid[False]) == 2  # parse errors surfaced, not silently lost


# --- stdin / namedpipe inputs (pkg/stanza/operator/input/{stdin,namedpipe}) --


def test_stdin_one_entry_per_line_empties_kept(spark, tmp_path):
    """stdin input.go:56-65: scanner.Text() per line, newline stripped,
    empty lines emitted (no empty-skip in the stdin loop)."""
    from opentelemetry_collector_contrib_spark.sources import StdinSource

    p = tmp_path / "stdin.capture"
    p.write_text("first\n\n  indented\nlast no newline")
    rows = sorted(
        StdinSource()(spark, str(p)).collect(), key=lambda r: r.line_idx
    )
    # positions must be the real 0..n line numbers, not accidental zeros
    assert [(r.line_idx, r.body) for r in rows] == [
        (0, "first"), (1, ""), (2, "  indented"), (3, "last no newline"),
    ]


def test_namedpipe_trim_empty_skip_and_order(spark, tmp_path):
    """namedpipe input.go:113-131: newline split, default both-side
    whitespace trim (trim.go Whitespace), empty tokens skipped."""
    from opentelemetry_collector_contrib_spark.sources import NamedPipeSource

    p = tmp_path / "pipe.capture"
    p.write_bytes(b"  padded  \r\n\t\r\nplain\ntrailing tab\t\n")
    rows = sorted(
        NamedPipeSource()(spark, str(p)).collect(), key=lambda r: r.line_idx
    )
    # "\t" line trims to empty -> skipped, like the reference loop
    assert [(r.body, r.valid) for r in rows] == [
        ("padded", True), ("plain", True), ("trailing tab", True),
    ]


def test_namedpipe_preserve_flags_and_encoding(spark, tmp_path):
    from opentelemetry_collector_contrib_spark.sources import NamedPipeSource

    p = tmp_path / "latin.capture"
    p.write_bytes(" caf\xe9 \n".encode("latin-1"))
    src = NamedPipeSource(
        encoding="iso-8859-1", preserve_leading=True, preserve_trailing=True
    )
    rows = src(spark, str(p)).collect()
    assert [r.body for r in rows] == [" caf\xe9 "]


def test_namedpipe_max_log_size_kills_capture_tail(spark, tmp_path):
    """An oversized token ends the reference scanner (ErrTooLong):
    the oversized row surfaces with valid=false and nothing after it in
    that capture is emitted; other captures are unaffected."""
    from opentelemetry_collector_contrib_spark.sources import NamedPipeSource

    a = tmp_path / "a.capture"
    a.write_bytes(b"ok1\n" + b"X" * 50 + b"\nnever-seen\n")
    b = tmp_path / "b.capture"
    b.write_bytes(b"other\n")
    rows = NamedPipeSource(max_log_size=10)(
        spark, [str(a), str(b)]
    ).collect()
    by_cap = {}
    for r in rows:
        by_cap.setdefault(r.capture.rsplit("/", 1)[-1], []).append(
            (r.line_idx, r.body[:4], r.valid)
        )
    assert sorted(by_cap["a.capture"]) == [(0, "ok1", True), (1, "XXXX", False)]
    assert by_cap["b.capture"] == [(0, "othe", True)]


# --- Iceberg-posture table sink (fallback layout) ---------------------------


def test_table_sink_fallback_layout_and_dynamic_overwrite(spark, tmp_path):
    """Without the iceberg runtime (this sandbox), TableSink writes the
    SAME partition layout as the intended Iceberg spec (days(ts) + the
    identity sink column) and 'replace' only rewrites the partitions
    present in the incoming frame (dynamic overwrite = the idempotent
    re-run posture)."""
    import datetime as dt
    import os

    from opentelemetry_collector_contrib_spark.sinks import (
        TableSink,
        has_iceberg,
    )

    assert not has_iceberg(spark)  # sandbox has no runtime jar
    path = str(tmp_path / "tbl")
    rows = [
        (dt.datetime(2026, 1, 1, 10), "a", "r1"),
        (dt.datetime(2026, 1, 2, 10), "b", "r2"),
    ]
    df = spark.createDataFrame(rows, "ts timestamp, sink string, v string")
    TableSink(path, partition_by=["sink"], mode="append")(df)
    days = {d for d in os.listdir(path) if d.startswith("ts_day=")}
    assert days == {"ts_day=2026-01-01", "ts_day=2026-01-02"}
    assert os.path.isdir(f"{path}/ts_day=2026-01-01/sink=a")

    # replace only the day-2 partition; day-1 data must survive
    df2 = spark.createDataFrame(
        [(dt.datetime(2026, 1, 2, 11), "b", "r2-fixed")],
        "ts timestamp, sink string, v string",
    )
    TableSink(path, partition_by=["sink"], mode="replace")(df2)
    out = {r.v for r in spark.read.parquet(path).collect()}
    assert out == {"r1", "r2-fixed"}


def test_round_robin_equal_split_no_shuffle(spark):
    from opentelemetry_collector_contrib_spark.sinks import round_robin

    df = spark.range(9000).repartition(3)
    tagged = round_robin(df, 3)
    # equal split: per-partition cycling leaves at most 1 row/partition
    # of imbalance (roundrobinconnector: consume calls alternate)
    counts = {
        r["sink_idx"]: r["n"]
        for r in tagged.groupBy("sink_idx").count().withColumnRenamed("count", "n").collect()
    }
    assert set(counts) == {0, 1, 2}
    assert max(counts.values()) - min(counts.values()) <= 3  # <=1 per partition
    # distribution is a projection: no exchange beyond the setup repartition
    plan = tagged._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1  # only the explicit repartition(3)
    # deterministic for a fixed partitioning
    a = sorted((r["id"], r["sink_idx"]) for r in tagged.collect())
    b = sorted((r["id"], r["sink_idx"]) for r in round_robin(df, 3).collect())
    assert a == b


def test_failover_sink_priority_walk(spark, tmp_path):
    from opentelemetry_collector_contrib_spark.sinks import FailoverSink, FileSink

    df = spark.range(10)
    ok_path = tmp_path / "primary"
    calls = []

    def broken(_df):
        calls.append("broken")
        raise IOError("sink down")

    def healthy(d):
        calls.append("healthy")
        FileSink(str(ok_path))(d)

    fo = FailoverSink(levels=[[broken], [healthy]])
    assert fo(df) == 1  # served by the second priority level
    assert spark.read.parquet(str(ok_path)).count() == 10
    # next invocation starts from the top again (retry of stable level)
    assert fo(df) == 1
    assert calls == ["broken", "healthy", "broken", "healthy"]


def test_failover_sink_max_retries_pins_level(spark, tmp_path):
    from opentelemetry_collector_contrib_spark.sinks import FailoverSink

    df = spark.range(1)
    tries = []

    def broken(_df):
        tries.append(1)
        raise IOError("down")

    def ok(_df):
        pass

    fo = FailoverSink(levels=[[broken], [ok]], max_retries=2)
    assert fo(df) == 1 and fo(df) == 1 and fo(df) == 1
    assert len(tries) == 2  # third call skipped the pinned level


def test_failover_all_levels_fail(spark):
    from opentelemetry_collector_contrib_spark.sinks import FailoverSink

    def broken(_df):
        raise IOError("down")

    fo = FailoverSink(levels=[[broken]])
    import pytest as _pytest

    with _pytest.raises(RuntimeError, match="all failover levels"):
        fo(spark.range(1))


def test_failover_level_fanout_partial_failure(spark, tmp_path):
    from opentelemetry_collector_contrib_spark.sinks import FailoverSink, FileSink

    # a level is a FANOUT list: any member failing makes the whole level
    # unhealthy and the batch falls through
    def broken(_df):
        raise IOError("down")

    good = FileSink(str(tmp_path / "l0"))
    fallback = FileSink(str(tmp_path / "l1"))
    fo = FailoverSink(levels=[[good, broken], [fallback]])
    assert fo(spark.range(5)) == 1
    assert spark.read.parquet(str(tmp_path / "l1")).count() == 5


def test_bucketed_table_join_has_no_exchange(spark, tmp_path):
    from opentelemetry_collector_contrib_spark.sinks.writers import (
        write_bucketed_table,
    )

    df = spark.range(5000).selectExpr("id AS doc_id", "id % 7 AS v")
    write_bucketed_table(df, "bk_a", "doc_id", str(tmp_path / "a"), n_buckets=8)
    write_bucketed_table(df, "bk_b", "doc_id", str(tmp_path / "b"), n_buckets=8)
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = spark.table("bk_a").join(spark.table("bk_b"), "doc_id")
        plan = j._jdf.queryExecution().executedPlan().toString()
        # co-located: the bucket layout replaces BOTH shuffle exchanges
        assert plan.count("Exchange") == 0
        assert j.count() == 5000
        # groupBy on the bucket key is shuffle-free too
        g = spark.table("bk_a").groupBy("doc_id").count()
        assert g._jdf.queryExecution().executedPlan().toString().count("Exchange") == 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        spark.sql("DROP TABLE IF EXISTS bk_a")
        spark.sql("DROP TABLE IF EXISTS bk_b")
