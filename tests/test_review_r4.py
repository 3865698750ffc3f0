"""Regression tests for the round-4 self-review findings: null-safety
in exact_dedup's semi-join and the spanevent regroup key, ANSI-safe
OTTL map/index access, settable time twins, and detector purity."""

from __future__ import annotations

from contextlib import contextmanager

from pyspark.sql import functions as F


@contextmanager
def _ansi(spark):
    old = spark.conf.get("spark.sql.ansi.enabled")
    spark.conf.set("spark.sql.ansi.enabled", "true")
    try:
        yield
    finally:
        spark.conf.set("spark.sql.ansi.enabled", old)


def test_exact_dedup_keeps_one_null_text_row(spark):
    # md5(null) is null; the groupBy groups the null class, and the
    # null-SAFE semi-join keeps its winner (a plain == join dropped
    # every null-text row)
    from opentelemetry_collector_contrib_spark.training import exact_dedup

    df = spark.createDataFrame(
        [(1, None), (2, None), (3, "a"), (4, "a")],
        "doc_id long, text string",
    )
    got = sorted(r.doc_id for r in exact_dedup(df).collect())
    assert got == [1, 3]


def test_ottl_map_access_missing_key_ansi_on(spark):
    # reference OTTL: a missing map key is nil, not an error; ANSI
    # element_at throws MAP_KEY_DOES_NOT_EXIST — the resolver must use
    # the try_ variant. Materialization matters: count() prunes the
    # projection and proves nothing.
    from opentelemetry_collector_contrib_spark.functions.ottl import (
        compile_condition,
        compile_statement,
    )

    df = spark.createDataFrame(
        [("x", {"k": "v"}), ("y", {"other": "w"})],
        "body string, attributes map<string,string>",
    )
    with _ansi(spark):
        cond = compile_condition('attributes["k"] == "v"', df)
        rows = df.withColumn("m", cond).collect()
        assert [r.m for r in rows] == [True, None]
        # editor path with a missing-key read in the value: the read is
        # nil (no ANSI throw) and set(nil) is a NO-OP (func_set.go), so
        # the unmatched row keeps its original body
        step = compile_statement('set(body, attributes["k"])')
        out = {r.attributes.get("k"): r.body for r in step(df).collect()}
        assert out == {"v": "v", None: "y"}


def test_ottl_list_index_out_of_range_ansi_on(spark):
    from opentelemetry_collector_contrib_spark.functions.ottl import (
        compile_condition,
    )

    df = spark.createDataFrame(
        [(["a"],), ([],)], "items array<string>"
    )
    with _ansi(spark):
        cond = compile_condition('items[5] == "a"', df)
        assert [r.m for r in df.withColumn("m", cond).collect()] == [None, None]


def test_ottl_set_time_unix_nano_updates_ts(spark):
    from opentelemetry_collector_contrib_spark.functions.ottl import (
        compile_statement,
    )

    df = spark.createDataFrame(
        [("x",)], "body string"
    ).withColumn("ts", F.timestamp_seconds(F.lit(1_600_000_000)))
    step = compile_statement("set(time_unix_nano, 1700000000123456000)")
    out = step(df)
    assert "time_unix_nano" not in out.columns  # no stray column
    r = out.collect()[0]
    micros = int(r.ts.timestamp() * 1_000_000)
    assert micros == 1_700_000_000_123_456
    # round-trip through the read path
    back = out.select(
        (F.unix_micros(F.col("ts")) * F.lit(1000).cast("long")).alias("n")
    ).collect()[0]
    assert back.n == 1_700_000_000_123_456_000


def test_spanevent_null_ids_do_not_fuse(spark):
    # ('x', null) and (null, 'x') are DIFFERENT spans: concat_ws alone
    # would key both as 'x' and the regroup would merge them
    from opentelemetry_collector_contrib_spark.processors.spanevents import (
        spanevent_frame,
        regroup_events,
    )

    spans = spark.createDataFrame(
        [
            ("x", None, "s1", [("e1", {"a": "1"})]),
            (None, "x", "s2", [("e2", {"a": "2"})]),
            (None, None, "s3", [("e3", {"a": "3"})]),
            (None, None, "s4", [("e4", {"a": "4"})]),
        ],
        "trace_id string, span_id string, name string, "
        "events array<struct<name string, attributes map<string,string>>>",
    )
    frame, ev_fields = spanevent_frame(spans)
    out = regroup_events(frame, spans, ev_fields)
    rows = out.collect()
    assert len(rows) == 4  # no fused spans
    by_name = {r.name: [e.name for e in r.events] for r in rows}
    assert by_name == {"s1": ["e1"], "s2": ["e2"], "s3": ["e3"], "s4": ["e4"]}


def test_lambda_detector_ignores_host_environ(monkeypatch):
    from opentelemetry_collector_contrib_spark.processors.resourcedetection import (
        _detect_lambda,
    )

    monkeypatch.setenv("AWS_LAMBDA_FUNCTION_NAME", "host-fn")
    monkeypatch.setenv("AWS_REGION", "host-region")
    # empty capture -> empty resource even when the DRIVER host has
    # lambda-looking env vars (detector_configs is the only input)
    assert _detect_lambda({}) == {}
    got = _detect_lambda({"AWS_LAMBDA_FUNCTION_NAME": "fn"})
    assert got["faas.name"] == "fn"
    assert "cloud.region" not in got  # host AWS_REGION not leaked


def test_gcp_missing_platform_provider_only():
    from opentelemetry_collector_contrib_spark.processors.resourcedetection import (
        _detect_gcp,
    )

    # gcp.go switch default: unknown/missing platform -> provider +
    # project only, no gce attribute set
    assert _detect_gcp({"project_id": "p", "zone": "us-central1-c"}) == {
        "cloud.provider": "gcp",
        "cloud.account.id": "p",
    }


def test_map_access_missing_keys_ansi_on_across_processors(spark):
    # the package-wide try_element_at wrapper: map reads with literal
    # keys yield null (reference nil) for ABSENT keys under ANSI-on
    # sessions, across representative processor/connector/source paths
    from opentelemetry_collector_contrib_spark.connectors.count import (
        CountConnector,
        MetricDef,
    )
    from opentelemetry_collector_contrib_spark.envelope import field_get

    df = spark.createDataFrame(
        [("b1", {"present": "x"})],
        "body string, attributes map<string,string>",
    )
    with _ansi(spark):
        r = df.select(field_get('attributes["missing"]').alias("v")).collect()[0]
        assert r.v is None
        # missing attr, no default -> row excluded (counter.go:70-73),
        # evaluated WITHOUT an ANSI key error
        assert (
            CountConnector(
                metrics=[MetricDef(name="m", attributes=[("missing", None)])]
            )(df).collect()
            == []
        )
        # with a default the row counts under it
        counted = CountConnector(
            metrics=[MetricDef(name="m", attributes=[("missing", "dflt")])]
        )(df).collect()
        assert len(counted) == 1 and counted[0]["count"] == 1


def test_metrics_snapshot_skips_unrun_stage_without_blocking(spark):
    # Observation.get BLOCKS until the frame's first action; snapshot
    # must skip never-run stages via the non-blocking JVM accessor
    import time as _time

    from opentelemetry_collector_contrib_spark.metrics import MetricsCollector

    mc = MetricsCollector(run_id="r")
    ran = mc.observe(spark.range(10).toDF("n"), "ran")
    mc.observe(spark.range(10).toDF("n"), "never_ran")  # no action ever
    ran.count()
    t0 = _time.monotonic()
    snap = {(r.stage, r.metric): r.value for r in mc.snapshot(spark).collect()}
    assert _time.monotonic() - t0 < 30  # no indefinite block
    assert snap[("ran", "rows")] == 10.0
    assert not any(stage == "never_ran" for stage, _ in snap)


def test_windowed_counts_and_session_recombine_accept_ntz(spark, tmp_path):
    # parquet event times read as TIMESTAMP_NTZ; all watermark entry
    # points must cast before withWatermark or they throw
    # EVENT_TIME_IS_NOT_ON_TIMESTAMP_TYPE
    from opentelemetry_collector_contrib_spark.streaming import (
        session_recombine,
        windowed_counts,
    )

    # second row 2 days later: advances the watermark past the first
    # row's window/session so append mode actually emits it
    df = spark.createDataFrame(
        [
            ("c1", 0, "hello", "user", "sink_a", 1_700_000_000),
            ("c9", 0, "later", "user", "sink_a", 1_700_172_800),
        ],
        "conv_id string, turn_idx int, text string, role string, "
        "route string, epoch long",
    ).withColumn(
        "ts", F.timestamp_seconds(F.col("epoch")).cast("timestamp_ntz")
    ).drop("epoch")
    src = str(tmp_path / "ntz_in")
    df.write.parquet(src)
    stream = spark.readStream.schema(df.schema).parquet(src)
    assert dict(stream.dtypes)["ts"] == "timestamp_ntz"
    for name, frame in (
        ("wc", windowed_counts(stream)),
        ("sr", session_recombine(stream)),
    ):
        q = (
            frame.writeStream.format("memory")
            .queryName(f"ntz_{name}")
            .outputMode("append")
            .trigger(availableNow=True)
            .option("checkpointLocation", str(tmp_path / f"ck_{name}"))
            .start()
        )
        q.awaitTermination(120)
    wc = [r for r in spark.sql("select * from ntz_wc").collect() if r.role == "user"]
    assert wc and wc[0]["count"] == 1
    sr = {r.conv_id: r.text for r in spark.sql("select * from ntz_sr").collect()}
    assert sr.get("c1") == "hello"


def test_lineage_partial_overlap_raises(spark, tmp_path):
    import pytest

    from opentelemetry_collector_contrib_spark.lineage import CheckpointedWriter
    from opentelemetry_collector_contrib_spark.sources.table import SnapshotTable

    sink = SnapshotTable(str(tmp_path / "sink"))
    lin = SnapshotTable(str(tmp_path / "lin"))
    w = CheckpointedWriter(lineage=lin)
    df = spark.range(5).toDF("n")
    assert w.commit(sink, df, 0, 5) is not None
    # full rerun: no-op
    assert w.commit(sink, df, 0, 5) is None
    # PARTIAL overlap (0, 7] vs committed (.., 5]: must refuse, not
    # double-append snapshots 1-5
    with pytest.raises(ValueError, match="overlaps"):
        w.commit(sink, df, 0, 7)
    # clean continuation from last_processed is fine
    assert w.commit(sink, df, 5, 7) is not None


def test_write_routed_append_reports_only_this_run(spark, tmp_path):
    from opentelemetry_collector_contrib_spark.sinks.writers import write_routed

    base = str(tmp_path / "routed")
    df1 = spark.createDataFrame(
        [("x", "sink_a"), ("y", "sink_b")], "body string, route string"
    )
    got1 = write_routed(df1, base)  # overwrite: listing is authoritative
    assert set(got1) == {"sink_a", "sink_b"}
    df2 = spark.createDataFrame([("z", "sink_a")], "body string, route string")
    got2 = write_routed(df2, base, mode="append")
    # append: sink_b's directory still exists on disk but was NOT
    # written by this run — the returned dict must not claim it
    assert set(got2) == {"sink_a"}


def test_stateful_delta_to_cumulative_long_keys(spark, tmp_path):
    # key columns keep their input types (hardcoded string schema broke
    # int64 keys at the Arrow boundary)
    from opentelemetry_collector_contrib_spark.streaming.stateful import (
        stateful_delta_to_cumulative,
    )

    df = spark.createDataFrame(
        [(7, 1.0), (7, 2.0), (8, 5.0)], "metric_id long, value double"
    ).withColumn("ts", F.timestamp_seconds(F.lit(1_700_000_000)))
    src = str(tmp_path / "keys_in")
    df.write.parquet(src)
    stream = spark.readStream.schema(spark.read.parquet(src).schema).parquet(src)
    out = stateful_delta_to_cumulative(stream, stream_keys=["metric_id"])
    q = (
        out.writeStream.format("memory")
        .queryName("long_keys")
        .outputMode("append")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ck_lk"))
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql("select * from long_keys").collect()
    assert {r.metric_id for r in rows} == {7, 8}
    assert max(r.cumulative for r in rows if r.metric_id == 7) == 3.0


def test_routing_editor_scoped_to_matched_route(spark):
    # reference routingconnector logs.go: match_once BREAKS after the
    # first matching statement — a later route's editor must not mutate
    # a row an earlier route claimed, even when its condition also holds
    from opentelemetry_collector_contrib_spark.connectors.routing import (
        Route,
        RoutingConnector,
    )

    df = spark.createDataFrame(
        [("both", {"secret": "x", "kind": "both"}),
         ("second_only", {"secret": "y", "kind": "second"})],
        "body string, attributes map<string,string>",
    )
    table = [
        Route("attributes['kind'] = 'both'", ["s1"]),
        Route(
            "attributes['kind'] IN ('both', 'second')",
            ["s2"],
            editor="delete_key(attributes, \"secret\") "
            "where attributes[\"kind\"] != \"nope\"",
        ),
    ]
    out = {r.body: r for r in RoutingConnector(table)(df).collect()}
    # first row matched route 1 first: its secret survives
    assert out["both"].route == "s1"
    assert dict(out["both"].attributes).get("secret") == "x"
    # second row matched route 2: the editor fires
    assert out["second_only"].route == "s2"
    assert "secret" not in dict(out["second_only"].attributes)
    # multi-match: BOTH routes matched the first row -> cumulative
    # mutations on each copy (reference applies every matching
    # statement's editor to the delivered group)
    multi = RoutingConnector(table, match_once=False)(df)
    copies = [r for r in multi.collect() if r.body == "both"]
    assert {r.route for r in copies} == {"s1", "s2"}
    assert all("secret" not in dict(r.attributes) for r in copies)


def test_filelog_multiline_respects_encoding(spark, tmp_path):
    # the multiline branch used to re-read as UTF-8 wholetext, turning
    # latin-1 bytes into mojibake and discarding the decode path
    from opentelemetry_collector_contrib_spark.sources.filelog import (
        FileLogSource,
    )

    p = tmp_path / "ml.log"
    p.write_bytes("2024 héllo\n  suite à\n2024 next\n".encode("latin-1"))
    out = FileLogSource(
        str(p), encoding="iso-8859-1", line_start_pattern=r"^2024"
    )(spark)
    bodies = sorted(r.body for r in out.collect())
    assert bodies == ["2024 héllo\n  suite à", "2024 next"]


def test_crlf_last_line_has_no_stray_cr(spark, tmp_path):
    from opentelemetry_collector_contrib_spark.sources.filelog import (
        FileLogSource,
    )

    p = tmp_path / "crlf.log"
    p.write_bytes(b"a\r\nb\r\n")
    bodies = sorted(r.body for r in FileLogSource(str(p), encoding="iso-8859-1")(spark).collect())
    assert bodies == ["a", "b"]  # no trailing \r on the last line


def test_connected_components_nonconvergence_raises(spark):
    import pytest

    from opentelemetry_collector_contrib_spark.training.dedup import (
        connected_components,
    )

    n = 12  # path graph: diameter 11 > max_iter 3
    docs = spark.createDataFrame([(i,) for i in range(n)], "doc_id long")
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], "a_id long, b_id long"
    )
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(docs, pairs, max_iter=3).collect()
    # enough rounds: one cluster labeled 0
    ok = connected_components(docs, pairs, max_iter=n + 2).collect()
    assert {r.cluster_id for r in ok} == {0}


def test_spanmetrics_histogram_keys_on_service(spark):
    from opentelemetry_collector_contrib_spark.connectors.spanmetrics import (
        SpanMetricsConnector,
    )

    df = spark.createDataFrame(
        [("svc_a", "op", "SERVER", "OK", 120.0),
         ("svc_b", "op", "SERVER", "OK", 120.0)],
        "service_name string, span_name string, span_kind string, "
        "status_code string, dur_ms double",
    )
    out = SpanMetricsConnector(duration_col="dur_ms")(df).collect()
    # same duration bucket but DIFFERENT services -> two series, like
    # calls(): both metrics key on the reference buildKey
    assert len(out) == 2
    assert {r.service_name for r in out} == {"svc_a", "svc_b"}
