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
        # editor path with a missing-key read in the value
        step = compile_statement('set(body, attributes["k"])')
        out = {r.attributes.get("k"): r.body for r in step(df).collect()}
        assert out == {"v": "v", None: None}


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
