"""Regression tests for the fourth self-review pass (operators/ +
functions/): duplicate-map-key crashes, parse-failure data loss, ANSI
cast kills, escape-order corruption, and regex translation gaps."""

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


def test_kv_lenient_duplicate_keys_last_wins(spark):
    # 'a=1 b=2 a=3': map_from_arrays threw DUPLICATED_MAP_KEY and
    # killed the batch; the Go map overwrites — last value wins
    from opentelemetry_collector_contrib_spark.operators.parsers import (
        KeyValueParser,
    )

    df = spark.createDataFrame(
        [("a=1 b=2 a=3", {})], "body string, attributes map<string,string>"
    )
    r = KeyValueParser(parse_to="attributes")(df).collect()[0]
    assert dict(r.attributes) == {"a": "3", "b": "2"}


def test_kv_strict_duplicate_keys_last_wins(spark):
    from opentelemetry_collector_contrib_spark.operators.parsers import (
        KeyValueParser,
    )

    df = spark.createDataFrame(
        [("a=1,b=2,a=3", {})], "body string, attributes map<string,string>"
    )
    r = KeyValueParser(mode="strict", pair_delimiter=",", parse_to="attributes")(
        df
    ).collect()[0]
    assert dict(r.attributes) == {"a": "3", "b": "2"}


def test_kv_strict_value_semantics_match_str_to_map(spark):
    # the manual split keeps str_to_map's shape: value = rest after the
    # FIRST kv delim; a token with no delim maps to a null value,
    # exactly like str_to_map
    from opentelemetry_collector_contrib_spark.operators.parsers import (
        KeyValueParser,
    )

    df = spark.createDataFrame(
        [("a=1=x,b", {})], "body string, attributes map<string,string>"
    )
    r = KeyValueParser(mode="strict", pair_delimiter=",", parse_to="attributes")(
        df
    ).collect()[0]
    assert dict(r.attributes) == {"a": "1=x", "b": None}


def test_parse_csv_converter_short_row_is_nil(spark):
    from opentelemetry_collector_contrib_spark.functions.ottl import (
        compile_statement,
    )

    df = spark.createDataFrame(
        [("a,b,c",), ("a,b",)], "body string"
    ).withColumn("attributes", F.from_json(F.lit("{}"), "map<string,string>"))
    step = compile_statement('set(attributes, ParseCSV(body, "h1,h2,h3"))')
    rows = {r.body: r.attributes for r in step(df).collect()}
    assert dict(rows["a,b,c"]) == {"h1": "a", "h2": "b", "h3": "c"}
    # short row: nil parse, set(nil) keeps the original map — NOT a
    # MapData-length SparkRuntimeException
    assert dict(rows["a,b"]) == {}


def test_parse_key_value_converter_duplicate_keys(spark):
    from opentelemetry_collector_contrib_spark.functions.ottl import (
        compile_statement,
    )

    df = spark.createDataFrame([("a=1 a=2",)], "body string").withColumn(
        "attributes", F.from_json(F.lit("{}"), "map<string,string>")
    )
    step = compile_statement("set(attributes, ParseKeyValue(body))")
    r = step(df).collect()[0]
    assert dict(r.attributes) == {"a": "2"}


def test_regex_parser_send_failure_keeps_existing_attributes(spark):
    # stanza 'send' forwards the entry UNMODIFIED on parse error — the
    # group-name keys of the pre-existing map must survive
    from opentelemetry_collector_contrib_spark.operators.parsers import (
        RegexParser,
    )

    df = spark.createDataFrame(
        [("no digits here", {"code": "KEEP", "other": "o"})],
        "body string, attributes map<string,string>",
    )
    r = RegexParser(r"(?P<code>\d+)", parse_to="attributes", on_error="send")(
        df
    ).collect()[0]
    assert dict(r.attributes) == {"code": "KEEP", "other": "o"}


def test_filter_drop_ratio_works_on_map_columns(spark):
    # xxhash64 rejects MAP columns; the sampler must serialize them
    from opentelemetry_collector_contrib_spark.operators.transformers import (
        Filter,
    )

    df = spark.createDataFrame(
        [(f"b{i}", {"k": str(i)}) for i in range(100)],
        "body string, attributes map<string,string>",
    )
    out = Filter("body like 'b%'", drop_ratio=0.5)(df)
    n = out.count()
    assert 0 < n < 100  # some dropped, deterministically
    assert out.count() == n  # rerun-idempotent


def test_time_parser_epoch_non_numeric_ansi_on(spark):
    from opentelemetry_collector_contrib_spark.operators.parsers import (
        TimeParser,
    )

    df = spark.createDataFrame(
        [("1700000000",), ("notanumber",)], "body string"
    )
    with _ansi(spark):
        out = TimeParser(layout="s", layout_type="epoch", on_error="send")(df)
        rows = {r.body: r.ts for r in out.collect()}
        assert rows["1700000000"] is not None
        assert rows["notanumber"] is None  # per-row parse error, no crash


def test_time_parser_iso_fast_path_rejects_wrong_shape(spark):
    from opentelemetry_collector_contrib_spark.operators.parsers import (
        TimeParser,
    )

    df = spark.createDataFrame(
        [("2024-01-01T05:00:00",), ("2024-01-01",), ("2024-01-01 05:00:00+09:00",)],
        "body string",
    )
    out = TimeParser(layout="%Y-%m-%dT%H:%M:%S", on_error="send")(df)
    rows = {r.body: r.ts for r in out.collect()}
    assert rows["2024-01-01T05:00:00"] is not None
    # inputs the LAYOUT does not accept are parse errors, even though a
    # bare timestamp cast would accept them
    assert rows["2024-01-01"] is None
    assert rows["2024-01-01 05:00:00+09:00"] is None


def test_append_with_where_on_scalar_map_value(spark):
    from opentelemetry_collector_contrib_spark.functions.ottl import (
        compile_statement,
    )

    df = spark.createDataFrame(
        [("b", {"x": "v"}), ("other", {"x": "w"})],
        "body string, attributes map<string,string>",
    )
    step = compile_statement('append(attributes["x"], "extra") where body == "b"')
    rows = {r.body: dict(r.attributes) for r in step(df).collect()}
    # matched row: scalar lifted to array then appended (stringified map value)
    assert "extra" in rows["b"]["x"] and "v" in rows["b"]["x"]
    assert rows["other"]["x"] == "w"  # unmatched row untouched


def test_string_literal_backslash_then_n(spark):
    # r'C:\\new' in OTTL is an escaped backslash + 'new', NOT a newline
    from opentelemetry_collector_contrib_spark.functions.ast import (
        parse_statement,
    )

    st = parse_statement(r'set(attributes["p"], "C:\\new")')
    assert st.editor.args[1].value == "C:\\new"
    st2 = parse_statement(r'set(attributes["p"], "a\nb")')
    assert st2.editor.args[1].value == "a\nb"


def test_extract_patterns_lookbehind(spark):
    from opentelemetry_collector_contrib_spark.functions.ottl import (
        compile_statement,
    )

    df = spark.createDataFrame([("[INFO] boot",)], "body string").withColumn(
        "attributes", F.from_json(F.lit("{}"), "map<string,string>")
    )
    step = compile_statement(
        'set(attributes, ExtractPatterns(body, "(?<=\\\\[)(?<level>\\\\w+)"))'
    )
    r = step(df).collect()[0]
    assert dict(r.attributes) == {"level": "INFO"}


def test_rfc5424_multi_element_structured_data(spark):
    from opentelemetry_collector_contrib_spark.operators.parsers import (
        SyslogParser,
    )

    line = (
        '<34>1 2003-10-11T22:14:15 host app 1 ID1 '
        '[ex a="1"][ex2 b="2"] hi'
    )
    df = spark.createDataFrame([(line,)], "body string")
    r = SyslogParser(protocol="rfc5424")(df).collect()[0]
    assert r.structured_data == '[ex a="1"][ex2 b="2"]'
    assert r.message == "hi"
    assert dict(r.structured_data_map) == {"a": "1", "b": "2"}


def test_attributes_extract_nonmatch_keeps_current(spark):
    from opentelemetry_collector_contrib_spark.processors.attributes import (
        Action,
        AttributesProcessor,
    )

    df = spark.createDataFrame(
        [("u-7 login", "old7"), ("no match", "old8")],
        "body string, user string",
    )
    proc = AttributesProcessor(
        [Action(action="extract", key="body", pattern=r"(?P<user>u-\d+)")]
    )
    rows = {r.body: r.user for r in proc(df).collect()}
    assert rows["u-7 login"] == "u-7"
    # non-matching row keeps its pre-existing value (attraction.go
    # extractAttributes returns without modifying)
    assert rows["no match"] == "old8"


def test_attributes_extract_lookbehind_pattern(spark):
    from opentelemetry_collector_contrib_spark.processors.attributes import (
        Action,
        AttributesProcessor,
    )

    df = spark.createDataFrame([("id=42 rest",)], "body string")
    proc = AttributesProcessor(
        [Action(action="extract", key="body", pattern=r"(?<=id=)(?P<id>\d+)")]
    )
    assert proc(df).collect()[0].id == "42"


def test_attributes_hash_null_boolean_stays_null(spark):
    from opentelemetry_collector_contrib_spark.processors.attributes import (
        sha256_typed,
    )

    df = spark.createDataFrame(
        [(True,), (False,), (None,)], "flag boolean"
    )
    rows = [
        r.h for r in df.select(sha256_typed(F.col("flag"), "boolean").alias("h")).collect()
    ]
    assert rows[0] is not None and rows[1] is not None
    assert rows[0] != rows[1]
    assert rows[2] is None  # null must NOT take the false digest


def test_spanevent_resource_write_survives_regroup(spark):
    from opentelemetry_collector_contrib_spark.processors.spanevents import (
        SpanEventTransform,
    )

    spans = spark.createDataFrame(
        [("t1", "s1", "sp", {"r": "1"}, [("boot", {"a": "1"})])],
        "trace_id string, span_id string, name string, "
        "resource map<string,string>, "
        "events array<struct<name string, attributes map<string,string>>>",
    )
    out = SpanEventTransform(
        ['set(resource.attributes["x"], "y")']
    )(spans).collect()[0]
    assert dict(out.resource) == {"r": "1", "x": "y"}
    assert [e.name for e in out.events] == ["boot"]


def test_k8sattributes_null_attributes_map(spark):
    from opentelemetry_collector_contrib_spark.processors import (
        AssociationRule,
        AssociationSource,
        K8sAttributes,
    )

    pods = spark.createDataFrame(
        [("10.0.0.1", {"k8s.pod.name": "pod-a", "k8s.namespace.name": "ns1"})],
        "pod_ip string, metadata map<string,string>",
    )
    rules = [
        AssociationRule(sources=[AssociationSource("connection")], dim_keys=["pod_ip"])
    ]
    df = spark.createDataFrame(
        [(1, "10.0.0.1", None)],
        "id int, ip string, attributes map<string,string>",
    )
    out = K8sAttributes(pods, rules)(df).collect()[0]
    attrs = dict(out.attributes or {})
    # a NULL attributes map must not swallow the enrichment
    assert attrs.get("k8s.pod.name") == "pod-a"


def test_span_to_attributes_char_class_close_paren(spark):
    # a ')' inside a character class is literal — the old paren scan
    # truncated the group at [^)] and emitted an unbalanced pattern
    from opentelemetry_collector_contrib_spark.processors.span import (
        SpanProcessor,
    )

    df = spark.createDataFrame(
        [("t", "s", "/api/users123", {})],
        "trace_id string, span_id string, span_name string, "
        "attributes map<string,string>",
    )
    proc = SpanProcessor(to_attributes=[r"^/api/(?P<args>[^)]+)$"])
    r = proc(df).collect()[0]
    assert dict(r.attributes)["args"] == "users123"
    assert r.span_name == "/api/{args}"
