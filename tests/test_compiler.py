"""Declarative compiler: config-driven pipelines reach every registered
operator (pkg/stanza/operator/registry.go parity — an operator that
exists as a class but is unreachable from config is a coverage hole)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from opentelemetry_collector_contrib_spark.plans.compiler import (
    OPERATOR_REGISTRY,
    PipelineConfig,
    StageConfig,
    compile_pipeline,
)

EXPECTED_KINDS = {
    # stanza parsers
    "regex_parser", "json_parser", "csv_parser", "key_value_parser",
    "time_parser", "severity_parser", "uri_parser", "syslog_parser",
    "container", "json_array_parser", "trace_parser", "scope_name_parser",
    # stanza transformers
    "add", "remove", "copy", "move", "retain", "flatten", "assign_keys",
    "unquote", "noop", "filter", "router", "recombine",
    # processors
    "attributes", "filter_processor", "transform", "groupbyattrs",
    "redaction", "resourcedetection", "probabilistic_sampler", "interval",
    "deltatocumulative", "cumulativetodelta", "deltatorate",
    "metricstransform", "metricsgeneration", "tail_sampling", "groupbytrace",
    # connectors
    "count", "routing", "spanmetrics", "servicegraph", "exceptions",
}


def test_registry_covers_expected_kinds():
    missing = EXPECTED_KINDS - set(OPERATOR_REGISTRY)
    assert not missing, f"unregistered operator kinds: {sorted(missing)}"


def test_config_pipeline_transformer_chain(spark):
    """copy/assign_keys/unquote/noop/scope_name_parser wired from config."""
    df = spark.createDataFrame(
        [('"quoted"', "a,b", "my.logger")],
        "body string, pair string, logger string",
    )
    cfg = PipelineConfig(stages=[
        StageConfig("unquote", {"field": "body"}),
        StageConfig("copy", {"from_field": "body", "to_field": "copied"}),
        StageConfig("scope_name_parser", {"parse_from": "logger"}),
        StageConfig("noop", {}),
        StageConfig("add", {"field": "tagged", "value": "yes"}),
    ])
    out = compile_pipeline(cfg)(df).collect()[0]
    assert out["body"] == "quoted"
    assert out["copied"] == "quoted"
    assert out["scope"] == "my.logger"
    assert out["tagged"] == "yes"


def test_config_pipeline_assign_keys_and_flatten(spark):
    df = spark.createDataFrame([("x",)], "body string").withColumn(
        "vals", F.array(F.lit("1"), F.lit("2"))
    ).withColumn(
        "nested", F.struct(F.lit("a").alias("p"), F.lit("b").alias("q"))
    )
    cfg = PipelineConfig(stages=[
        StageConfig("assign_keys", {"field": "vals", "keys": ["one", "two"]}),
        StageConfig("flatten", {"field": "nested"}),
    ])
    out = compile_pipeline(cfg)(df).collect()[0]
    assert dict(out["vals"]) == {"one": "1", "two": "2"}
    assert out["p"] == "a" and out["q"] == "b"


def test_config_pipeline_resourcedetection(spark, monkeypatch):
    monkeypatch.setenv("OTEL_RESOURCE_ATTRIBUTES", "service.name=svc,env=prod")
    df = spark.createDataFrame([("x",)], "body string")
    cfg = PipelineConfig(stages=[
        StageConfig("resourcedetection", {"detectors": ["env"]}),
    ])
    out = compile_pipeline(cfg)(df).collect()[0]
    assert dict(out["resource"]) == {"service.name": "svc", "env": "prod"}


def test_unknown_stage_kind_raises():
    with pytest.raises(KeyError):
        compile_pipeline(PipelineConfig(stages=[StageConfig("bogus", {})]))


def test_json_config_file_stanza_style(spark, tmp_path):
    """The collector's YAML operator list, serialized as JSON, compiles
    and runs (unmarshal-by-registered-type parity)."""
    import json

    from opentelemetry_collector_contrib_spark.plans.compiler import (
        config_from_dict,
        load_pipeline_json,
    )

    doc = {
        "operators": [
            {"type": "regex_parser", "pattern": "^(?P<word>\\w+)",
             "parse_from": "body"},
            {"type": "add", "field": "env", "value": "prod"},
        ]
    }
    p = tmp_path / "pipeline.json"
    p.write_text(json.dumps(doc))
    df = spark.createDataFrame([("hello world",)], "body string")
    out = load_pipeline_json(str(p))(df).collect()[0]
    assert out["word"] == "hello" and out["env"] == "prod"
    with pytest.raises(ValueError):
        config_from_dict({"nope": []})


def test_config_pipeline_exceptions_connector(spark):
    """The exceptions connector compiles into a pipeline stage wired to
    one signal, dimensions given as config dicts (factory.go posture)."""
    cfg = PipelineConfig(stages=[
        StageConfig("exceptions", {
            "signal": "metrics",
            "dimensions": [{"name": "deploy.env", "default": "prod"}],
        }),
    ])
    df = spark.createDataFrame(
        [("t1", "s1", "svc", "op", "SPAN_KIND_CLIENT", "STATUS_CODE_ERROR",
          [{"name": "exception", "ts": None,
            "attributes": {"exception.message": "x"}}])],
        "trace_id string, span_id string, service_name string, "
        "span_name string, span_kind string, status_code string, "
        "events array<struct<name string, ts timestamp, "
        "attributes map<string,string>>>",
    )
    out = compile_pipeline(cfg)(df).collect()
    assert len(out) == 1 and out[0]["count"] == 1
    assert out[0].deploy_env == "prod"
    with pytest.raises(ValueError):
        compile_pipeline(PipelineConfig(stages=[
            StageConfig("exceptions", {"signal": "traces"})
        ]))


def test_metric_context_and_expo_stages_compile(spark):
    """Round-3 registry additions: metric-context editors, histogram
    cumulativetodelta, expo accumulation."""
    df = spark.createDataFrame(
        [("g", "gauge", None, None, "%", "d", 1.5, None, None),
         ("h", "histogram", "delta", None, "ms", "d", None, 4, 9.0)],
        "metric_name string, metric_type string, temporality string,"
        " is_monotonic boolean, unit string, description string,"
        " value double, count long, hsum double",
    )
    fn = compile_pipeline(PipelineConfig([
        StageConfig("convert_gauge_to_sum",
                    {"temporality": "delta", "monotonic": True}),
        StageConfig("extract_count_metric", {"monotonic": False}),
        StageConfig("copy_metric", {"name": "h2", "where": "metric_name = 'h'"}),
    ]))
    names = sorted(r["metric_name"] for r in fn(df).collect())
    assert names == ["g", "h", "h2", "h_count"]
    got = {r["metric_name"]: r for r in fn(df).collect()}
    assert got["g"]["metric_type"] == "sum" and got["g"]["temporality"] == "delta"
    assert got["h_count"]["value"] == 4.0

    expo_df = spark.createDataFrame(
        [("m", 1, 0, 0, [1], 0)],
        "metric string, ts int, scale int, offset int, counts array<long>,"
        " zero_count long",
    )
    fn2 = compile_pipeline(PipelineConfig([StageConfig("deltatocumulative_expo", {})]))
    assert fn2(expo_df).count() == 1


def test_compiler_reaches_signal_filters(spark):
    from opentelemetry_collector_contrib_spark.plans.compiler import (
        OPERATOR_REGISTRY,
    )

    fm = OPERATOR_REGISTRY["filter_metrics"](
        include={"match_type": "regexp", "metric_names": ["http_.*"]}
    )
    df = spark.createDataFrame(
        [("http_x", {}), ("other", {})],
        "metric_name string, resource map<string,string>",
    )
    assert fm(df).count() == 1
    fs = OPERATOR_REGISTRY["filter_spans"](
        exclude={"attributes": [("db.type", "redis")]}
    )
    sdf = spark.createDataFrame(
        [("a", "s", "1", {"db.type": "redis"}, {}), ("b", "s", "1", {}, {})],
        "span_name string, scope_name string, scope_version string, "
        "attributes map<string,string>, resource map<string,string>",
    )
    assert fs(sdf).count() == 1


def test_compiler_geoip_stage(spark):
    from opentelemetry_collector_contrib_spark.plans.compiler import (
        PipelineConfig,
        StageConfig,
        compile_pipeline,
    )

    dim = spark.createDataFrame(
        [("1.2.3.0/24", "bcn")], "cidr string, city string"
    )
    pipe = compile_pipeline(
        PipelineConfig([StageConfig("geoip", {"dim": "geo"})]),
        dims={"geo": dim},
    )
    df = spark.createDataFrame(
        [(0, {"source.address": "1.2.3.4"})],
        "rid int, attributes map<string,string>",
    )
    assert pipe(df).collect()[0].geo_city == "bcn"


def test_compiler_span_schema_sumologic_k8s(spark):
    """The four previously-unregistered config-driven processors compile
    by name and run end to end."""
    from opentelemetry_collector_contrib_spark.plans.compiler import (
        PipelineConfig,
        StageConfig,
        compile_pipeline,
    )

    df = spark.createDataFrame(
        [
            ("svc/op1", "OK", {"peer": "10.0.0.1", "db.system": "pg"},
             "10.0.0.1", "https://opentelemetry.io/schemas/1.0.0"),
            ("svc/op2", "OK", {"peer": "10.0.0.2"}, "10.0.0.2",
             "https://opentelemetry.io/schemas/1.0.0"),
        ],
        "span_name string, status_code string, "
        "attributes map<string,string>, ip string, schema_url string",
    )
    pods = spark.createDataFrame(
        [("10.0.0.1", {"k8s.pod.name": "p1"})],
        "pod_ip string, metadata map<string,string>",
    )
    cfg = PipelineConfig(stages=[
        StageConfig("span", {
            "to_attributes": [r"^svc/(?P<op>op\d+)$"],
        }),
        StageConfig("k8sattributes", {
            "pods": "pods",
            "associations": [{
                "sources": [{"from_": "connection"}],
                "dim_keys": ["pod_ip"],
            }],
        }),
        StageConfig("schema", {
            "versions": {
                "1.0.0": {},   # anchors the walk from the rows' version
                "1.1.0": {"all": {"changes": [
                    {"rename_attributes":
                     {"attribute_map": {"peer": "net.peer"}}}
                ]}},
            },
            "target": "1.1.0",
        }),
        StageConfig("sumologic", {
            "add_cloud_namespace": False,
            "translate_attributes": False,
            "nest_attributes": {"enabled": True, "separator": "."},
        }),
    ])
    out = compile_pipeline(cfg, dims={"pods": pods})(df).collect()
    rows = {r.span_name: r for r in out}
    # span to_attributes extracted the op into attributes + renamed span
    assert "op" in str(rows)  # extraction happened somewhere in attrs
    # k8sattributes merged pod metadata for the matching ip
    r1 = [r for r in out if r.ip == "10.0.0.1"][0]
    assert "p1" in str(r1)
    # schema renamed peer -> net.peer, then sumologic nested it under
    # the 'net' branch — the top-level 'peer' key is gone everywhere
    for r in out:
        attrs = str(r.attributes)
        assert "net" in attrs and "{'peer'" not in attrs.replace(
            "'net': {'peer'", ""
        )


def test_missing_dim_table_raises_actionable_error(spark):
    # r05 tooling review: a config naming a dim table with no dims
    # supplied must raise a clear error, not a bare KeyError
    import pytest as _pytest

    from opentelemetry_collector_contrib_spark.plans.compiler import (
        PipelineConfig,
        StageConfig,
        compile_pipeline,
    )

    cfg = PipelineConfig(
        stages=[StageConfig("lookup", {"dim": "tool_catalog", "on": "tool"})]
    )
    with _pytest.raises(ValueError, match="tool_catalog.*--dim"):
        compile_pipeline(cfg)
