"""sumologicprocessor goldens, transcribed from the reference's tests:
translate_attributes_processor_test.go, nesting_processor_test.go,
aggregate_attributes_processor_test.go, cloud_namespace semantics
(cloud_namespace_processor.go:57-71), log-fields conversion
(log_fields_conversion_processor.go:92-112).

Flat-model encoding: a map-valued attribute is its compact JSON object
string; non-string pcommon values in the Go cases become their string
forms (the structural semantics under test are unchanged).
"""

from __future__ import annotations

import json

import pytest

from opentelemetry_collector_contrib_spark.processors.sumologic import (
    AggregationPair,
    NestingConfig,
    SumoLogicProcessor,
    aggregate_attrs,
    nest_attrs,
    severity_number_to_level,
)

SCHEMA = "attributes map<string,string>"


def run(spark, proc, attrs):
    df = spark.createDataFrame([(attrs,)], SCHEMA)
    return proc(df).collect()[0].attributes


def j(d):
    return json.dumps(d, separators=(",", ":"))


# --- translate_attributes (translate_attributes_processor_test.go:14-106) ---


def test_translate_attributes(spark):
    got = run(
        spark,
        SumoLogicProcessor(add_cloud_namespace=False),
        {
            "host.name": "testing-host",
            "host.id": "my-host-id",
            "host.type": "my-host-type",
            "k8s.cluster.name": "testing-cluster",
            "k8s.deployment.name": "my-deployment-name",
            "k8s.namespace.name": "my-namespace-name",
            "k8s.service.name": "my-service-name, other-service",
            "cloud.account.id": "my-account-id",
            "cloud.availability_zone": "my-zone",
            "cloud.region": "my-region",
        },
    )
    assert got == {
        "host": "testing-host",
        "InstanceId": "my-host-id",
        "InstanceType": "my-host-type",
        "Cluster": "testing-cluster",
        "deployment": "my-deployment-name",
        "namespace": "my-namespace-name",
        "service": "my-service-name, other-service",
        "AccountId": "my-account-id",
        "AvailabilityZone": "my-zone",
        "Region": "my-region",
    }


def test_translate_leaves_other_attributes_unchanged(spark):
    got = run(
        spark,
        SumoLogicProcessor(add_cloud_namespace=False),
        {"one": "one1", "host.name": "host1", "three": "three1"},
    )
    assert got == {"one": "one1", "host": "host1", "three": "three1"}


def test_translate_does_not_overwrite_existing_attribute(spark):
    got = run(
        spark,
        SumoLogicProcessor(add_cloud_namespace=False),
        {"host": "host1", "host.name": "hostname1"},
    )
    assert got == {"host": "host1", "host.name": "hostname1"}


def test_translate_first_wins_on_collision(spark):
    # service.name and k8s.service.name both translate to "service" —
    # the first in MAP ORDER is kept (translateAttributes result guard).
    # Python dict -> Spark map does not preserve insertion order, so
    # build the map with create_map to pin entry order.
    from pyspark.sql import functions as F

    df = spark.range(1).select(
        F.create_map(
            F.lit("k8s.service.name"), F.lit("k8s-svc"),
            F.lit("service.name"), F.lit("svc"),
        ).alias("attributes")
    )
    got = SumoLogicProcessor(add_cloud_namespace=False)(df).collect()[0].attributes
    assert got == {"service": "k8s-svc"}


def test_translate_disabled(spark):
    got = run(
        spark,
        SumoLogicProcessor(add_cloud_namespace=False, translate_attributes=False),
        {"host.name": "h"},
    )
    assert got == {"host.name": "h"}


def test_translate_columnar_and_udf_paths_agree(spark):
    # with nesting enabled, translation folds into the shaping UDF; the
    # two implementations must produce identical maps
    attrs = {
        "host.name": "h1",
        "cloud.region": "r1",
        "host": "pre-existing",
        "plainkey": "x",
    }
    columnar = run(spark, SumoLogicProcessor(add_cloud_namespace=False), attrs)
    via_udf = run(
        spark,
        SumoLogicProcessor(
            add_cloud_namespace=False,
            nest_attributes=NestingConfig(enabled=True, include=["__none__"]),
        ),
        attrs,
    )
    assert columnar == via_udf


# --- cloud namespace (cloud_namespace_processor.go:57-71) -------------------


@pytest.mark.parametrize(
    "platform,expected_ns",
    [("aws_ec2", "aws/ec2"), ("aws_ecs", "ecs"), ("aws_elastic_beanstalk", "ElasticBeanstalk")],
)
def test_cloud_namespace_added(spark, platform, expected_ns):
    got = run(
        spark,
        SumoLogicProcessor(translate_attributes=False),
        {"cloud.platform": platform},
    )
    assert got == {"cloud.platform": platform, "cloud.namespace": expected_ns}


def test_cloud_namespace_other_platform_untouched(spark):
    got = run(
        spark,
        SumoLogicProcessor(translate_attributes=False),
        {"cloud.platform": "gcp_compute_engine"},
    )
    assert got == {"cloud.platform": "gcp_compute_engine"}


# --- nesting (nesting_processor_test.go:13-166) ------------------------------


def _nest(attrs, include=(), exclude=(), squash=False):
    return nest_attrs(
        attrs,
        NestingConfig(
            enabled=True,
            include=list(include),
            exclude=list(exclude),
            squash_single_values=squash,
        ),
    )


def test_nesting_sample():
    got = _nest(
        {
            "kubernetes.container_name": "xyz",
            "kubernetes.host.name": "the host",
            "kubernetes.host.address": "127.0.0.1",
            "kubernetes.namespace_name": "sumologic",
            "another_attr": "42",
        }
    )
    assert got == {
        "kubernetes": {
            "container_name": "xyz",
            "host": {"name": "the host", "address": "127.0.0.1"},
            "namespace_name": "sumologic",
        },
        "another_attr": "42",
    }


def test_nesting_single_values_merge():
    got = _nest(
        {
            "a": {"b": {"c": "d"}},
            "a.b.c": "d",
            "d.g.e": "l",
            "b.g.c": "bonus",
        }
    )
    assert got == {
        "a": {"b": {"c": "d"}},
        "d": {"g": {"e": "l"}},
        "b": {"g": {"c": "bonus"}},
    }


def test_nesting_overwrite_map_with_simple_value():
    got = _nest({"sumo.logic": "true", "sumo": "false"})
    assert got == {"sumo": {"logic": "true", "": "false"}}


def test_nesting_allowlist():
    got = _nest(
        {
            "kubernetes.container_name": "xyz",
            "kubernetes.host.name": "the host",
            "kubernetes.host.address": "127.0.0.1",
            "kubernetes.namespace_name": "sumologic",
            "another_attr": "42",
        },
        include=["kubernetes.container", "kubernetes.host.name"],
    )
    assert got == {
        "kubernetes": {
            "container_name": "xyz",
            "host": {"name": "the host"},
        },
        "kubernetes.host.address": "127.0.0.1",
        "kubernetes.namespace_name": "sumologic",
        "another_attr": "42",
    }


def test_nesting_denylist():
    got = _nest(
        {
            "kubernetes.container_name": "xyz",
            "kubernetes.host.name": "the host",
            "kubernetes.host.address": "127.0.0.1",
            "kubernetes.namespace_name": "sumologic",
            "another_attr": "42",
        },
        exclude=["kubernetes.container", "kubernetes.host"],
    )
    assert got == {
        "kubernetes.container_name": "xyz",
        "kubernetes.host.name": "the host",
        "kubernetes.host.address": "127.0.0.1",
        "kubernetes": {"namespace_name": "sumologic"},
        "another_attr": "42",
    }


def test_nesting_denylist_and_allowlist():
    got = _nest(
        {
            "kubernetes.container_name": "xyz",
            "kubernetes.host.name": "the host",
            "kubernetes.host.naming_convention": "random",
            "kubernetes.host.address": "127.0.0.1",
            "kubernetes.namespace_name": "sumologic",
            "another_attr": "42",
            "and_end": "fin",
        },
        include=["kubernetes.host."],
        exclude=["kubernetes.host.naming"],
    )
    assert got == {
        "kubernetes.container_name": "xyz",
        "kubernetes.host.naming_convention": "random",
        "kubernetes.namespace_name": "sumologic",
        "kubernetes": {"host": {"name": "the host", "address": "127.0.0.1"}},
        "another_attr": "42",
        "and_end": "fin",
    }


def test_squash_from_example():
    got = _nest({"k8s.pods.a": "A", "k8s.pods.b": "B"}, squash=True)
    assert got == {"k8s.pods": {"a": "A", "b": "B"}}


def test_squash_many_value_maps():
    got = _nest(
        {
            "k8s.pods.a.b.c": "A",
            "k8s.pods.b": "B",
            "sumo.logic.schema": "processor",
        },
        squash=True,
    )
    assert got == {
        "k8s.pods": {"a.b.c": "A", "b": "B"},
        "sumo.logic.schema": "processor",
    }


def test_nesting_through_spark_json_encoding(spark):
    got = run(
        spark,
        SumoLogicProcessor(
            add_cloud_namespace=False,
            translate_attributes=False,
            nest_attributes=NestingConfig(enabled=True),
        ),
        {"kubernetes.host.name": "the host", "kubernetes.host.address": "127.0.0.1", "plain": "x"},
    )
    assert got["plain"] == "x"
    assert json.loads(got["kubernetes"]) == {
        "host": {"name": "the host", "address": "127.0.0.1"}
    }


# --- aggregate_attributes (aggregate_attributes_processor_test.go) ----------


def test_aggregate_three_values_one_key():
    got = aggregate_attrs(
        {"pod_first": "first", "pod_second": "second", "pod_third": "third"},
        [AggregationPair("pods", ["pod_"])],
    )
    assert got == {"pods": {"first": "first", "second": "second", "third": "third"}}


def test_aggregate_six_values_two_keys():
    got = aggregate_attrs(
        {
            "pod_first": "first",
            "pod_second": "second",
            "pod_third": "third",
            "sono_ichi": "1",
            "sono_ni": "2",
            "a totally unrelevant key": "true",
        },
        [AggregationPair("pods", ["pod_"]), AggregationPair("counts", ["sono_"])],
    )
    assert got == {
        "a totally unrelevant key": "true",
        "pods": {"first": "first", "second": "second", "third": "third"},
        "counts": {"ichi": "1", "ni": "2"},
    }


def test_aggregate_three_prefixes_one_key():
    got = aggregate_attrs(
        {"A_12": "A12", "A_23": "A23", "C_2": "C2", "B_3": "B3", "C_88": "C88", "B_53": "B53"},
        [AggregationPair("id", ["B_", "A_", "C_"])],
    )
    assert got == {
        "id": {"3": "B3", "53": "B53", "12": "A12", "23": "A23", "2": "C2", "88": "C88"}
    }


def test_aggregate_after_nesting_keeps_nested_values(spark):
    # aggregate runs AFTER nesting (processor.go:33-45 order): the nested
    # map value must stay an object, not be double-encoded
    got = run(
        spark,
        SumoLogicProcessor(
            add_cloud_namespace=False,
            translate_attributes=False,
            nest_attributes=NestingConfig(enabled=True),
            aggregate_attributes=[AggregationPair("k8s", ["kubernetes"])],
        ),
        {"kubernetes.host.name": "h", "other": "x"},
    )
    assert got["other"] == "x"
    assert json.loads(got["k8s"]) == {"": {"host": {"name": "h"}}}


# --- log fields conversion (log_fields_conversion_processor.go:92-112) ------

LOG_SCHEMA = (
    "attributes map<string,string>, severity_number int, severity_text string,"
    " span_id string, trace_id string"
)


def _run_log(spark, proc, row):
    df = spark.createDataFrame([row], LOG_SCHEMA)
    return proc(df).collect()[0].attributes


def test_severity_number_to_level_table():
    assert severity_number_to_level(1) == "TRACE"
    assert severity_number_to_level(2) == "TRACE2"
    assert severity_number_to_level(9) == "INFO"
    assert severity_number_to_level(13) == "WARN"
    assert severity_number_to_level(17) == "ERROR"
    assert severity_number_to_level(24) == "FATAL4"
    assert severity_number_to_level(0) is None


def test_log_fields_conversion(spark):
    proc = SumoLogicProcessor(
        add_cloud_namespace=False,
        translate_attributes=False,
        log_fields={
            "severity_number": "loglevel",
            "severity_text": "severitytext",
            "span_id": "spanid",
            "trace_id": "traceid",
        },
    )
    got = _run_log(spark, proc, ({}, 17, "err-text", "0102030405060708", "deadbeef"))
    assert got == {
        "loglevel": "ERROR",
        "severitytext": "err-text",
        "spanid": "0102030405060708",
        "traceid": "deadbeef",
    }


def test_log_fields_existing_canonical_attr_wins(spark):
    proc = SumoLogicProcessor(
        add_cloud_namespace=False,
        translate_attributes=False,
        log_fields={"severity_number": "my_level"},
    )
    # presence check is against the CANONICAL name "loglevel" even when
    # the configured output name differs
    got = _run_log(spark, proc, ({"loglevel": "preset"}, 17, None, None, None))
    assert got == {"loglevel": "preset"}


def test_log_fields_unspecified_severity_skipped(spark):
    proc = SumoLogicProcessor(
        add_cloud_namespace=False,
        translate_attributes=False,
        log_fields={"severity_number": "loglevel"},
    )
    got = _run_log(spark, proc, ({}, 0, None, None, None))
    assert got == {}


# --- telegraf / docker metric translations -----------------------------------
# translate_telegraf_metrics_processor.go:19-72,
# translate_docker_metrics_processor.go (name + resource-attr tables)

METRIC_SCHEMA = "metric_name string, attributes map<string,string>"


def test_telegraf_metric_names(spark):
    proc = SumoLogicProcessor(
        add_cloud_namespace=False,
        translate_attributes=False,
        translate_telegraf_metrics=True,
    )
    df = spark.createDataFrame(
        [("cpu_usage_active", {}), ("system_load5", {}), ("not_mapped", {})],
        METRIC_SCHEMA,
    )
    got = sorted(r.metric_name for r in proc(df).collect())
    assert got == ["CPU_LoadAvg_5min", "CPU_Total", "not_mapped"]


def test_docker_metric_names_and_resource_attrs(spark):
    proc = SumoLogicProcessor(
        add_cloud_namespace=False,
        translate_attributes=False,
        translate_docker_metrics=True,
    )
    df = spark.createDataFrame(
        [("container.cpu.percent", {"container.id": "abc", "keep": "x"})],
        METRIC_SCHEMA,
    )
    r = proc(df).collect()[0]
    assert r.metric_name == "cpu_percentage"
    assert r.attributes == {"container.FullID": "abc", "keep": "x"}


def test_docker_attr_no_overwrite(spark):
    proc = SumoLogicProcessor(
        add_cloud_namespace=False,
        translate_attributes=False,
        translate_docker_metrics=True,
    )
    df = spark.createDataFrame(
        [("m", {"container.id": "abc", "container.FullID": "pre"})], METRIC_SCHEMA
    )
    r = proc(df).collect()[0]
    assert r.attributes == {"container.id": "abc", "container.FullID": "pre"}


def test_docker_translation_composes_with_nesting_udf(spark):
    proc = SumoLogicProcessor(
        add_cloud_namespace=False,
        translate_attributes=False,
        translate_docker_metrics=True,
        nest_attributes=NestingConfig(enabled=True, include=["net."]),
    )
    df = spark.createDataFrame(
        [("container.memory.rss", {"container.name": "c1", "net.peer": "p"})],
        METRIC_SCHEMA,
    )
    r = proc(df).collect()[0]
    assert r.metric_name == "stats.rss"
    assert r.attributes["container.Name"] == "c1"
    assert json.loads(r.attributes["net"]) == {"peer": "p"}
