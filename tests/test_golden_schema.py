"""Schema processor goldens, from the reference's tested translation
core: processor/schemaprocessor/internal/migrate/attributes_test.go
(Apply/Rollback cases incl. naming loop and rewrite-priority conflict),
conditional/signal semantics (conditional.go, signal.go), and the
revision walk of internal/translation/revision_v1.go.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from opentelemetry_collector_contrib_spark.processors.schema import (
    SchemaProcessor,
    _rename_map_staged,
)

SCHEMA = "schema_url string, attributes map<string,string>, name string"
URL = "https://opentelemetry.io/schemas/"


def rename(spark, mapping, attrs):
    # golden helper exercises the PRODUCTION staged implementation (the
    # Column-level twin it used to pin was dead code the processor
    # never ran)
    df = spark.createDataFrame([(attrs,)], "attributes map<string,string>")
    out = _rename_map_staged(df, "attributes", mapping, F.lit(True))
    return out.collect()[0].attributes


def run(spark, versions, target, rows, signal="log", name_col=None):
    proc = SchemaProcessor(
        versions=versions, target=target, signal=signal, name_col=name_col
    )
    df = spark.createDataFrame(rows, SCHEMA)
    return [
        (r.schema_url, r.attributes, r.name) for r in proc(df).collect()
    ]


# --- AttributeChangeSet.Apply cases (attributes_test.go:42-113) --------------


def test_no_modifications(spark):
    assert rename(spark, {}, {"test.cases": "1"}) == {"test.cases": "1"}


def test_apply_changes(spark):
    got = rename(spark, {"service_version": "service.version"}, {"service_version": "v0.0.1"})
    assert got == {"service.version": "v0.0.1"}


def test_naming_loop(spark):
    got = rename(
        spark,
        {"service.version": "service_version", "service_version": "service.version"},
        {"service_version": "v0.0.1"},
    )
    # each ORIGINAL key renamed once — no cascade back
    assert got == {"service.version": "v0.0.1"}


def test_rewrite_overrides_existing_value(spark):
    got = rename(
        spark,
        {"application.name": "service.name"},
        {"application.name": "my-awesome-application", "service.name": "my-awesome-service"},
    )
    assert got == {"service.name": "my-awesome-application"}


# --- version walk ------------------------------------------------------------

VERSIONS = {
    "1.0.0": {},
    "1.1.0": {
        "all": {"changes": [
            {"rename_attributes": {"attribute_map": {"k8s.cluster": "k8s.cluster.name"}}}
        ]}
    },
    "1.2.0": {
        "logs": {"changes": [
            {"rename_attributes": {"attribute_map": {"log.path": "log.file.path"}}}
        ]},
        "metrics": {"changes": [
            {"rename_metrics": {"m.old": "m.new"}},
            {"rename_attributes": {"attribute_map": {"lat": "latency"},
                                   "apply_to_metrics": ["m.new"]}},
        ]},
    },
}


def test_upgrade_applies_ascending(spark):
    rows = [(URL + "1.0.0", {"k8s.cluster": "c1", "log.path": "/a"}, "x")]
    got = run(spark, VERSIONS, "1.2.0", rows)
    assert got == [
        (URL + "1.2.0", {"k8s.cluster.name": "c1", "log.file.path": "/a"}, "x")
    ]


def test_partial_upgrade_only_applies_needed_revisions(spark):
    rows = [(URL + "1.1.0", {"k8s.cluster": "c1", "log.path": "/a"}, "x")]
    got = run(spark, VERSIONS, "1.2.0", rows)
    # 1.1.0 changes are already in this data; only 1.2.0 applies
    assert got == [
        (URL + "1.2.0", {"k8s.cluster": "c1", "log.file.path": "/a"}, "x")
    ]


def test_downgrade_rolls_back_descending(spark):
    rows = [(URL + "1.2.0", {"k8s.cluster.name": "c1", "log.file.path": "/a"}, "x")]
    got = run(spark, VERSIONS, "1.0.0", rows)
    assert got == [
        (URL + "1.0.0", {"k8s.cluster": "c1", "log.path": "/a"}, "x")
    ]


def test_mixed_versions_one_pass(spark):
    rows = [
        (URL + "1.0.0", {"k8s.cluster": "a"}, "x"),
        (URL + "1.1.0", {"k8s.cluster": "b"}, "x"),
        (URL + "1.2.0", {"k8s.cluster.name": "c"}, "x"),
    ]
    got = sorted(run(spark, VERSIONS, "1.2.0", rows), key=lambda r: sorted(r[1].values()))
    assert [g[1] for g in got] == [
        {"k8s.cluster.name": "a"},
        {"k8s.cluster": "b"},  # 1.1.0 source: the 1.1.0 revision predates it
        {"k8s.cluster.name": "c"},
    ]
    assert all(g[0] == URL + "1.2.0" for g in got)


def test_unknown_schema_url_untouched(spark):
    rows = [("https://example.com/schemas/9.9.9", {"k8s.cluster": "a"}, "x")]
    got = run(spark, VERSIONS, "1.2.0", rows)
    assert got == rows


def test_metric_rename_and_conditional_attrs(spark):
    rows = [
        (URL + "1.1.0", {"lat": "5"}, "m.old"),
        (URL + "1.1.0", {"lat": "5"}, "other"),
    ]
    got = run(spark, VERSIONS, "1.2.0", rows, signal="metric", name_col="name")
    by_name = {g[2]: g[1] for g in got}
    # m.old -> m.new, then the conditional set (apply_to_metrics=[m.new])
    # renames lat -> latency; "other" is untouched
    assert by_name["m.new"] == {"latency": "5"}
    assert by_name["other"] == {"lat": "5"}


def test_metric_downgrade_reverses_name_and_attrs(spark):
    rows = [(URL + "1.2.0", {"latency": "5"}, "m.new")]
    got = run(spark, VERSIONS, "1.1.0", rows, signal="metric", name_col="name")
    assert got == [(URL + "1.1.0", {"lat": "5"}, "m.old")]
