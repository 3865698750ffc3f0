"""k8sattributes association + merge semantics.

Mirrors processor/k8sattributesprocessor behavior:
- first fully-resolved association rule supplies the identifier; a
  failed store lookup does NOT fall through to later rules
  (processor.go extractPodID)
- pod/namespace/node metadata added only where the resource does not
  already carry the key (processor.go:143-160)
- passthrough stamps k8s.pod.ip from the connection source only
  (config.go:20-33)
- broadcast-join plan: the fact side must not shuffle
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from opentelemetry_collector_contrib_spark.processors import (
    AssociationRule,
    AssociationSource,
    K8sAttributes,
)

SCHEMA = "id int, ip string, attributes map<string,string>"


@pytest.fixture()
def pods(spark):
    return spark.createDataFrame(
        [
            ("10.0.0.1", "pod-a", {"k8s.pod.name": "pod-a", "k8s.namespace.name": "ns1", "k8s.node.name": "n1"}),
            ("10.0.0.2", "pod-b", {"k8s.pod.name": "pod-b", "k8s.namespace.name": "ns2", "k8s.node.name": "n2"}),
        ],
        "pod_ip string, pod_name string, metadata map<string,string>",
    )


def _rules():
    return [
        AssociationRule(
            sources=[AssociationSource("resource_attribute", "k8s.pod.name")],
            dim_keys=["pod_name"],
        ),
        AssociationRule(
            sources=[AssociationSource("connection")], dim_keys=["pod_ip"]
        ),
    ]


def test_association_first_resolved_rule_wins(spark, pods):
    df = spark.createDataFrame(
        [
            # rule 0 resolves (attr present) -> joined by name
            (1, "10.0.0.2", {"k8s.pod.name": "pod-a"}),
            # rule 0 unresolved -> rule 1 (connection ip)
            (2, "10.0.0.2", {}),
            # nothing resolves -> no metadata
            (3, None, {}),
        ],
        SCHEMA,
    )
    out = {r["id"]: r["attributes"] for r in K8sAttributes(pods, _rules())(df).collect()}
    assert out[1]["k8s.namespace.name"] == "ns1"  # by name, NOT by ip
    assert out[2]["k8s.namespace.name"] == "ns2"
    assert "k8s.namespace.name" not in out[3]


def test_failed_lookup_does_not_fall_through(spark, pods):
    # rule 0 resolves with an identifier the store lacks: later rules
    # must NOT be consulted even though the ip would have matched
    df = spark.createDataFrame(
        [(1, "10.0.0.1", {"k8s.pod.name": "ghost-pod"})], SCHEMA
    )
    out = K8sAttributes(pods, _rules())(df).collect()[0]["attributes"]
    assert "k8s.namespace.name" not in out


def test_existing_attributes_win(spark, pods):
    df = spark.createDataFrame(
        [(1, "10.0.0.1", {"k8s.pod.name": "pod-a", "k8s.namespace.name": "already-set"})],
        SCHEMA,
    )
    out = K8sAttributes(pods, _rules())(df).collect()[0]["attributes"]
    assert out["k8s.namespace.name"] == "already-set"
    assert out["k8s.node.name"] == "n1"  # missing keys still merged


def test_connection_stamps_pod_ip(spark, pods):
    df = spark.createDataFrame([(1, "10.0.0.2", {})], SCHEMA)
    out = K8sAttributes(pods, _rules())(df).collect()[0]["attributes"]
    assert out["k8s.pod.ip"] == "10.0.0.2"


def test_passthrough_mode(spark, pods):
    df = spark.createDataFrame([(1, "10.0.0.1", {})], SCHEMA)
    out = K8sAttributes(pods, _rules(), passthrough=True)(df).collect()[0][
        "attributes"
    ]
    assert out == {"k8s.pod.ip": "10.0.0.1"}  # stamped, nothing else


def test_multi_source_rule_requires_all(spark):
    pods = spark.createDataFrame(
        [("pod-a", "ns1", {"k8s.node.name": "n1"})],
        "pod_name string, ns string, metadata map<string,string>",
    )
    rule = AssociationRule(
        sources=[
            AssociationSource("resource_attribute", "k8s.pod.name"),
            AssociationSource("resource_attribute", "k8s.namespace.name"),
        ],
        dim_keys=["pod_name", "ns"],
    )
    df = spark.createDataFrame(
        [
            (1, None, {"k8s.pod.name": "pod-a", "k8s.namespace.name": "ns1"}),
            (2, None, {"k8s.pod.name": "pod-a"}),  # half-resolved: no match
        ],
        SCHEMA,
    )
    out = {r["id"]: r["attributes"] for r in K8sAttributes(pods, [rule])(df).collect()}
    assert out[1]["k8s.node.name"] == "n1"
    assert "k8s.node.name" not in out[2]


def test_namespace_and_node_dims(spark, pods):
    ns = spark.createDataFrame(
        [("ns1", {"k8s.namespace.label.team": "core"})],
        "name string, metadata map<string,string>",
    )
    nodes = spark.createDataFrame(
        [("n1", {"k8s.node.label.zone": "z1"})],
        "name string, metadata map<string,string>",
    )
    df = spark.createDataFrame([(1, "10.0.0.1", {})], SCHEMA)
    out = K8sAttributes(pods, _rules(), namespaces=ns, nodes=nodes)(df).collect()[0][
        "attributes"
    ]
    assert out["k8s.namespace.label.team"] == "core"
    assert out["k8s.node.label.zone"] == "z1"


def test_broadcast_plan_no_fact_shuffle(spark, pods):
    df = spark.createDataFrame([(1, "10.0.0.1", {})], SCHEMA)
    plan = (
        K8sAttributes(pods, _rules())(df)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # equi-key on the source value, rule gate as residual — must be a
    # hash join, never a nested-loop broadcast
    assert "BroadcastHashJoin" in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "SortMergeJoin" not in plan
    assert "Exchange hashpartitioning" not in plan  # fact never shuffles
