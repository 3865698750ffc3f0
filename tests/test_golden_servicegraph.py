"""SpanServiceGraph goldens, transcribed from the reference's tests and
testdata: connector/servicegraphconnector/connector_test.go
(TestConnectorConsume/buildSampleTrace:171-212, verifyCount:128-143),
testdata/virtual-node-label-{server,client}-{trace,expected-metrics}.yaml,
and the extra-dimensions-queue-db-trace.yaml messaging/db shapes.
"""

from __future__ import annotations

from opentelemetry_collector_contrib_spark.connectors import SpanServiceGraph

SCHEMA = (
    "trace_id string, span_id string, parent_span_id string, span_kind string,"
    " service_name string, status_code string, duration_s double,"
    " attributes map<string,string>"
)


def run(spark, conn, rows):
    df = spark.createDataFrame(rows, SCHEMA)
    return {
        tuple(r[k] for k in ("client", "server", "connection_type")): r
        for r in conn(df).collect()
    }


def test_happy_case(spark):
    """buildSampleTrace: one client + one server span of the same
    service, server's parent = client's span id, 1s duration each ->
    one edge (some-service -> some-service), count 1, not failed,
    client dim carried (verifyCount:128-143)."""
    rows = [
        ("t1", "c1", "", "SPAN_KIND_CLIENT", "some-service", "STATUS_CODE_UNSET", 1.0,
         {"some-attribute": "val"}),
        ("t1", "s1", "c1", "SPAN_KIND_SERVER", "some-service", "STATUS_CODE_UNSET", 1.0, {}),
    ]
    conn = SpanServiceGraph(dimensions=["some-attribute", "non-existing-attribute"])
    got = run(spark, conn, rows)
    assert len(got) == 1
    edge = got[("some-service", "some-service", "")]
    assert edge.request_count == 1
    assert edge.failed_count == 0
    assert edge.client_latency_sum_s == 1.0
    assert edge.server_latency_sum_s == 1.0
    assert edge["client_some-attribute"] == "val"
    assert edge["client_non-existing-attribute"] is None


def test_virtual_node_server_label(spark):
    """virtual-node-label-server-trace.yaml: an unmatched CLIENT span
    with no peer attributes -> virtual edge foo-server -> "unknown",
    virtual_node=server."""
    rows = [
        ("a0", "a1", "", "SPAN_KIND_CLIENT", "foo-server", "STATUS_CODE_UNSET", 1e-6, {}),
    ]
    conn = SpanServiceGraph(
        peer_attributes=["peer.service", "db.system", "messaging.system"],
        virtual_node_extra_label=True,
    )
    got = run(spark, conn, rows)
    edge = got[("foo-server", "unknown", "virtual_node")]
    assert edge.request_count == 1
    assert edge.virtual_node == "server"
    assert edge.client_latency_sum_s == 1e-6


def test_virtual_node_client_label(spark):
    """virtual-node-label-client-trace.yaml: an unmatched ROOT server
    span -> virtual edge user -> bar-requester, virtual_node=client."""
    rows = [
        ("a1", "b1", "", "SPAN_KIND_SERVER", "bar-requester", "STATUS_CODE_UNSET", 1e-6,
         {"peer.service": "external-platform"}),
    ]
    conn = SpanServiceGraph(
        peer_attributes=["peer.service", "db.system", "messaging.system"],
        virtual_node_extra_label=True,
    )
    got = run(spark, conn, rows)
    edge = got[("user", "bar-requester", "virtual_node")]
    assert edge.request_count == 1
    assert edge.virtual_node == "client"


def test_unmatched_non_root_server_emits_nothing(spark):
    """onExpire (connector.go:349-366): client empty but the edge key's
    span id is set -> neither virtual branch fires -> no edge."""
    rows = [
        ("t2", "s2", "missing-parent", "SPAN_KIND_SERVER", "svc", "STATUS_CODE_UNSET", 1.0, {}),
    ]
    assert run(spark, SpanServiceGraph(), rows) == {}


def test_database_edge_from_client_alone(spark):
    """connector.go:262-267: a client span with db.name completes
    immediately as a database edge; server latency copies the client's."""
    rows = [
        ("t3", "c3", "", "SPAN_KIND_CLIENT", "app", "STATUS_CODE_UNSET", 0.5,
         {"db.name": "orders-db"}),
    ]
    got = run(spark, SpanServiceGraph(), rows)
    edge = got[("app", "orders-db", "database")]
    assert edge.request_count == 1
    assert edge.server_latency_sum_s == 0.5


def test_messaging_system_edge(spark):
    """PRODUCER/CONSUMER pairs mark connection_type=messaging_system
    (connector.go:243-246,271-274)."""
    rows = [
        ("t4", "p4", "", "SPAN_KIND_PRODUCER", "emailservice", "STATUS_CODE_UNSET", 0.1,
         {"messaging.system": "rabbitmq"}),
        ("t4", "q4", "p4", "SPAN_KIND_CONSUMER", "mailsender", "STATUS_CODE_UNSET", 0.2, {}),
    ]
    got = run(spark, SpanServiceGraph(), rows)
    edge = got[("emailservice", "mailsender", "messaging_system")]
    assert edge.request_count == 1


def test_failed_when_either_side_errors(spark):
    """connector.go:255,282: Failed = client error OR server error."""
    rows = [
        ("t5", "c5", "", "SPAN_KIND_CLIENT", "a", "STATUS_CODE_UNSET", 1.0, {}),
        ("t5", "s5", "c5", "SPAN_KIND_SERVER", "b", "STATUS_CODE_ERROR", 1.0, {}),
        ("t6", "c6", "", "SPAN_KIND_CLIENT", "a", "STATUS_CODE_UNSET", 1.0, {}),
        ("t6", "s6", "c6", "SPAN_KIND_SERVER", "b", "STATUS_CODE_UNSET", 1.0, {}),
    ]
    got = run(spark, SpanServiceGraph(), rows)
    edge = got[("a", "b", "")]
    assert edge.request_count == 2
    assert edge.failed_count == 1


def test_internal_spans_ignored(spark):
    rows = [
        ("t7", "i7", "", "SPAN_KIND_INTERNAL", "svc", "STATUS_CODE_UNSET", 1.0, {}),
    ]
    assert run(spark, SpanServiceGraph(), rows) == {}


def test_join_plan_one_shuffle_per_side(spark):
    """The pairing must be a plain shuffle equi-join: no nested-loop,
    no driver-side collection."""
    rows = [
        ("t1", "c1", "", "SPAN_KIND_CLIENT", "a", "STATUS_CODE_UNSET", 1.0, {}),
        ("t1", "s1", "c1", "SPAN_KIND_SERVER", "b", "STATUS_CODE_UNSET", 1.0, {}),
    ]
    df = spark.createDataFrame(rows, SCHEMA)
    plan = SpanServiceGraph().edges(df)._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
