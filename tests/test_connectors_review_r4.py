"""Regression tests for the round-4 connectors-package review findings."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from opentelemetry_collector_contrib_spark.connectors import (
    CountConnector,
    MetricDef,
    Route,
    SpanMetricsConnector,
)
from opentelemetry_collector_contrib_spark.connectors.servicegraph import (
    SpanServiceGraph,
)


def test_spanmetrics_dotted_dimension(spark):
    df = spark.createDataFrame(
        [("s", "op", "SERVER", "OK", 5.0, {"http.method": "GET"})],
        "service_name string, span_name string, span_kind string, "
        "status_code string, dur double, attributes map<string,string>",
    )
    conn = SpanMetricsConnector(duration_col="dur", dimensions=["http.method"])
    rows = conn.calls(df).collect()
    assert rows[0]["http_method"] == "GET" and rows[0].calls == 1
    assert conn(df).count() == 1


def test_spanmetrics_reserved_dim_collision_rejected(spark):
    with pytest.raises(ValueError, match="reserved"):
        SpanMetricsConnector(duration_col="dur", dimensions=["service.name"])


def test_spanmetrics_empty_buckets_rejected(spark):
    with pytest.raises(ValueError, match="buckets"):
        SpanMetricsConnector(duration_col="dur", buckets=[])


def test_count_connector_order_insensitive_groupings(spark):
    df = spark.createDataFrame(
        [("x", "y"), ("x", "z")], "a string, b string"
    )
    conn = CountConnector(metrics=[
        MetricDef("m1", attributes=[("a", None), ("b", None)]),
        MetricDef("m2", attributes=[("b", None), ("a", None)]),
    ])
    rows = conn(df).collect()
    # each (metric, group) appears exactly ONCE — identical grouping
    # sets listed in different attr order must not double-count
    keys = [(r.metric_name, tuple(sorted(r.attrs.items()))) for r in rows]
    assert len(keys) == len(set(keys))
    per_metric = {}
    for r in rows:
        per_metric[r.metric_name] = per_metric.get(r.metric_name, 0) + r["count"]
    assert per_metric == {"m1": 2, "m2": 2}


def test_span_pair_store_completes_one_edge_per_key(spark):
    # one PRODUCER with three CONSUMER children sharing its span id
    # (messaging fan-out): the store completes ONE edge; the other
    # children surface unpaired (virtual), never re-counting the
    # producer's latency
    rows = [
        ("t1", "p1", "", "SPAN_KIND_PRODUCER", "svcA", "STATUS_CODE_OK",
         1.0, {}),
    ] + [
        ("t1", f"c{i}", "p1", "SPAN_KIND_CONSUMER", "svcB",
         "STATUS_CODE_OK", 0.5, {})
        for i in range(3)
    ]
    df = spark.createDataFrame(
        rows,
        "trace_id string, span_id string, parent_span_id string, "
        "span_kind string, service_name string, status_code string, "
        "duration_s double, attributes map<string,string>",
    )
    out = SpanServiceGraph()(df).collect()
    assert len(out) == 1                          # ONE completed edge
    edge = out[0]
    assert (edge.client, edge.server) == ("svcA", "svcB")
    assert edge.request_count == 1                # not 3
    assert edge.client_latency_sum_s == 1.0       # producer counted once
    assert edge.server_latency_sum_s == 0.5       # first child only
    # the two extra children are unmatched NON-ROOT server spans: the
    # reference's onExpire emits nothing for them (documented in
    # SpanServiceGraph.edges), so they add no edges and no latency


def test_route_from_statement_where_inside_string(spark):
    r = Route.from_statement(
        'set(attributes["note"], "x where y") where severity_number == 2',
        ["s1"],
    )
    assert r.condition == "severity_number == 2"
    assert r.editor is not None
    r2 = Route.from_statement("route() where body != nil", ["s2"])
    assert r2.condition == "body != nil" and r2.editor is None


# -- dedup.py review findings ---------------------------------------------

def test_lsh_band_overflow_guard(spark):
    import pytest as _pytest

    from opentelemetry_collector_contrib_spark.training.dedup import (
        lsh_candidate_pairs,
        minhash_signatures,
    )

    docs = spark.createDataFrame(
        [(i, f"text {i % 3} words here") for i in range(10)],
        "doc_id long, text string",
    )
    sigs = minhash_signatures(docs, n_hashes=8)
    # fits: fine
    lsh_candidate_pairs(sigs, bands=4, rows_per_band=2).count()
    # overflows the signature: loud failure, not silent md5('') buckets
    with _pytest.raises(Exception, match="exceeds signature length"):
        lsh_candidate_pairs(sigs, bands=4, rows_per_band=4).count()


def test_simhash_keeps_tokenless_docs(spark):
    from opentelemetry_collector_contrib_spark.training.dedup import simhash

    docs = spark.createDataFrame(
        [(1, "hello world"), (2, ""), (3, None)], "doc_id long, text string"
    )
    rows = {r.doc_id: r.simhash for r in simhash(docs).collect()}
    assert set(rows) == {1, 2, 3}          # nothing silently dropped
    assert rows[1] is not None
    assert rows[2] is None and rows[3] is None


def test_source_matrix_null_source_bucketed(spark):
    from opentelemetry_collector_contrib_spark.training.dedup import (
        cross_source_dup_matrix,
    )

    docs = spark.createDataFrame(
        [(1, "web"), (2, None), (3, "web")], "doc_id long, source string"
    )
    pairs = spark.createDataFrame(
        [(1, 2), (1, 3)], "a_id long, b_id long"
    )
    got = {
        (r.source_a, r.source_b): r.n_pairs
        for r in cross_source_dup_matrix(docs, pairs).collect()
    }
    # (web, null) goes to the unknown CROSS bucket, not the diagonal
    assert got == {("unknown", "web"): 1, ("web", "web"): 1}


# -- similarity.py review findings ----------------------------------------

def test_semdedup_zero_norm_member_does_not_null_cluster(spark):
    from opentelemetry_collector_contrib_spark.training.similarity import (
        semdedup,
    )

    cents = [(0, [1.0, 0.0])]
    docs = spark.createDataFrame(
        [
            (1, [1.0, 0.0]),
            (2, [1.0, 0.001]),      # near-dup of 1
            (3, [0.0, 0.0]),        # zero-norm: null centroid-cos
        ],
        "vec_id long, embedding array<double>",
    )
    rows = {r.vec_id: r.keep for r in semdedup(docs, cents, 0.95).collect()}
    assert set(rows) == {1, 2, 3}
    # the zero-norm member must not NULL everyone's verdict
    assert all(v is not None for v in rows.values())
    assert sorted(v for v in rows.values()).count(True) >= 2


def test_hyperplane_bucket_dim_mismatch_loud(spark):
    import pytest as _pytest

    from opentelemetry_collector_contrib_spark.training.similarity import (
        hyperplane_buckets,
    )

    docs = spark.createDataFrame(
        [(1, [1.0] * 32)], "vec_id long, embedding array<double>"
    )
    with _pytest.raises(Exception, match="expected dim=64"):
        hyperplane_buckets(docs, n_planes=4, dim=64).collect()
    # matching dim is fine; null vec passes through
    ok = hyperplane_buckets(docs, n_planes=4, dim=32).collect()
    assert len(ok) == 1


def test_pq_rerank_dedups_shortlist(spark):
    from opentelemetry_collector_contrib_spark.training.similarity import (
        pq_rerank_topk,
    )

    corpus = spark.createDataFrame(
        [(i, [float(i), 1.0]) for i in range(1, 6)],
        "vec_id long, embedding array<double>",
    )
    queries = spark.createDataFrame(
        [(100, [5.0, 1.0])], "vec_id long, embedding array<double>"
    )
    # neighbor 5 listed twice; without dedup it would eat two rank slots
    shortlist = spark.createDataFrame(
        [(100, 5), (100, 5), (100, 4), (100, 3)], "query_id long, neighbor_id long"
    )
    got = [(r.neighbor_id, r.rank) for r in pq_rerank_topk(
        corpus, queries, shortlist, k=3).orderBy("rank").collect()]
    assert [n for n, _ in got] == [5, 4, 3]     # no duplicate rows
    assert [r for _, r in got] == [1, 2, 3]


def test_cosine_bucketed_no_self_pairs_on_dup_ids(spark):
    from opentelemetry_collector_contrib_spark.training.similarity import (
        cosine_pairs_bucketed,
    )

    docs = spark.createDataFrame(
        [(5, [1.0] * 4), (5, [1.0] * 4), (6, [1.0] * 4)],
        "vec_id long, embedding array<double>",
    )
    pairs = cosine_pairs_bucketed(
        docs, threshold=0.5, n_planes=2, dim=4
    ).collect()
    assert all(r.a_id != r.b_id for r in pairs)
