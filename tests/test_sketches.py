"""Probabilistic sketches: Bloom membership, count-min, HyperLogLog.

Property tests on planted corpora (the guarantees each sketch makes are
one-sided and testable exactly: Bloom never false-negative, CM never
under-estimates, HLL registers are a deterministic pure function of the
input set) plus degenerate-input rows (null/empty text) mirroring the
ANSI audit posture. Oracle value-parity runs via tools/ansi_sweep.py
and the driver gate (sketch_bloom / sketch_cms_topk /
sketch_hll_shingles).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from opentelemetry_collector_contrib_spark.training import (
    bloom_build,
    bloom_probe,
    cms_build,
    cms_estimate,
    corpus_distinct_hll,
    hist_quantile_sketch,
    hll_estimate,
    hll_registers,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id BIGINT, text STRING")


def test_bloom_no_false_negatives(spark):
    built = _docs(spark, [(i, f"document number {i} body") for i in range(50)])
    bits = bloom_build(built)
    out = {r.doc_id: r for r in bloom_probe(built, bits).collect()}
    assert len(out) == 50
    assert all(r.maybe_member and r.n_hits == 4 for r in out.values())


def test_bloom_nonmember_and_degenerate_rows(spark):
    built = _docs(spark, [(0, "alpha"), (1, "beta"), (2, "")])
    probe = _docs(spark, [(10, "alpha"), (11, "gamma"), (12, ""), (13, None)])
    out = {r.doc_id: r for r in bloom_probe(probe, bloom_build(built)).collect()}
    assert out[10].maybe_member  # built value: guaranteed hit
    assert out[12].maybe_member  # empty string is a value, was built
    # null text hashes to null positions: zero hits, never a member
    assert out[13].n_hits == 0 and not out[13].maybe_member
    # not built; false-positive odds at (m=4096, k=4, n=3) are ~1e-12
    # and the hashes are fixed, so this is a deterministic expectation
    assert not out[11].maybe_member and out[11].n_hits < 4


def test_bloom_filter_is_bounded(spark):
    built = _docs(spark, [(i, f"doc {i}") for i in range(200)])
    bits = bloom_build(built, m_bits=64)  # deliberately tiny filter
    rows = bits.collect()
    assert len(rows) <= 64
    assert all(0 <= r.bit < 64 for r in rows)


def test_cms_never_underestimates_and_exact_when_sparse(spark):
    # 3 distinct tokens in a w=1024 sketch: collisions are absent for
    # these fixed hashes, so the CM estimate is exact
    toks = spark.createDataFrame(
        [("a",)] * 5 + [("b",)] * 3 + [("c",)] * 1, "tok STRING"
    )
    sketch = cms_build(toks)
    truth = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("true_count"))
    est = {r.tok: r.cms_est for r in cms_estimate(truth, sketch).collect()}
    assert est == {"a": 5, "b": 3, "c": 1}


def test_cms_overestimate_bound_under_collisions(spark):
    # 500 distinct tokens forced into a 4x8 sketch: heavy collisions,
    # the CM guarantee (est >= truth) must still hold for every token
    toks = spark.createDataFrame(
        [(f"t{i}",) for i in range(500) for _ in range(i % 3 + 1)], "tok STRING"
    )
    sketch = cms_build(toks, width=8)
    truth = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("true_count"))
    joined = cms_estimate(truth, sketch, width=8).join(truth, "tok")
    assert joined.filter(F.col("cms_est") < F.col("true_count")).count() == 0


def test_cms_sketch_is_bounded(spark):
    toks = spark.createDataFrame([(f"t{i}",) for i in range(5000)], "tok STRING")
    assert cms_build(toks, depth=4, width=32).count() <= 4 * 32


def test_hll_registers_shape_and_determinism(spark):
    toks = spark.createDataFrame([(f"v{i}",) for i in range(1000)], "tok STRING")
    regs = sorted(hll_registers(toks).collect())
    assert all(0 <= r.bucket < 64 and 1 <= r.reg <= 55 for r in regs)
    # duplicates change nothing: HLL is a pure function of the SET
    dup = toks.union(toks).union(toks)
    assert sorted(hll_registers(dup).collect()) == regs


def test_hll_estimate_accuracy(spark):
    # m=64 -> standard error ~13%; 3 sigma on 2000 distinct values
    toks = spark.createDataFrame([(f"v{i}",) for i in range(2000)], "tok STRING")
    row = hll_estimate(hll_registers(toks)).collect()[0]
    assert row.m == 64
    assert 0.6 * 2000 < row.hll_estimate < 1.4 * 2000


def test_hll_empty_and_null_inputs(spark):
    empty = spark.createDataFrame([], "tok STRING")
    row = hll_estimate(hll_registers(empty)).collect()[0]
    # all-empty register table degrades to the alpha*m floor, not null
    assert row.nonzero_registers == 0
    assert abs(row.hll_estimate - 0.709 * 64) < 0.01
    docs = _docs(spark, [(0, None), (1, None)])
    row = corpus_distinct_hll(docs).collect()[0]
    assert row.true_distinct == 0 and row.nonzero_registers == 0


def test_corpus_hll_on_documents(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    row = corpus_distinct_hll(docs).collect()[0]
    assert row.true_distinct > 0
    assert 0.6 * row.true_distinct < row.hll_estimate < 1.4 * row.true_distinct


def test_hist_quantiles_within_one_bucket_width(spark):
    # deterministic skewed values: exact inverted-CDF quantile must sit
    # within the estimate's bucket, i.e. est - width < exact <= est
    vals = [((i * i) % 997,) for i in range(500)]
    df = spark.createDataFrame(vals, "v long")
    xs = sorted(x for (x,) in vals)
    n, b = len(xs), 64
    width = (max(xs) - min(xs)) // b + 1
    out = {r.p: r for r in hist_quantile_sketch(df, "v", b, (0.5, 0.9, 0.99)).collect()}
    for p in (0.5, 0.9, 0.99):
        exact = xs[-(-int(p * 100) * n // 100) - 1]  # ceil(p*n)-th value
        r = out[p]
        assert r.n == n and 0 <= r.bucket < b
        assert r.est - width < exact <= r.est, (p, exact, r)


def test_hist_quantiles_constant_and_degenerate(spark):
    const = spark.createDataFrame([(7,)] * 5, "v long")
    rows = hist_quantile_sketch(const, "v").collect()
    # constant column: every quantile is exactly the constant
    assert len(rows) == 3 and all(r.est == 7 and r.bucket == 0 for r in rows)
    empty = spark.createDataFrame([], "v long")
    assert hist_quantile_sketch(empty, "v").count() == 0
    nulls = spark.createDataFrame([(None,), (None,)], "v long")
    assert hist_quantile_sketch(nulls, "v").count() == 0


def test_hist_quantiles_deterministic_across_partitioning(spark):
    df = spark.createDataFrame([(i % 313,) for i in range(1000)], "v long")
    a = sorted(map(tuple, hist_quantile_sketch(df, "v").collect()))
    b = sorted(map(tuple, hist_quantile_sketch(df.repartition(13), "v").collect()))
    assert a == b
