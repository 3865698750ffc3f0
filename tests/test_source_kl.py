"""source_kl_divergence — per-source hashed-unigram KL vs the corpus.

Hand-computed expectations on a tiny two-source frame (replicating the
exact smoothing + ln-then-quantize arithmetic in Python), invariants
(KL >= 0 up to quantization, uniform source ~ 0), degenerate inputs,
and the no-Python plan guard. DuckDB value-lockstep runs via
tools/ansi_sweep.py and the driver gate.
"""

from __future__ import annotations

import hashlib
import math

import pytest

from opentelemetry_collector_contrib_spark.training.sampling import (
    source_kl_divergence,
)


def _bucket(tok: str, n: int) -> int:
    return int(hashlib.md5(tok.encode()).hexdigest()[:15], 16) % n


def _expected(per_source_tokens: dict[str, list[str]], n_buckets: int):
    counts: dict[tuple[str, int], int] = {}
    for s, toks in per_source_tokens.items():
        for t in toks:
            b = _bucket(t, n_buckets)
            counts[(s, b)] = counts.get((s, b), 0) + 1
    n = sum(counts.values())
    cb = {}
    for (s, b), c in counts.items():
        cb[b] = cb.get(b, 0) + c
    out = {}
    for s, toks in per_source_tokens.items():
        n_s = len(toks)
        if n_s == 0:
            continue
        kl = 0
        for b in range(n_buckets):
            p_s = (counts.get((s, b), 0) + 1.0) / (n_s + n_buckets)
            p_c = (cb.get(b, 0) + 1.0) / (n + n_buckets)
            kl += math.floor(p_s * (math.log(p_s) - math.log(p_c)) * 1e8 + 0.5)
    # noqa: E501 — quantize each term, THEN sum: the operator's exact rule
        out[s] = (n_s, kl)
    return out


def test_hand_computed_two_sources(spark):
    data = {
        "a": ["x1", "x1", "x2", "x3"],
        "b": ["y1", "y2"],
    }
    rows = [(s, " ".join(toks)) for s, toks in data.items()]
    df = spark.createDataFrame(rows, "source string, text string")
    got = {
        r["source"]: (r["n_tokens"], r["kl_q8"])
        for r in source_kl_divergence(df, n_buckets=8).collect()
    }
    assert got == _expected(data, 8)


def test_identical_sources_symmetric(spark):
    # two sources with the SAME token multiset must get the SAME
    # divergence (note it is NOT ~0 at tiny n: add-one smoothing uses
    # n_s=3 vs n=6 denominators, so smoothed p_s != smoothed p_c —
    # the bias vanishes as n_s grows, but symmetry holds exactly)
    df = spark.createDataFrame(
        [("a", "t1 t2 t3"), ("b", "t1 t2 t3")],
        "source string, text string",
    )
    out = {r["source"]: r["kl_q8"] for r in source_kl_divergence(df, 8).collect()}
    assert out["a"] == out["b"]


def test_kl_nonnegative_and_disjoint_sources_positive(spark):
    df = spark.createDataFrame(
        [("a", "x x x x"), ("b", "y y y y")],
        "source string, text string",
    )
    out = {r["source"]: r["kl_q8"] for r in source_kl_divergence(df, 16).collect()}
    for s, kl in out.items():
        assert kl >= -16  # Gibbs: true KL >= 0; quantization can dip 1/bucket
        assert kl > 1000  # disjoint vocabularies diverge visibly


def test_empty_and_null_sources_emit_no_row(spark):
    df = spark.createDataFrame(
        [("a", "tok tok2"), ("empty", ""), ("nulls", None)],
        "source string, text string",
    )
    out = source_kl_divergence(df, 8).collect()
    assert {r["source"] for r in out} == {"a"}


def test_no_python_in_plan(spark):
    df = spark.createDataFrame([("a", "x y z")], "source string, text string")
    plan = (
        source_kl_divergence(df, 8)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # whole pipeline stays JVM-side; the only nested-loop join allowed
    # is the broadcast of the 1-row totals aggregate
    assert "BatchEvalPython" not in plan
    assert "CartesianProduct" not in plan
