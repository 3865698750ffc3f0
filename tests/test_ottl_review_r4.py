"""Regression tests for the round-4 OTTL-compiler review findings:
editor nil semantics (func_set.go/func_delete_key.go no-op rules),
const-arg contract, append on scalar columns, tokenizer/parser math,
instrumentation_scope path strictness, TruncateTime duration guard.
"""

from __future__ import annotations

import pytest

from opentelemetry_collector_contrib_spark.functions import (
    compile_statement,
)
from opentelemetry_collector_contrib_spark.functions.ast import (
    parse_statement,
)

DDL = "body string, severity_number int, attributes map<string,string>"


def _df(spark):
    return spark.createDataFrame(
        [("hello", 9, {"a": "1", "b": "2"})], DDL
    )


def test_append_scalar_column_without_where(spark):
    out = compile_statement('append(body, "x")')(_df(spark)).collect()[0]
    assert list(out.body) == ["hello", "x"]


def test_keep_keys_non_literal_raises(spark):
    with pytest.raises(ValueError, match="literal list"):
        compile_statement('keep_keys(attributes, attributes["a"])')(_df(spark))


def test_delete_key_null_key_is_noop(spark):
    out = compile_statement(
        'delete_key(attributes, attributes["missing"])'
    )(_df(spark)).collect()[0]
    assert dict(out.attributes) == {"a": "1", "b": "2"}


def test_set_map_key_nil_value_keeps_existing(spark):
    # Int("zz") is nil -> func_set.go no-op: attributes["a"] survives
    out = compile_statement('set(attributes["a"], Int("zz"))')(
        _df(spark)
    ).collect()[0]
    assert dict(out.attributes) == {"a": "1", "b": "2"}


def test_binary_minus_without_space(spark):
    st = parse_statement("set(cache.x, severity_number -1)")
    assert st is not None
    out = compile_statement("set(body, String(severity_number -1))")(
        _df(spark)
    ).collect()[0]
    assert out.body == "8"


def test_negative_literal_still_parses(spark):
    out = compile_statement("set(body, String(-3))")(_df(spark)).collect()[0]
    assert out.body == "-3"


def test_parenthesized_math_in_where(spark):
    out = compile_statement(
        'set(body, "hit") where (severity_number + 1) * 2 > 10'
    )(_df(spark)).collect()[0]
    assert out.body == "hit"   # (9+1)*2 = 20 > 10


def test_instrumentation_scope_subpath_rejected(spark):
    df = _df(spark).withColumn(
        "scope", __import__("pyspark.sql.functions", fromlist=["lit"]).lit("s")
    )
    compile_statement('set(body, instrumentation_scope.name)')(df)  # ok
    with pytest.raises(ValueError, match="instrumentation_scope"):
        compile_statement('set(body, instrumentation_scope.version)')(df)


def test_truncate_time_subsecond_rejected(spark):
    df = spark.createDataFrame(
        [("2024-01-01 00:00:01.5",)], "raw string"
    ).selectExpr("CAST(raw AS TIMESTAMP) AS ts", "'b' AS body")
    with pytest.raises(ValueError, match="whole-second"):
        compile_statement('set(ts, TruncateTime(ts, Duration("100ms")))')(df)
