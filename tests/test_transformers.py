"""Transformer + recombine tests (model: reference
pkg/stanza/operator/transformer/*_test.go table cases)."""

from __future__ import annotations

import pytest

from opentelemetry_collector_contrib_spark.operators import (
    Add,
    AssignKeys,
    Copy,
    Filter,
    Move,
    Recombine,
    Remove,
    Retain,
    Router,
    Unquote,
    chain,
)


@pytest.fixture(scope="module")
def df(spark):
    return spark.createDataFrame(
        [
            (1, "ERROR", "a", {"k1": "v1", "k2": "v2"}),
            (2, "INFO", "b", {"k1": "x"}),
            (3, "ERROR", "c", {}),
        ],
        "id int, level string, body string, attributes map<string,string>",
    )


def test_add_literal_and_expr(df):
    out = Add("env", value="prod")(df).collect()[0]
    assert out["env"] == "prod"
    out = Add("attributes.lvl", expr="lower(level)")(df).orderBy("id").collect()
    assert out[0]["attributes"]["lvl"] == "error"
    assert out[0]["attributes"]["k1"] == "v1"


def test_add_if_guard(df):
    out = Add("flag", value="hot", if_expr="level = 'ERROR'")(df).orderBy("id").collect()
    assert [r["flag"] for r in out] == ["hot", None, "hot"]


def test_remove(df):
    assert "level" not in Remove("level")(df).columns
    out = Remove("attributes.k1")(df).orderBy("id").collect()
    assert "k1" not in out[0]["attributes"] and out[0]["attributes"]["k2"] == "v2"
    out = Remove("attributes")(df).collect()[0]
    assert out["attributes"] == {}


def test_copy_move(df):
    out = Copy("level", "attributes.level")(df).orderBy("id").collect()
    assert out[0]["attributes"]["level"] == "ERROR"
    out = Move("level", "sev")(df)
    assert "level" not in out.columns and out.orderBy("id").collect()[0]["sev"] == "ERROR"


def test_retain(df):
    out = Retain(["id", "attributes.k1"])(df)
    assert set(out.columns) == {"id", "attributes"}
    rows = out.orderBy("id").collect()
    assert rows[0]["attributes"] == {"k1": "v1"}


def test_assign_keys(spark):
    df = spark.createDataFrame([([10, 20],)], "vals array<int>")
    out = AssignKeys("vals", ["a", "b"])(df).collect()[0]
    assert out["vals"] == {"a": 10, "b": 20}


def test_unquote(spark):
    df = spark.createDataFrame([('"hi"',), ("'x'",), ("plain",), ('"half',)], "body string")
    out = [r["body"] for r in Unquote("body")(df).collect()]
    assert sorted(out) == sorted(["hi", "x", "plain", '"half'])


def test_filter_drops_matching(df):
    out = Filter("level = 'ERROR'")(df).collect()
    assert [r["id"] for r in out] == [2]


def test_filter_null_cond_kept(spark):
    df = spark.createDataFrame([(1, None), (2, "y")], "id int, v string")
    out = Filter("v = 'y'")(df).collect()
    assert [r["id"] for r in out] == [1]


def test_router_first_match_wins(df):
    routes = [("level = 'ERROR'", "errors"), ("body = 'a'", "abody")]
    out = Router(routes)(df).orderBy("id").collect()
    # id=1 matches both -> first route wins (router/transformer.go:42-60 break)
    assert [r["route"] for r in out] == ["errors", "default", "errors"]


def test_router_no_default_drops(df):
    out = Router([("level = 'FATAL'", "f")], default=None)(df).collect()
    assert out == []


def test_recombine_basic(spark):
    rows = [
        ("c1", 0, "START a", "u"),
        ("c1", 1, "b", "a"),
        ("c1", 2, "START c", "u"),
        ("c1", 3, "d", "a"),
        ("c2", 0, "START x", "u"),
    ]
    df = spark.createDataFrame(rows, "conv_id string, turn_idx int, text string, role string")
    out = (
        Recombine(is_first_entry="text like 'START%'")(df)
        .orderBy("conv_id", "turn_idx")
        .collect()
    )
    assert [(r["conv_id"], r["text"]) for r in out] == [
        ("c1", "START a\nb"),
        ("c1", "START c\nd"),
        ("c2", "START x"),
    ]
    # oldest row supplies non-combined fields
    assert out[0]["turn_idx"] == 0 and out[0]["role"] == "u"
    assert out[1]["turn_idx"] == 2


def test_recombine_is_last_entry(spark):
    rows = [("c", 0, "a"), ("c", 1, "b END"), ("c", 2, "x"), ("c", 3, "y END")]
    df = spark.createDataFrame(rows, "conv_id string, turn_idx int, text string")
    out = Recombine(is_last_entry="text like '% END'")(df).orderBy("turn_idx").collect()
    assert [r["text"] for r in out] == ["a\nb END", "x\ny END"]


def test_recombine_max_batch_size(spark):
    rows = [("c", i, f"t{i}") for i in range(5)]
    df = spark.createDataFrame(rows, "conv_id string, turn_idx int, text string")
    out = Recombine(max_batch_size=2)(df).orderBy("turn_idx").collect()
    assert [r["text"] for r in out] == ["t0\nt1", "t2\nt3", "t4"]


def test_recombine_max_log_size_flush_on_overflow(spark):
    # transformer.go:173-189: append (separator counted), then flush
    # when the combined length EXCEEDS max_log_size — the overflowing
    # row stays in the batch it overflowed
    rows = [("c", 0, "aaaa"), ("c", 1, "bbbb"), ("c", 2, "cc"), ("c", 3, "dd")]
    df = spark.createDataFrame(rows, "conv_id string, turn_idx int, text string")
    out = Recombine(max_log_size=8)(df).orderBy("turn_idx").collect()
    # aaaa(4); +bbbb -> 4+1+4=9 > 8 -> flush WITH bbbb; cc+dd = 5 <= 8
    assert [r["text"] for r in out] == ["aaaa\nbbbb", "cc\ndd"]
    assert [r["turn_idx"] for r in out] == [0, 2]
    # cap smaller than one row: each oversized row flushes alone; the
    # small tail rows combine until they overflow together
    out = Recombine(max_log_size=3)(df).orderBy("turn_idx").collect()
    assert [r["text"] for r in out] == ["aaaa", "bbbb", "cc\ndd"]


def test_recombine_max_log_size_respects_boundaries(spark):
    rows = [("c", 0, "START aaaa"), ("c", 1, "bbbb"), ("c", 2, "START x")]
    df = spark.createDataFrame(rows, "conv_id string, turn_idx int, text string")
    out = (
        Recombine(is_first_entry="text like 'START%'", max_log_size=100)(df)
        .orderBy("turn_idx")
        .collect()
    )
    assert [r["text"] for r in out] == ["START aaaa\nbbbb", "START x"]


def test_recombine_max_unmatched_batch_size(spark):
    # three rows arrive BEFORE the first boundary match; cap batches them
    rows = [("c", 0, "a"), ("c", 1, "b"), ("c", 2, "c"),
            ("c", 3, "START d"), ("c", 4, "e")]
    df = spark.createDataFrame(rows, "conv_id string, turn_idx int, text string")
    out = (
        Recombine(is_first_entry="text like 'START%'", max_unmatched_batch_size=2)(df)
        .orderBy("turn_idx")
        .collect()
    )
    assert [r["text"] for r in out] == ["a\nb", "c", "START d\ne"]


def test_recombine_salted_identical_output_on_hot_key(spark):
    # a 100x-hot conversation: salting must produce byte-identical output
    rows = [("hot", i, ("START " if i % 7 == 0 else "") + f"t{i}") for i in range(700)]
    rows += [("cold", i, ("START " if i % 3 == 0 else "") + f"s{i}") for i in range(9)]
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, text string"
    ).repartition(8)
    plain = Recombine(is_first_entry="text like 'START%'")(df)
    salted = Recombine(is_first_entry="text like 'START%'", salt_chunk=50)(df)
    key = lambda r: (r["conv_id"], r["turn_idx"])
    assert sorted(map(tuple, plain.collect()), key=lambda t: (t[0], t[1])) == \
           sorted(map(tuple, salted.collect()), key=lambda t: (t[0], t[1]))
    # salting + is_last_entry is rejected (needs the previous row)
    import pytest

    with pytest.raises(ValueError):
        Recombine(is_last_entry="true", salt_chunk=10)
    with pytest.raises(ValueError):
        Recombine(is_first_entry="true", salt_chunk=0)


def test_recombine_newest(spark):
    rows = [("c", 0, "a", "first"), ("c", 1, "b", "last")]
    df = spark.createDataFrame(rows, "conv_id string, turn_idx int, text string, tag string")
    out = Recombine(overwrite_with="newest")(df).collect()[0]
    assert out["text"] == "a\nb" and out["tag"] == "last"


def test_recombine_whole_conversation_roundtrip(spark):
    """Per-turn text equality under stable (conv_id, turn_idx) ordering —
    the north-rule invariant: splitting the combined text recovers every
    turn in order."""
    from opentelemetry_collector_contrib_spark.data import synth_transcripts

    t = synth_transcripts(spark, n_conv=20, max_turns=5)
    combined = Recombine(combine_with="\x1f")(t)
    from pyspark.sql import functions as SF
    back = combined.select("conv_id", SF.split("text", "\x1f").alias("turns"))
    orig = {
        r["conv_id"]: [x["text"] for x in sorted(r["rows"], key=lambda y: y["turn_idx"])]
        for r in t.groupBy("conv_id")
        .agg(__import__("pyspark").sql.functions.collect_list(
            __import__("pyspark").sql.functions.struct("turn_idx", "text")).alias("rows"))
        .collect()
    }
    got = {r["conv_id"]: list(r["turns"]) for r in back.collect()}
    assert got == orig


def test_chain(df):
    out = chain(df, [Add("x", value=1), Filter("level = 'ERROR'"), Remove("body")])
    rows = out.collect()
    assert len(rows) == 1 and rows[0]["x"] == 1 and "body" not in out.columns
