"""OTTL-lite e2e corpus — port of pkg/ottl/e2e/e2e_test.go cases
(statement applied to a one-row frame; assert the mutated row).

Input row mirrors the reference's constructLogTelemetry fixture:
attributes {http.method: get, http.path: /health, http.url: http://...,
flags: A, total.string: 123456789} over the envelope columns.
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from opentelemetry_collector_contrib_spark.functions.ottl import (
    compile_condition,
    compile_statement,
    drop_cache_columns,
)

ATTRS = {
    "http.method": "get",
    "http.path": "/health",
    "http.url": "http://localhost/health",
    "flags": "A",
    "total.string": "123456789",
}


@pytest.fixture(scope="module")
def row(spark):
    return spark.createDataFrame(
        [(
            "operationA",
            ATTRS,
            bytes.fromhex("0102030405060708090a0b0c0d0e0f10"),
            bytes.fromhex("0102030405060708"),
        )],
        "body string, attributes map<string,string>, trace_id binary, span_id binary",
    )


def run(df, stmt):
    return drop_cache_columns(compile_statement(stmt)(df)).collect()[0]


# --- editors ----------------------------------------------------------------

CASES_EDITORS = [
    ('delete_key(attributes, "http.method")',
     lambda a: "http.method" not in a and a["flags"] == "A"),
    ('delete_matching_keys(attributes, "^http")',
     lambda a: set(a) == {"flags", "total.string"}),
    ('keep_matching_keys(attributes, "^http")',
     lambda a: set(a) == {"http.method", "http.path", "http.url"}),
    ('keep_keys(attributes, ["flags", "total.string"])',
     lambda a: set(a) == {"flags", "total.string"}),
    ('limit(attributes, 100, [])', lambda a: len(a) == 5),
    ('limit(attributes, 1, ["total.string"])',
     lambda a: a == {"total.string": "123456789"}),
    ('replace_all_matches(attributes, "*/*", "test")',
     lambda a: a["http.path"] == "test" and a["http.method"] == "get"),
    ('replace_all_patterns(attributes, "key", "^http", "test")',
     lambda a: "test.method" in a and "flags" in a),
    ('replace_all_patterns(attributes, "value", "/", "@")',
     lambda a: a["http.path"] == "@health"),
    ('replace_match(attributes["http.path"], "*/*", "test")',
     lambda a: a["http.path"] == "test"),
    ('replace_pattern(attributes["http.path"], "/", "@")',
     lambda a: a["http.path"] == "@health"),
    ('set(attributes["test"], "pass")', lambda a: a["test"] == "pass"),
    ('set(attributes["test"], nil)', lambda a: "test" not in a),
    ('set(attributes["test"], attributes["unknown"])',
     lambda a: "test" not in a or a["test"] is None),
    ('truncate_all(attributes, 100)', lambda a: a["total.string"] == "123456789"),
    ('truncate_all(attributes, 1)',
     lambda a: a["http.method"] == "g" and a["total.string"] == "1"),
    ('merge_maps(attributes, ParseJSON("{\\"json_test\\":\\"pass\\"}"), "insert")',
     lambda a: a["json_test"] == "pass" and a["http.method"] == "get"),
]


@pytest.mark.parametrize("stmt,check", CASES_EDITORS, ids=[c[0][:48] for c in CASES_EDITORS])
def test_editor(row, stmt, check):
    out = run(row, stmt)
    assert check(out["attributes"]), f"{stmt} -> {out['attributes']}"


# --- converters --------------------------------------------------------------

CASES_CONVERTERS = [
    ('set(attributes["test"], Base64Decode("cGFzcw=="))', "pass"),
    ('set(attributes["test"], Concat(["A","B"], ":"))', "A:B"),
    ('set(attributes["test"], ConvertCase(attributes["http.method"], "upper"))', "GET"),
    ('set(attributes["test"], ConvertCase("PASS", "lower"))', "pass"),
    ('set(attributes["test"], ConvertCase("fooBar", "snake"))', "foo_bar"),
    ('set(attributes["test"], ConvertCase("foo_bar", "camel"))', "FooBar"),
    ('set(attributes["test"], Double("1"))', "1.0"),
    ('set(attributes["test"], Int("1"))', "1"),
    ('set(attributes["test"], Int(1.9))', "1"),
    ('set(attributes["test"], Len(attributes["total.string"]))', "9"),
    ('set(attributes["test"], SHA256("pass"))',
     "d74ff0ee8da3b9806b18c877dbf29bbde50b5bd8e4dad7a3a725000feb82e8f1"),
    ('set(attributes["test"], Split(attributes["flags"], "|"))', "[A]"),
    ('set(attributes["test"], Substring("pass", 0, 2))', "pa"),
    ('set(attributes["test"], Hour(Time("12", "%H")))', "12"),
    ('set(attributes["test"], Minutes(Duration("1h")))', "60.0"),
    ('set(attributes["test"], Seconds(Duration("100ms")))', "0.1"),
    ('set(attributes["test"], ExtractPatterns("aa123bb", "(?P<numbers>\\\\d+)"))',
     "{numbers -> 123}"),
    ('set(attributes["test"], UnixSeconds(Time("2023-04-12", "%Y-%m-%d")))',
     "1681257600"),
]


@pytest.mark.parametrize("stmt,expected", CASES_CONVERTERS, ids=[c[0][:48] for c in CASES_CONVERTERS])
def test_converter(row, stmt, expected):
    out = run(row, stmt)["attributes"]["test"]
    assert out == expected, f"{stmt} -> {out!r}"


# --- where clauses / conditions ----------------------------------------------

CASES_WHERE = [
    ('set(attributes["test"], "pass") where body == "operationA"', True),
    ('set(attributes["test"], "pass") where body == "operationB"', False),
    ('set(attributes["test"], "pass") where attributes["http.method"] == "get"', True),
    ('set(attributes["test"], "pass") where attributes["unknown"] == "get"', False),
    ('set(attributes["test"], "pass") where IsMatch("aa123bb", "\\\\d{3}")', True),
    ('set(attributes["test"], "pass") where not IsMatch("aa123bb", "\\\\d{3}")', False),
    ('set(attributes["test"], "pass") where Len(attributes["total.string"]) == 9', True),
    ('set(attributes["test"], "pass") where 1 < 2.5', True),   # int/float promotion
    ('set(attributes["test"], "pass") where 3 < 2.5', False),
    ('set(attributes["test"], "pass") where body == "operationA" and attributes["flags"] == "A"', True),
    ('set(attributes["test"], "pass") where body == "x" or attributes["flags"] == "A"', True),
    ('set(attributes["test"], "pass") where Time("10", "%M") - Time("01", "%M") < Duration("10m")', True),
]


@pytest.mark.parametrize("stmt,applied", CASES_WHERE, ids=[c[0][30:78] for c in CASES_WHERE])
def test_where(row, stmt, applied):
    out = run(row, stmt)
    got = out["attributes"].get("test")
    assert (got == "pass") == applied, f"{stmt} -> {out['attributes']}"


def test_cache_scratch(row):
    df = compile_statement('set(cache.tmp, "42")')(row)
    df = compile_statement('set(attributes["test"], cache.tmp)')(df)
    out = drop_cache_columns(df)
    r = out.collect()[0]
    assert r["attributes"]["test"] == "42"
    assert not [c for c in out.columns if c.startswith("__cache_")]


def test_condition_compile(spark):
    df = spark.createDataFrame([(5, "x")], "n int, s string")
    assert df.filter(compile_condition('n * 2 == 10', df)).count() == 1
    assert df.filter(compile_condition('n + 1 > 7', df)).count() == 0


def test_error_modes(row):
    with pytest.raises(NameError):
        compile_statement('bogus_editor(attributes, 1)')
    # unknown converter surfaces at compile; ignore mode still surfaces
    # compile-time errors (parity: reference validates at parse time)
    with pytest.raises(NameError):
        compile_statement('set(attributes["x"], BogusConverter(1))')('x')


# --- additional corpus cases (e2e_test.go parity widening) -------------------

CASES_CONVERTERS_EXTRA = [
    ('set(attributes["test"], SHA1("pass"))',
     "9d4e1e23bd5b727046a9e3b4b7db57bd8d6ee684"),
    ('set(attributes["test"], MD5("pass"))',
     "1a1dc91c907325c69271ddf0c944bc72"),
    ('set(attributes["test"], Hex("pass"))', "70617373"),
    ('set(attributes["test"], Trim("  pass  "))', "pass"),
    ('set(attributes["test"], Format("%s=%s", ["k", "v"]))', "k=v"),
    ('set(attributes["test"], Log(1))', "0.0"),
    ('set(attributes["test"], String(42))', "42"),
    ('set(attributes["test"], Year(Time("2023-04-12", "%Y-%m-%d")))', "2023"),
    ('set(attributes["test"], Month(Time("2023-04-12", "%Y-%m-%d")))', "4"),
    ('set(attributes["test"], Day(Time("2023-04-12", "%Y-%m-%d")))', "12"),
    ('set(attributes["test"], UnixMilli(Time("1970-01-01T00:00:01", "%Y-%m-%dT%H:%M:%S")))', "1000"),
    ('set(attributes["test"], UnixMicro(Time("1970-01-01T00:00:01", "%Y-%m-%dT%H:%M:%S")))', "1000000"),
    ('set(attributes["test"], UnixNano(Time("1970-01-01T00:00:01", "%Y-%m-%dT%H:%M:%S")))', "1000000000"),
    ('set(attributes["test"], TruncateTime(Time("2023-04-12T07:08:09", "%Y-%m-%dT%H:%M:%S"), Duration("1h")))',
     "2023-04-12 07:00:00"),
    ('set(attributes["test"], Hours(Duration("90m")))', "1.5"),
    ('set(attributes["test"], Milliseconds(Duration("1s")))', "1000.0"),
    ('set(attributes["test"], Microseconds(Duration("1ms")))', "1000.0"),
    ('set(attributes["test"], Nanoseconds(Duration("1us")))', "1000.0"),
    ('set(attributes["test"], Sort(Split("b,a,c", ","), "asc"))', "[a, b, c]"),
    ('set(attributes["test"], Sort(Split("b,a,c", ","), "desc"))', "[c, b, a]"),
    ('set(attributes["test"], Concat(Keys(ParseJSON("{\\"x\\":\\"1\\"}")), ","))', "x"),
    ('set(attributes["test"], Concat(Values(ParseJSON("{\\"x\\":\\"1\\"}")), ","))', "1"),
    ('set(attributes["test"], ParseKeyValue("k1=v1 k2=v2")["k2"])', "v2"),
    ('set(attributes["test"], ParseCSV("a,b,c", "h1,h2,h3")["h3"])', "c"),
    ('set(attributes["test"], URL("https://ex.com/p?q=1")["url.scheme"])', "https"),
    ('set(attributes["test"], URL("https://ex.com/p?q=1")["url.domain"])', "ex.com"),
    ('set(attributes["test"], ExtractPatterns("code=7 x", "code=(?P<num>\\\\d+)")["num"])', "7"),
    ('set(attributes["test"], IsMatch(attributes["http.method"], "^g"))', "true"),
    ('set(attributes["test"], Substring(attributes["total.string"], 3, 3))', "456"),
    ('set(attributes["test"], Minute(Time("2023-04-12T07:08:09", "%Y-%m-%dT%H:%M:%S")))', "8"),
    # func_unix.go: Unix(seconds[, nanos]) -> timestamp
    ('set(attributes["test"], UnixSeconds(Unix(1681257600)))', "1681257600"),
    ('set(attributes["test"], UnixMicro(Unix(1, 500000)))', "1000500"),
    ('set(attributes["test"], Hour(Unix(3600)))', "1"),
]


@pytest.mark.parametrize("stmt,expected", CASES_CONVERTERS_EXTRA,
                         ids=[c[0][25:73] for c in CASES_CONVERTERS_EXTRA])
def test_converter_extra(row, stmt, expected):
    out = run(row, stmt)["attributes"]["test"]
    assert out == expected, f"{stmt} -> {out!r}"


CASES_WHERE_EXTRA = [
    ('set(attributes["test"], "pass") where IsString(body)', True),
    # Is* are TYPE predicates (func_is_int.go): a STRING holding "123"
    # is not an int — IsInt("123") is false in the reference too
    ('set(attributes["test"], "pass") where IsInt(attributes["total.string"])', False),
    ('set(attributes["test"], "pass") where IsInt(Int(attributes["total.string"]))', True),
    ('set(attributes["test"], "pass") where IsInt(body)', False),
    ('set(attributes["test"], "pass") where IsDouble(attributes["total.string"])', False),
    ('set(attributes["test"], "pass") where IsDouble(Double(attributes["total.string"]))', True),
    # reference e2e cases, verbatim (e2e_test.go:421-451,669)
    ('set(attributes["test"], "pass") where IsBool(false)', True),
    ('set(attributes["test"], "pass") where IsDouble(1.0)', True),
    ('set(attributes["test"], "pass") where IsString("")', True),
    ('set(attributes["test"], "pass") where IsString(UUID())', True),
    ('set(attributes["test"], "pass") where IsString(attributes["unknown"])', False),
    ('set(attributes["test"], "pass") where Int(attributes["total.string"]) > 1000', True),
    ('set(attributes["test"], "pass") where Len(body) == 10', True),
    ('set(attributes["test"], "pass") where attributes["flags"] != "B"', True),
    ('set(attributes["test"], "pass") where 2 * 3 == 6 and 10 / 2 == 5', True),
    ('set(attributes["test"], "pass") where 7 - 3 >= 5', False),
    ('set(attributes["test"], "pass") where not (1 == 1 and 2 == 3)', True),
    # func_is_map.go / func_is_list.go: TYPE predicates (schema-resolved)
    ('set(attributes["test"], "pass") where IsMap(attributes)', True),
    ('set(attributes["test"], "pass") where IsList(attributes)', False),
    ('set(attributes["test"], "pass") where IsMap(body)', False),
    ('set(attributes["test"], "pass") where IsList(Split(attributes["flags"], "|"))', True),
    # func_trace_id.go / func_span_id.go: id literals compare against binary ids
    ('set(attributes["test"], "pass") where trace_id == TraceID(0x0102030405060708090a0b0c0d0e0f10)', True),
    ('set(attributes["test"], "pass") where span_id == SpanID(0x0102030405060708)', True),
    ('set(attributes["test"], "pass") where span_id == SpanID(0xffffffffffffffff)', False),
]


@pytest.mark.parametrize("stmt,applied", CASES_WHERE_EXTRA,
                         ids=[c[0][38:86] for c in CASES_WHERE_EXTRA])
def test_where_extra(row, stmt, applied):
    out = run(row, stmt)
    got = out["attributes"].get("test")
    assert (got == "pass") == applied, f"{stmt} -> {out['attributes']}"


def test_set_ids_from_literals(row):
    # e2e_test.go: set(span_id, SpanID(0x...)) / set(trace_id, TraceID(0x...))
    out = run(row, "set(span_id, SpanID(0x0000000000000000))")
    assert out["span_id"] == bytes(8)
    out = run(row, "set(trace_id, TraceID(0x00000000000000000000000000000000))")
    assert out["trace_id"] == bytes(16)
    with pytest.raises(ValueError):
        compile_statement("set(span_id, SpanID(0x01))")(row)


def test_flatten_expands_nested_json_values(row):
    # func_flatten.go: nested maps -> dotted keys; scalars untouched
    df = compile_statement(
        'set(attributes["nest"], "{\\"a\\":\\"1\\",\\"b\\":\\"2\\"}")'
    )(row)
    out = run(df, "flatten(attributes)")["attributes"]
    assert out["nest.a"] == "1" and out["nest.b"] == "2"
    assert "nest" not in out
    assert out["http.method"] == "get"  # scalar values pass through
    # two-level nesting unrolls with the default depth
    df2 = compile_statement(
        'set(attributes["deep"], "{\\"x\\":\\"{\\\\\\"y\\\\\\":\\\\\\"3\\\\\\"}\\"}")'
    )(row)
    out2 = run(df2, "flatten(attributes)")["attributes"]
    assert out2["deep.x.y"] == "3"


def test_parse_xml_e2e_shape(row):
    # e2e_test.go ParseXML case: {tag, attributes, children:[{tag, content}]}
    out = run(
        row,
        'set(xml, ParseXML("<Log id=\\"1\\"><Message>This is a log message!</Message></Log>"))',
    )["xml"]
    assert out["tag"] == "Log"
    assert out["content"] is None
    assert dict(out["attributes"]) == {"id": "1"}
    children = out["children"]
    assert len(children) == 1
    assert children[0]["tag"] == "Message"
    assert children[0]["content"] == "This is a log message!"
    assert children[0]["attributes"] is None


def test_parse_xml_depth_and_selfclose(row):
    out = run(
        row,
        'set(xml, ParseXML("<a x=\\"1\\"><b><c>deep</c></b><d/>tail</a>"))',
    )["xml"]
    assert out["tag"] == "a" and out["content"] == "tail"
    tags = [c["tag"] for c in out["children"]]
    assert tags == ["b", "d"]
    b = out["children"][0]
    assert b["children"][0]["tag"] == "c"
    assert b["children"][0]["content"] == "deep"
    # malformed XML -> null fields, row survives (ignore-mode semantics)
    bad = run(row, 'set(xml, ParseXML("not xml at all"))')["xml"]
    assert bad["tag"] is None


def test_float_lexer_forms():
    # grammar.go:434 Float = [-+]?\d*\.\d+([eE][-+]?\d+)? — exponents
    # and bare-dot forms are valid OTTL floats
    from opentelemetry_collector_contrib_spark.functions.ast import Lit, Parser

    for text, want in [
        ('set(attributes["x"], 3.14e2)', 314.0),
        ('set(attributes["x"], .5)', 0.5),
        ('set(attributes["x"], -.5)', -0.5),
        ('set(attributes["x"], 1.5E-3)', 0.0015),
        ('set(attributes["x"], +2.5)', 2.5),
    ]:
        st = Parser(text).parse_statement()
        lit = st.editor.args[1]
        assert isinstance(lit, Lit) and lit.value == want, text
