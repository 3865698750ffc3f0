"""Table-driven parser tests (model: reference operator unit tests,
e.g. pkg/stanza/operator/parser/regex/parser_test.go)."""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import functions as F

from opentelemetry_collector_contrib_spark.operators import (
    CsvParser,
    JsonArrayParser,
    JsonParser,
    KeyValueParser,
    RegexParser,
    SeverityParser,
    TimeParser,
    TraceParser,
    UriParser,
)
from opentelemetry_collector_contrib_spark.operators.parsers import strptime_to_jvm

LINE = "at=2024-01-01T02:22:23 ERROR [bash] evt=error code=4 dur_ms=29 k=76"
BAD = "garbled error !!"
PATTERN = (
    r"^at=(?P<at>\S+) (?P<level>[A-Z]+) \[(?P<tool_name>\w+)\] "
    r"evt=(?P<evt>\w+) code=(?P<code>\d+) dur_ms=(?P<dur_ms>\d+) k=(?P<k>\d+)$"
)


@pytest.fixture(scope="module")
def lines(spark):
    return spark.createDataFrame([(1, LINE), (2, BAD)], "id int, body string")


def test_regex_named_groups_send(lines):
    out = RegexParser(PATTERN, on_error="send")(lines).orderBy("id").collect()
    assert len(out) == 2  # send keeps the malformed row
    assert out[0]["level"] == "ERROR" and out[0]["code"] == "4"
    assert out[0]["tool_name"] == "bash" and out[0]["dur_ms"] == "29"
    assert out[1]["level"] is None  # unparsed row passes through unmodified


def test_regex_drop(lines):
    out = RegexParser(PATTERN, on_error="drop")(lines).collect()
    assert len(out) == 1 and out[0]["id"] == 1


def test_regex_if_guard_excludes_rows_from_drop(lines):
    # rows excluded by `if` are NOT parse failures -> survive drop mode
    out = RegexParser(PATTERN, on_error="drop", if_expr="id = 1")(lines).collect()
    assert {r["id"] for r in out} == {1, 2}
    by_id = {r["id"]: r for r in out}
    assert by_id[1]["level"] == "ERROR" and by_id[2]["level"] is None


def test_regex_parse_to_attributes(spark):
    df = spark.createDataFrame(
        [(LINE, {"pre": "x"})], "body string, attributes map<string,string>"
    )
    out = RegexParser(PATTERN, parse_to="attributes")(df).collect()[0]
    assert out["attributes"]["level"] == "ERROR"
    assert out["attributes"]["pre"] == "x"  # existing keys preserved


def test_regex_requires_named_groups():
    with pytest.raises(ValueError):
        RegexParser(r"(\d+)")


def test_regex_java_group_syntax(lines):
    out = RegexParser(r"(?<level>[A-Z]{4,5}) ")(lines).orderBy("id").collect()
    assert out[0]["level"] == "ERROR"


def test_json_parser_map_and_schema(spark):
    df = spark.createDataFrame(
        [(1, '{"a": "x", "b": 2}'), (2, "not json")], "id int, body string"
    )
    out = JsonParser(parse_to="parsed")(df).orderBy("id").collect()
    assert out[0]["parsed"]["a"] == "x" and out[1]["parsed"] is None
    typed = JsonParser(schema="a string, b int")(df).orderBy("id").collect()
    assert typed[0]["b"] == 2
    dropped = JsonParser(parse_to="parsed", on_error="drop")(df).collect()
    assert len(dropped) == 1


def test_csv_parser(spark):
    df = spark.createDataFrame([("a,1,z",)], "body string")
    out = CsvParser(header=["x", "y", "z"])(df).collect()[0]
    assert (out["x"], out["y"], out["z"]) == ("a", "1", "z")


def test_csv_parser_option_parity(spark):
    from opentelemetry_collector_contrib_spark.operators import CsvParser

    # ignore_quotes: quotes carry no meaning -> plain split; the split
    # of 'a,"b,c",d' yields 4 tokens vs 3 headers, which MapCSVHeaders
    # rejects (parseutils/csv.go:73-76) — the row errors to nulls
    df = spark.createDataFrame([('a,"b,c",d',)], "body string")
    r = CsvParser(header=["x", "y", "z"], ignore_quotes=True)(df).collect()[0]
    assert (r.x, r.y, r.z) == (None, None, None)
    r = CsvParser(header=["x", "y", "z", "w"], ignore_quotes=True)(df).collect()[0]
    assert (r.x, r.y, r.z, r.w) == ("a", '"b', 'c"', "d")
    # default quote handling keeps the quoted field together
    r = CsvParser(header=["x", "y", "z"])(df).collect()[0]
    assert (r.x, r.y, r.z) == ("a", "b,c", "d")
    # lazy_quotes: a bare quote inside an unquoted field survives
    df2 = spark.createDataFrame([('a,b"m,c',)], "body string")
    r = CsvParser(header=["x", "y", "z"], lazy_quotes=True)(df2).collect()[0]
    assert r.x == "a" and r.z == "c"
    # header_attribute: per-row dynamic header -> map column
    df3 = spark.createDataFrame(
        [("1,2", "c1,c2"), ("3,4,5", "k1,k2,k3")], "body string, hdr string"
    )
    out = {tuple(sorted(dict(r.parsed).items()))
           for r in CsvParser(header_attribute="hdr")(df3).collect()}
    assert (("c1", "1"), ("c2", "2")) in out
    assert (("k1", "3"), ("k2", "4"), ("k3", "5")) in out


def test_scope_name_parser(spark):
    from opentelemetry_collector_contrib_spark.operators import ScopeNameParser

    df = spark.createDataFrame([("m", "com.example.Lib")], "body string, logger string")
    out = ScopeNameParser(parse_from="logger")(df).collect()[0]
    assert out["scope"] == "com.example.Lib"


def test_kv_parser_lenient_extracts_embedded_pairs(lines):
    out = KeyValueParser(parse_to=None, keys=["code", "dur_ms"])(lines).orderBy("id").collect()
    assert out[0]["code"] == "4" and out[0]["dur_ms"] == "29"
    assert out[1]["code"] is None


def test_kv_parser_to_attributes(spark):
    df = spark.createDataFrame(
        [(LINE, {"code": "old", "keep": "1"})],
        "body string, attributes map<string,string>",
    )
    out = KeyValueParser()(df).collect()[0]
    assert out["attributes"]["code"] == "4"  # upserted
    assert out["attributes"]["keep"] == "1"


def test_kv_parser_quoted_values(spark):
    from opentelemetry_collector_contrib_spark.operators import KeyValueParser

    df = spark.createDataFrame(
        [('msg="hello world" code=7 path="/a b"',)], "body string"
    )
    out = KeyValueParser(parse_to=None, keys=["msg", "code", "path"])(df).collect()[0]
    assert out["msg"] == "hello world"
    assert out["code"] == "7"
    assert out["path"] == "/a b"


def test_kv_parser_strict(spark):
    df = spark.createDataFrame([("a=1 b=2",)], "body string")
    out = KeyValueParser(strict=True, parse_to="m")(df).collect()[0]
    assert out["m"] == {"a": "1", "b": "2"}


def test_strptime_translation():
    assert strptime_to_jvm("%Y-%m-%dT%H:%M:%S") == "yyyy-MM-dd'T'HH:mm:ss"
    assert strptime_to_jvm("%b %e %H:%M:%S") == "MMM d HH:mm:ss"
    with pytest.raises(ValueError):
        strptime_to_jvm("%Q")


def test_time_parser_strptime(spark):
    df = spark.createDataFrame([(1, "2024-03-05T10:11:12"), (2, "nope")], "id int, t string")
    out = TimeParser(parse_from="t", on_error="send")(df).orderBy("id").collect()
    assert out[0]["ts"] == datetime.datetime(2024, 3, 5, 10, 11, 12)
    assert out[1]["ts"] is None
    assert len(TimeParser(parse_from="t", on_error="drop")(df).collect()) == 1


def test_gotime_translation_and_parse(spark):
    from opentelemetry_collector_contrib_spark.operators import TimeParser
    from opentelemetry_collector_contrib_spark.operators.parsers import gotime_to_jvm

    assert gotime_to_jvm("2006-01-02T15:04:05") == "yyyy-MM-dd'T'HH:mm:ss"
    assert gotime_to_jvm("Jan 2 15:04:05") == "MMM d HH:mm:ss"
    assert gotime_to_jvm("01/02/2006 03:04 PM") == "MM/dd/yyyy hh:mm a"
    df = spark.createDataFrame(
        [("Apr 12 07:08:09",), ("12/31/2023 11:59 PM",)], "body string"
    )
    r = TimeParser(layout="Jan 2 15:04:05", layout_type="gotime",
                   to_field="t1")(df.filter("body like 'Apr%'")).collect()[0]
    assert (r.t1.month, r.t1.day, r.t1.second) == (4, 12, 9)
    r = TimeParser(layout="01/02/2006 03:04 PM", layout_type="gotime",
                   to_field="t2")(df.filter("body like '12%'")).collect()[0]
    assert (r.t2.year, r.t2.hour, r.t2.minute) == (2023, 23, 59)


def test_time_parser_epoch(spark):
    df = spark.createDataFrame([("1704067200",)], "t string")
    for layout, val in [("s", 1704067200), ("ms", 1704067.2)]:
        pass
    out = TimeParser(parse_from="t", layout="s", layout_type="epoch")(df).collect()[0]
    assert out["ts"] == datetime.datetime(2024, 1, 1, 0, 0)


def test_severity_parser(spark):
    df = spark.createDataFrame(
        [(1, "err"), (2, "WARNING"), (3, "bogus")], "id int, severity_text string"
    )
    out = SeverityParser()(df).orderBy("id").collect()
    assert (out[0]["severity_number"], out[0]["severity_text"]) == (17, "ERROR")
    assert (out[1]["severity_number"], out[1]["severity_text"]) == (13, "WARN")
    assert (out[2]["severity_number"], out[2]["severity_text"]) == (0, "BOGUS")


def test_severity_stanza_mapping_ranges_and_http(spark):
    """severity_builder.go:88-199: stanza orientation with {min,max}
    ranges and the 2xx/4xx HTTP buckets."""
    df = spark.createDataFrame(
        [(1, "404"), (2, "204"), (3, "oops"), (4, "3")],
        "id int, severity_text string",
    )
    sp = SeverityParser(stanza_mapping={
        "error": ["oops", "4xx"],
        "info": "2xx",
        "debug": {"min": 1, "max": 5},
    })
    out = {r.id: r for r in sp(df).collect()}
    assert out[1].severity_number == 17 and out[1].severity_text == "ERROR"
    assert out[2].severity_number == 9   # 204 in 2xx -> info
    assert out[3].severity_number == 17  # alias
    assert out[4].severity_number == 5   # 3 in [1,5] -> debug
    import pytest

    with pytest.raises(ValueError):
        SeverityParser(stanza_mapping={"bogus": "x"})


def test_trace_parser(spark):
    df = spark.createDataFrame([("0102ab", "ff01")], "t string, s string")
    out = TraceParser(trace_from="t", span_from="s")(df).collect()[0]
    assert out["trace_id"] == bytearray(b"\x01\x02\xab")
    assert out["span_id"] == bytearray(b"\xff\x01")


def test_uri_parser(spark):
    df = spark.createDataFrame(
        [("https://example.com:8080/a/b?x=1&y=2",)], "body string"
    )
    out = UriParser()(df).collect()[0]
    assert out["scheme"] == "https"
    assert out["host"] == "example.com"
    assert out["path"] == "/a/b"
    assert out["query"] == "x=1&y=2"


def test_json_array_parser(spark):
    df = spark.createDataFrame([('["a","b","c"]',)], "body string")
    out = JsonArrayParser(header=["one", "two", "three"])(df).collect()[0]
    assert (out["one"], out["two"], out["three"]) == ("a", "b", "c")


# --- syslog parser (parser/syslog/parser.go:39-319) -------------------------

def test_syslog_rfc5424(spark):
    from opentelemetry_collector_contrib_spark.operators import SyslogParser

    line = "<165>1 2024-01-02T03:04:05 web01 nginx 4242 ID47 - GET /index"
    df = spark.createDataFrame([(line,), ("not syslog",)], "body string")
    out = {r.body: r for r in SyslogParser(protocol="rfc5424")(df).collect()}
    r = out[line]
    assert r.priority == 165 and r.facility == 20
    assert r.severity_number == 10  # syslog notice -> OTel INFO2
    assert r.version == 1 and r.hostname == "web01" and r.appname == "nginx"
    assert r.proc_id == "4242" and r.msg_id == "ID47"
    assert r.structured_data == "-" and r.message == "GET /index"
    assert r.event_ts.year == 2024 and r.event_ts.second == 5
    bad = out["not syslog"]  # on_error=send keeps the row, fields null
    assert bad.priority is None and bad.message is None


def test_syslog_rfc3164(spark):
    from opentelemetry_collector_contrib_spark.operators import SyslogParser

    line = "<34>Oct 11 22:14:15 mymachine su[231]: 'su root' failed"
    df = spark.createDataFrame([(line,)], "body string")
    r = SyslogParser(protocol="rfc3164")(df).collect()[0]
    assert r.priority == 34 and r.facility == 4
    assert r.severity_number == 21  # syslog crit -> OTel FATAL
    assert r.hostname == "mymachine" and r.tag == "su" and r.proc_id == "231"
    assert r.message == "'su root' failed"
    assert r.event_ts.month == 10 and r.event_ts.day == 11


def test_syslog_rfc3164_single_digit_day_and_year(spark):
    # ctime pads days 1-9 with a space ("Aug  5"); the parser must
    # normalize it and graft the CURRENT year (not 1970)
    import datetime as dt

    from opentelemetry_collector_contrib_spark.operators import SyslogParser

    line = "<13>Aug  5 12:00:07 host app[1]: hello"
    df = spark.createDataFrame([(line,)], "body string")
    r = SyslogParser(protocol="rfc3164")(df).collect()[0]
    assert r.event_ts is not None
    assert (r.event_ts.month, r.event_ts.day, r.event_ts.second) == (8, 5, 7)
    assert r.event_ts.year == dt.date.today().year


def test_syslog_rfc5424_structured_data_map(spark):
    """Reference data.go non-transparent body: SD parses into id + map."""
    from opentelemetry_collector_contrib_spark.operators import SyslogParser

    line = (
        '<86>1 2015-08-05T21:58:59 192.168.2.132 SecureAuth0 23108 ID52020 '
        '[SecureAuth@27389 UserHostAddress="192.168.2.132" Realm="SecureAuth0" '
        'UserID="Tester2" PEN="27389"] Found the user'
    )
    df = spark.createDataFrame([(line,), ("<86>1 - - - - - - bare",)], "body string")
    out = {r.proc_id: r for r in SyslogParser(protocol="rfc5424")(df).collect()}
    r = out["23108"]
    assert r.sd_id == "SecureAuth@27389"
    assert dict(r.structured_data_map) == {
        "UserHostAddress": "192.168.2.132",
        "Realm": "SecureAuth0",
        "UserID": "Tester2",
        "PEN": "27389",
    }
    assert r.message == "Found the user"
    bare = out["-"]
    assert bare.sd_id is None and bare.structured_data_map is None


def test_syslog_rfc3164_skip_pri_and_location(spark):
    """Reference data.go RFC3164SkipPriAbsent/Present cases: the <pri>
    prefix may be missing (allow_skip_pri_header), and `location` names
    the zone the year-less wall time was written in."""
    from opentelemetry_collector_contrib_spark.operators import SyslogParser

    no_pri = "Jun 15 10:00:00 1.2.3.4 apache_server: test message"
    with_pri = "<123>Jun 15 10:00:00 1.2.3.4 apache_server: test message"
    df = spark.createDataFrame([(no_pri,), (with_pri,)], "body string")
    out = {r.body: r for r in SyslogParser(
        protocol="rfc3164", allow_skip_pri_header=True
    )(df).collect()}
    a = out[no_pri]
    assert a.priority is None and a.severity_number is None
    assert a.hostname == "1.2.3.4" and a.tag == "apache_server"
    assert a.message == "test message"
    b = out[with_pri]
    assert b.priority == 123 and b.facility == 15
    assert b.severity_number == 17  # syslog err -> OTel ERROR
    # without the flag the pri-less line is a parse failure (fields null)
    strict = SyslogParser(protocol="rfc3164")(df.filter(df.body == no_pri)).collect()[0]
    assert strict.hostname is None
    # location: Detroit wall time (EDT in June, UTC-4) -> UTC instant
    loc = SyslogParser(
        protocol="rfc3164", allow_skip_pri_header=True,
        location="America/Detroit",
    )(df.filter(df.body == no_pri)).collect()[0]
    assert loc.event_ts.hour == 14  # 10:00 EDT == 14:00 UTC


def test_severity_parser_colliding_aliases_no_fanout(spark):
    # two mapping keys that collide after lower() must not fan out the
    # broadcast join (first-wins, like the when-chain it replaced)
    df = spark.createDataFrame([(1, "warn")], "id int, severity_text string")
    out = SeverityParser(mapping={"warn": "warn", "WARN": "error"})(df).collect()
    assert len(out) == 1
    assert out[0]["severity_number"] == 13  # first entry wins


def test_spanmetrics_histogram(spark):
    from opentelemetry_collector_contrib_spark.connectors import SpanMetricsConnector

    df = spark.createDataFrame(
        [("a", 50), ("a", 99), ("a", 600), ("b", 3000), ("b", None)],
        "svc string, dur int",
    )
    sm = SpanMetricsConnector(duration_col="dur", dimensions=["svc"],
                              buckets=[100, 1000])
    rows = {(r.svc, r.le): (r.bucket_count, r.duration_sum)
            for r in sm(df).collect()}
    assert rows[("a", "100")] == (2, 149.0)
    assert rows[("a", "1000")] == (1, 600.0)
    assert rows[("b", "+Inf")] == (1, 3000.0)
    assert ("b", "100") not in rows  # null duration excluded


def test_spanmetrics_exponential_histogram(spark):
    from opentelemetry_collector_contrib_spark.connectors import SpanMetricsConnector

    df = spark.createDataFrame(
        [("a", 1.0), ("a", 3.0), ("a", 4.0), ("a", 5.0), ("a", 0.0)],
        "svc string, dur double",
    )
    sm = SpanMetricsConnector(duration_col="dur", dimensions=["svc"],
                              histogram="exponential", scale=0)
    out = {r.bucket_idx: r.bucket_count for r in sm(df).collect()}
    # scale 0: bucket idx = ceil(log2(v)) - 1 -> 1.0 -> -1; 3,4 -> 1; 5 -> 2
    assert out[-1] == 1 and out[1] == 2 and out[2] == 1
    assert out[None] == 1  # zero bucket
    # scale 1 doubles resolution: 3.0 -> ceil(log2(3)*2)-1 = 3
    sm1 = SpanMetricsConnector(duration_col="dur", dimensions=["svc"],
                               histogram="exponential", scale=1)
    got = {r.bucket_idx for r in sm1(df).collect()}
    assert 3 in got
    import pytest

    with pytest.raises(ValueError):
        SpanMetricsConnector(duration_col="dur", histogram="bogus")


def test_container_parser_autodetect(spark):
    from opentelemetry_collector_contrib_spark.operators import ContainerParser

    rows = [
        ('{"log": "docker line", "stream": "stdout", "time": "2024-01-02T03:04:05Z"}',),
        ("2024-01-02T03:04:06Z stderr F cri full line",),
        ("2024-01-02T03:04:07Z stdout P cri partial",),
        ("not a container line",),
    ]
    df = spark.createDataFrame(rows, "body string")
    got = ContainerParser()(df).collect()
    d = next(r for r in got if r.body.startswith("{"))
    assert d.log == "docker line" and d.stream == "stdout" and d.partial is False
    assert d.event_ts.second == 5
    full = next(r for r in got if r.log == "cri full line")
    part = next(r for r in got if r.log == "cri partial")
    assert full.stream == "stderr" and full.partial is False
    assert part.stream == "stdout" and part.partial is True
    bad = next(r for r in got if r.body.startswith("not"))
    assert bad.log is None and bad.partial is None


def test_container_partial_recombine(spark):
    from opentelemetry_collector_contrib_spark.operators import (
        ContainerParser,
        Recombine,
    )

    rows = [
        ("c1", 0, "2024-01-02T03:04:05Z stdout P hello "),
        ("c1", 1, "2024-01-02T03:04:05Z stdout P wor"),
        ("c1", 2, "2024-01-02T03:04:06Z stdout F ld"),
        ("c1", 3, "2024-01-02T03:04:07Z stdout F next"),
    ]
    df = spark.createDataFrame(rows, "src string, seq int, body string")
    parsed = ContainerParser()(df)
    joined = Recombine(
        source_identifier="src", order_by="seq", combine_field="log",
        combine_with="", is_last_entry="NOT partial",
    )(parsed)
    texts = sorted(r.log for r in joined.collect())
    assert texts == ["hello world", "next"]
