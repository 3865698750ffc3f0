"""Verbatim port of the csv parser's reference test table.

Reference: pkg/stanza/operator/parser/csv/parser_test.go:107-833
(TestParserCSV) over parseutils.ReadCSVRow / MapCSVHeaders
(internal/coreinternal/parseutils/csv.go): exact field-count
enforcement, Go-csv quote semantics (RFC 4180 doubled-quote escapes,
LazyQuotes literals), empty fields as '', plain-split ignore_quotes
mode, per-row dynamic headers, and config build errors.
"""

from __future__ import annotations

import pytest

from opentelemetry_collector_contrib_spark.operators import CsvParser

TEST_HEADER = "name,sev,msg"

# (name, config, body, expected attr map or None for process error)
CASES = [
    ("basic", {"header": TEST_HEADER}, "stanza,INFO,started agent",
     {"name": "stanza", "sev": "INFO", "msg": "started agent"}),
    ("basic-different-delimiters",
     {"header": TEST_HEADER, "header_delimiter": ",", "delimiter": "|"},
     "stanza|INFO|started agent",
     {"name": "stanza", "sev": "INFO", "msg": "started agent"}),
    ("advanced",
     {"header": "name;address;age;phone;position", "delimiter": ";"},
     "stanza;Evergreen;1;555-5555;agent",
     {"name": "stanza", "address": "Evergreen", "age": "1",
      "phone": "555-5555", "position": "agent"}),
    ("mariadb-audit-log",
     {"header": "timestamp,serverhost,username,host,connectionid,queryid,"
                "operation,database,object,retcode"},
     "20210316 17:08:01,oiq-int-mysql,load,oiq-int-mysql.bluemedora.localnet,"
     "5,0,DISCONNECT,,,0",
     {"timestamp": "20210316 17:08:01", "serverhost": "oiq-int-mysql",
      "username": "load", "host": "oiq-int-mysql.bluemedora.localnet",
      "connectionid": "5", "queryid": "0", "operation": "DISCONNECT",
      "database": "", "object": "", "retcode": "0"}),
    ("empty field", {"header": "name,address,age,phone,position"},
     "stanza,Evergreen,,555-5555,agent",
     {"name": "stanza", "address": "Evergreen", "age": "",
      "phone": "555-5555", "position": "agent"}),
    ("tab delimiter",
     {"header": "name\taddress\tage\tphone\tposition", "delimiter": "\t"},
     "stanza\tEvergreen\t1\t555-5555\tagent",
     {"name": "stanza", "address": "Evergreen", "age": "1",
      "phone": "555-5555", "position": "agent"}),
    ("comma in quotes", {"header": "name,address,age,phone,position"},
     'stanza,"Evergreen,49508",1,555-5555,agent',
     {"name": "stanza", "address": "Evergreen,49508", "age": "1",
      "phone": "555-5555", "position": "agent"}),
    ("quotes in quotes", {"header": "name,address,age,phone,position"},
     '"bob ""the man""",Evergreen,1,555-5555,agent',
     {"name": 'bob "the man"', "address": "Evergreen", "age": "1",
      "phone": "555-5555", "position": "agent"}),
    ("parse-failure-num-fields-mismatch",
     {"header": "name,age,height,number"}, "1,400,555-555-5555", None),
    ("parse-failure-wrong-field-delimiter",
     {"header": "name,age,height,number"}, "stanza:1:400:555-555-5555", None),
    ("parse-with-lazy-quotes",
     {"header": "name,age,height,number", "lazy_quotes": True},
     'stanza "log parser",1,6ft,5',
     {"name": 'stanza "log parser"', "age": "1", "height": "6ft",
      "number": "5"}),
    ("parse-with-ignore-quotes",
     {"header": "name,age,height,number", "ignore_quotes": True},
     "stanza log parser,1,6ft,5",
     {"name": "stanza log parser", "age": "1", "height": "6ft",
      "number": "5"}),
    ("parse-with-ignore-quotes-invalid-csv",
     {"header": "name,age,height,number", "ignore_quotes": True},
     'stanza log parser,"1,"6ft,5"',
     {"name": "stanza log parser", "age": '"1', "height": '"6ft',
      "number": '5"'}),
]


@pytest.mark.parametrize("name,cfg,body,want", CASES, ids=[c[0] for c in CASES])
def test_csv_reference_case(spark, name, cfg, body, want):
    df = spark.createDataFrame([(body,)], "body string")
    parser = CsvParser(**cfg)
    row = parser(df).collect()[0]
    if want is None:
        header = cfg["header"].split(cfg.get("header_delimiter") or cfg.get("delimiter", ","))
        assert all(row[h] is None for h in header), name
        assert CsvParser(on_error="drop", **cfg)(df).count() == 0, name
        return
    got = {k: row[k] for k in want}
    assert got == want, name


def test_dynamic_fields(spark):
    # dynamic-fields / -header-delimiter / -multiple-entries / -tab
    rows = [
        ("stanza dev,1,400,555-555-5555", "name,age,height,number"),
        ("000100,2", "x,y"),
        ("1,2,3,4,5,6", "a,b,c,d,e,f"),
    ]
    df = spark.createDataFrame(rows, "body string, Fields string")
    out = [dict(r.parsed) for r in
           CsvParser(header_attribute="Fields")(df).collect()]
    assert {"name": "stanza dev", "age": "1", "height": "400",
            "number": "555-555-5555"} in out
    assert {"x": "000100", "y": "2"} in out
    assert {"a": "1", "b": "2", "c": "3", "d": "4", "e": "5", "f": "6"} in out


def test_dynamic_fields_header_delimiter(spark):
    df = spark.createDataFrame(
        [("stanza dev,1,400,555-555-5555", "name|age|height|number")],
        "body string, Fields string",
    )
    r = CsvParser(header_attribute="Fields", header_delimiter="|")(df).collect()[0]
    assert dict(r.parsed) == {"name": "stanza dev", "age": "1",
                              "height": "400", "number": "555-555-5555"}


def test_dynamic_fields_label_missing(spark):
    # missing header attribute -> process error (parser.go:39-43)
    df = spark.createDataFrame(
        [("stanza dev,1,400", None)], "body string, Fields string"
    )
    assert CsvParser(
        header_attribute="Fields", on_error="drop"
    )(df).count() == 0


def test_build_errors():
    # missing-header-field / missing-header-delimiter-in-header /
    # invalid-delimiter / invalid-header-delimiter / both-quote-modes
    # (config.go:53-82)
    with pytest.raises(ValueError):
        CsvParser()  # no header at all
    with pytest.raises(ValueError):
        CsvParser(header="name:age:height", delimiter=",")
    with pytest.raises(ValueError):
        CsvParser(header="name,,age", delimiter=",,")
    with pytest.raises(ValueError):
        CsvParser(header="name,,age", header_delimiter=",,")
    with pytest.raises(ValueError):
        CsvParser(header="a,b", lazy_quotes=True, ignore_quotes=True)
    with pytest.raises(ValueError):
        CsvParser(header="a,b", header_attribute="Fields")


def test_multiline_quoted_field(spark):
    # TestParserCSVMultiline quoted-newline shape: a newline inside a
    # quoted field stays in the field
    df = spark.createDataFrame([('"aa\naa",bbbb,cccc',)], "body string")
    r = CsvParser(header="A,B,C")(df).collect()[0]
    assert (r.A, r.B, r.C) == ("aa\naa", "bbbb", "cccc")
