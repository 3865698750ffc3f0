"""Verbatim port of the key_value parser's reference test table.

Reference: pkg/stanza/operator/parser/keyvalue/parser_test.go:176-660
(TestParser) over parseutils.SplitString + ParseKeyValuePairs
(internal/coreinternal/parseutils/parser.go:16-75), run through
``KeyValueParser(mode="reference")``.
"""

from __future__ import annotations

import pytest

from opentelemetry_collector_contrib_spark.operators.parsers import KeyValueParser

# (name, config overrides, input, expected map or None for parse error)
CASES = [
    ("simple", {}, "name=stanza age=2", {"name": "stanza", "age": "2"}),
    ("user-agent", {},
     'requestClientApplication="Mozilla/5.0 (Windows NT 6.1; WOW64; rv:40.0) Gecko/20100101 Firefox/40.0"',
     {"requestClientApplication":
      "Mozilla/5.0 (Windows NT 6.1; WOW64; rv:40.0) Gecko/20100101 Firefox/40.0"}),
    ("double-quotes-removed", {}, 'name="stanza" age=2',
     {"name": "stanza", "age": "2"}),
    ("single-quotes-removed", {}, "description='stanza deployment number 5' x=y",
     {"description": "stanza deployment number 5", "x": "y"}),
    ("double-quotes-spaces-removed", {}, 'name=" stanza " age=2',
     {"name": "stanza", "age": "2"}),
    ("leading-and-trailing-space", {}, '" name "=" stanza " age=2',
     {"name": "stanza", "age": "2"}),
    ("delimiter", {"delimiter": "|"}, 'name|" stanza " age|2     key|value',
     {"name": "stanza", "age": "2", "key": "value"}),
    ("double-delimiter", {"delimiter": "=="}, 'name==" stanza " age==2     key==value',
     {"name": "stanza", "age": "2", "key": "value"}),
    ("pair-delimiter", {"pair_delimiter": "|"}, "name=stanza|age=2     | key=value",
     {"name": "stanza", "age": "2", "key": "value"}),
    ("pair-delimiter-multiline", {"pair_delimiter": "^\n"},
     "name=stanza^\nage=2^\nkey=value",
     {"name": "stanza", "age": "2", "key": "value"}),
    ("large", {},
     'name=stanza age=1 job="software engineering" location="grand rapids michigan" '
     "src=\"10.3.3.76\" dst=172.217.0.10 protocol=udp sport=57112 dport=443 "
     "translated_src_ip=96.63.176.3 translated_port=57112",
     {"age": "1", "dport": "443", "dst": "172.217.0.10",
      "job": "software engineering", "location": "grand rapids michigan",
      "name": "stanza", "protocol": "udp", "sport": "57112",
      "src": "10.3.3.76", "translated_port": "57112",
      "translated_src_ip": "96.63.176.3"}),
    ("dell-sonic-wall", {},
     'id=LVM_Sonicwall sn=22255555 time="2021-09-22 16:30:31" fw=14.165.177.10 '
     'pri=6 c=1024 gcat=2 m=97 msg="Web site hit" srcMac=6c:0b:84:3f:fa:63 '
     "src=192.168.50.2:52006:X0 srcZone=LAN natSrc=14.165.177.10:58457 "
     "dstMac=08:b2:58:46:30:54 dst=15.159.150.83:443:X1 dstZone=WAN "
     "natDst=15.159.150.83:443 proto=tcp/https sent=1422 rcvd=5993 "
     'rule="6 (LAN->WAN)" app=48 dstname=example.space.dev.com arg=/ code=27 '
     'Category="Information Technology/Computers" note="Policy: a0, Info: 888 " n=3412158',
     {"id": "LVM_Sonicwall", "sn": "22255555", "time": "2021-09-22 16:30:31",
      "fw": "14.165.177.10", "pri": "6", "c": "1024", "gcat": "2", "m": "97",
      "msg": "Web site hit", "srcMac": "6c:0b:84:3f:fa:63",
      "src": "192.168.50.2:52006:X0", "srcZone": "LAN",
      "natSrc": "14.165.177.10:58457", "dstMac": "08:b2:58:46:30:54",
      "dst": "15.159.150.83:443:X1", "dstZone": "WAN",
      "natDst": "15.159.150.83:443", "proto": "tcp/https", "sent": "1422",
      "rcvd": "5993", "rule": "6 (LAN->WAN)", "app": "48",
      "dstname": "example.space.dev.com", "arg": "/", "code": "27",
      "Category": "Information Technology/Computers",
      "note": "Policy: a0, Info: 888", "n": "3412158"}),
    ("missing-delimiter", {}, "test text", None),
    ("value-contains-delimiter", {}, "test=text=abc", {"test": "text=abc"}),
    ("quoted-value-contains-whitespace-delimiter", {},
     'msg="Message successfully sent at 2023-12-04 06:47:31.204222276 +0000 UTC m=+5115.932279346"',
     {"msg": "Message successfully sent at 2023-12-04 06:47:31.204222276 "
             "+0000 UTC m=+5115.932279346"}),
    ("multiple-values-contain-delimiter", {}, 'one=1=i two="2=ii" three=3=iii',
     {"one": "1=i", "two": "2=ii", "three": "3=iii"}),
    ("empty-input", {}, "", None),
    ("custom-pair-delimiter-in-quoted-value", {"pair_delimiter": "_"},
     'a=b_c="d_e"', {"a": "b", "c": "d_e"}),
    ("embedded-double-quotes-in-single-quoted-value", {},
     "a=b c='this is a \"co ol\" value'",
     {"a": "b", "c": 'this is a "co ol" value'}),
    ("embedded-double-quotes-end-single-quoted-value", {},
     "a=b c='this is a \"co ol\"'", {"a": "b", "c": 'this is a "co ol"'}),
    ("leading-and-trailing-pair-delimiter-wo-quotes", {},
     "   k1=v1   k2==v2       k3=v3= ",
     {"k1": "v1", "k2": "=v2", "k3": "v3="}),
    ("complicated-delimiters", {"delimiter": "@*", "pair_delimiter": "_!_"},
     "k1@*v1_!_k2@**v2_!__k3@@*v3__",
     {"k1": "v1", "k2": "*v2", "_k3@": "v3__"}),
    ("unclosed-quotes", {}, "k1='v1' k2='v2", None),
]


@pytest.mark.parametrize("name,cfg,body,want", CASES, ids=[c[0] for c in CASES])
def test_keyvalue_reference_case(spark, name, cfg, body, want):
    df = spark.createDataFrame([(body,)], "body string")
    parser = KeyValueParser(mode="reference", parse_to="parsed", **cfg)
    row = parser(df).collect()[0]
    got = None if row["parsed"] is None else dict(row["parsed"])
    assert got == want, name
    # drop mode removes error rows entirely (stanza on_error contract)
    survivors = KeyValueParser(
        mode="reference", parse_to="parsed", on_error="drop", **cfg
    )(df).count()
    assert survivors == (0 if want is None else 1), name


def test_build_errors():
    # same-delimiter-and-pair-delimiter / unset-delimiter
    # (config.go:49-60 expectBuildErr cases)
    with pytest.raises(ValueError):
        KeyValueParser(mode="reference", delimiter="!", pair_delimiter="!")
    with pytest.raises(ValueError):
        KeyValueParser(mode="reference", delimiter="", pair_delimiter="!")


def test_duplicate_keys_last_wins(spark):
    # Go map overwrite: parsed[key] = value per pair in order
    df = spark.createDataFrame([("a=1 b=2 a=3",)], "body string")
    row = KeyValueParser(mode="reference", parse_to="parsed")(df).collect()[0]
    assert dict(row["parsed"]) == {"a": "3", "b": "2"}


def test_parse_from_and_column_promotion(spark):
    # parse-from / parse-to / from-to cases: field routing is the shared
    # stanza contract; reference mode must honor it too
    df = spark.createDataFrame([("x", "name=otel age=2")], "id string, test string")
    row = KeyValueParser(
        mode="reference", parse_from="test", parse_to=None, keys=["name", "age"]
    )(df).collect()[0]
    assert (row["name"], row["age"]) == ("otel", "2")
