"""Regression tests for the round-2 ADVICE findings.

Each test pins a behavior the reference exhibits but the round-2 code
missed (file:line citations at the fix sites)."""

from __future__ import annotations

import os

from opentelemetry_collector_contrib_spark.operators import CsvParser, Recombine
from opentelemetry_collector_contrib_spark.operators.parsers import (
    SeverityParser,
    expand_stanza_severity_mapping,
)
from opentelemetry_collector_contrib_spark.sources.filelog import FileLogSource


def test_csv_header_attribute_short_row_yields_null_not_crash(spark):
    """parser/csv/parser.go:95-101 fails per-entry; a row with fewer
    fields than its header must not throw SparkRuntimeException."""
    df = spark.createDataFrame(
        [("1,2,3", "a,b,c"), ("1", "a,b,c"), ("x,y", "k1,k2")],
        "body string, hdr string",
    )
    rows = {r.body: r.parsed for r in CsvParser(header_attribute="hdr")(df).collect()}
    assert rows["1,2,3"] == {"a": "1", "b": "2", "c": "3"}
    assert rows["1"] is None  # short row: null map, row kept (on_error=send)
    assert rows["x,y"] == {"k1": "x", "k2": "y"}
    # drop mode removes only the malformed row
    out = CsvParser(header_attribute="hdr", on_error="drop")(df)
    assert out.count() == 2


def test_severity_stanza_mapping_merges_into_defaults(spark):
    """helper/severity_builder.go:201-214: user mappings MERGE into the
    builtin preset (user entries win); 'warn'/'emerg' keep resolving."""
    df = spark.createDataFrame(
        [(1, "warn"), (2, "emerg"), (3, "oops"), (4, "err")],
        "id int, severity_text string",
    )
    sp = SeverityParser(stanza_mapping={"fatal": "oops", "info": "err"})
    out = {r.id: r for r in sp(df).collect()}
    assert out[1].severity_number == 13   # builtin 'warn' still resolves
    assert out[2].severity_number == 23   # builtin 'emerg' still resolves
    assert out[3].severity_number == 21   # user entry
    assert out[4].severity_number == 9    # user override beats builtin err->17


def test_stanza_range_min_gt_max_swaps_bounds():
    """severity_builder.go expandRange swaps reversed bounds instead of
    silently producing an empty range."""
    m = expand_stanza_severity_mapping({"error": {"min": 5, "max": 3}})
    assert m == {"3": "error", "4": "error", "5": "error"}


def test_multiline_same_basename_different_dirs_do_not_collide(spark, tmp_path):
    """Window key must be the full path: same-named files in different
    directories must each recombine within themselves."""
    for d in ("a", "b"):
        os.makedirs(tmp_path / d, exist_ok=True)
    (tmp_path / "a" / "app.log").write_text("START x1\n cont a\nSTART x2\n")
    (tmp_path / "b" / "app.log").write_text("START y1\n cont b\n")
    src = FileLogSource(
        paths=str(tmp_path / "*" / "app.log"),
        line_start_pattern=r"^START",
        include_file_path=False,
    )
    rows = src(spark).collect()
    bodies = sorted(r.body for r in rows)
    assert bodies == ["START x1\n cont a", "START x2", "START y1\n cont b"]
    assert all(r.log_file_name == "app.log" for r in rows)
    # include_file_path=True keeps the full path as a column
    src2 = FileLogSource(
        paths=str(tmp_path / "*" / "app.log"),
        line_start_pattern=r"^START",
        include_file_path=True,
    )
    paths = {r.log_file_path for r in src2(spark).collect()}
    assert len(paths) == 2


def test_recombine_both_caps_apply_min_on_unmatched(spark):
    """transformer.go:151-158 + :186-188 check both caps on every
    append: with max_batch_size=5 and max_unmatched_batch_size=3, the
    pre-match rows flush in 3s (not 3,2,3,2), matched groups in 5s."""
    rows = [("s", i, f"l{i}") for i in range(6)]          # 6 unmatched
    rows += [("s", 10 + i, "start" if i == 0 else f"m{i}") for i in range(7)]
    df = spark.createDataFrame(rows, "source string, seq int, text string")
    out = Recombine(
        source_identifier="source",
        order_by="seq",
        combine_field="text",
        is_first_entry="text = 'start'",
        max_batch_size=5,
        max_unmatched_batch_size=3,
    )(df)
    bodies = sorted(r.text for r in out.collect())
    # unmatched: [l0,l1,l2], [l3,l4,l5]; matched: 5 rows then 2 rows
    assert "l0\nl1\nl2" in bodies
    assert "l3\nl4\nl5" in bodies
    assert "start\nm1\nm2\nm3\nm4" in bodies
    assert "m5\nm6" in bodies
    assert len(bodies) == 4


# --- round-3 self-review fixes (code-review findings) -------------------------


def test_trace_parser_odd_length_hex_errors(spark):
    from opentelemetry_collector_contrib_spark.operators import TraceParser

    df = spark.createDataFrame([("abc",)], "trace_id string")
    assert TraceParser()(df).collect()[0].trace_id is None
    assert TraceParser(on_error="drop")(df).count() == 0


def test_uri_parser_invalid_authority_errors(spark):
    from opentelemetry_collector_contrib_spark.operators.parsers import UriParser

    bad = ["http://host:8080x/path", "http://[::1]:8080/p", "http://h:80a0/"]
    df = spark.createDataFrame([(b,) for b in bad], "body string")
    assert UriParser(on_error="drop")(df).count() == 0
    # schemeless network-path reference still resolves its host
    df2 = spark.createDataFrame([("//foo/bar",)], "body string")
    r = UriParser()(df2).collect()[0]
    assert r.host == "foo" and r.path == "/bar"


def test_csv_strict_mode_rejects_bare_quotes(spark):
    from opentelemetry_collector_contrib_spark.operators import CsvParser

    df = spark.createDataFrame(
        [('stanza "log parser",1,6ft,5',)], "body string"
    )
    hdr = "name,age,height,number"
    # strict: ErrBareQuote -> whole-row error (csv.go LazyQuotes=false)
    strict = CsvParser(header=hdr)(df).collect()[0]
    assert strict.name is None
    assert CsvParser(header=hdr, on_error="drop")(df).count() == 0
    # lazy: parses with the quote kept
    lazy = CsvParser(header=hdr, lazy_quotes=True)(df).collect()[0]
    assert lazy.name == 'stanza "log parser"'
    # unterminated quote is an error in strict mode too
    df2 = spark.createDataFrame([('a,"unterminated',)], "body string")
    assert CsvParser(header="x,y", on_error="drop")(df2).count() == 0


def test_kv_reference_trims_all_whitespace(spark):
    from opentelemetry_collector_contrib_spark.operators import KeyValueParser

    df = spark.createDataFrame([("a=1\t b=2",)], "body string")
    r = KeyValueParser(mode="reference", parse_to="parsed")(df).collect()[0]
    assert dict(r.parsed) == {"a": "1", "b": "2"}


def test_ottl_signed_int_literal():
    from opentelemetry_collector_contrib_spark.functions.ast import Lit, Parser

    st = Parser('set(attributes["x"], +5)').parse_statement()
    assert isinstance(st.editor.args[1], Lit)
    assert st.editor.args[1].value == 5


def test_gif_frame_count_walks_blocks():
    import struct

    from opentelemetry_collector_contrib_spark.training.codecs import (
        decode_gif_header,
    )

    def frame(w=2, h=2):
        # descriptor + no LCT + lzw code size + one 0x2C-laden subblock
        return (b"\x2c" + struct.pack("<HHHH", 0, 0, w, h) + b"\x00"
                + b"\x02" + b"\x02\x2c\x2c" + b"\x00")

    header = b"GIF89a" + struct.pack("<HH", 2, 2) + bytes([0x80, 0, 0])
    gct = b"\x2c" * 6  # 2-entry global color table FULL of 0x2C bytes
    one = header + gct + frame() + b"\x3b"
    two = header + gct + frame() + frame() + b"\x3b"
    assert decode_gif_header(one)["n_frames"] == 1
    assert decode_gif_header(two)["n_frames"] == 2


def test_jpeg_fill_bytes_between_segments():
    import struct

    from opentelemetry_collector_contrib_spark.training.codecs import (
        decode_jpeg_header,
    )

    sof = struct.pack(">BHHB", 8, 3, 4, 3) + b"\x01\x11\x00" * 3
    jpeg = (b"\xff\xd8" + b"\xff\xff\xff"  # fill bytes
            + b"\xff\xc0" + struct.pack(">H", len(sof) + 2) + sof + b"\xff\xd9")
    d = decode_jpeg_header(jpeg)
    assert (d["width"], d["height"]) == (4, 3)
