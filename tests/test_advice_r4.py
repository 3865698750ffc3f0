"""Regression tests for the round-4 ADVICE.md findings and VERDICT.md
"what's wrong" items.

1. UriParser: a ';' (or bad %-escape) in a FULL URL's query must keep
   the row — url.URL.Query() swallows the ParseQuery error and Go's
   parseQuery just skips the bad segment (net/url parseQuery semantics
   via internal/coreinternal/parseutils/uri.go urlToMap:100-127). Only
   the bare-'?query' path (ParseURI:25-32, direct url.ParseQuery)
   errors the row — including on malformed %-escapes.
2. CsvParser._unquote: quoted fields with EMBEDDED NEWLINES must be
   unquoted on the dynamic-header path too (Java-regex '.' is not
   DOTALL; the static-header from_csv path already handled it).
3. textstats._gram_scan: a first gram equal to the init sentinel must
   not count as a duplicate.
4. exact_dedup: groupBy+semi-join formulation — same rows as the old
   row_number window, plan shows partial/final HashAggregate and NO
   Window (a window serializes a viral duplicate class into one task).
5. lsh_candidate_pairs: degenerate buckets are capped by default.
6. expo collapse: ANSI-on session, empty count arrays, values
   MATERIALIZED (count() prunes the failing projection).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from opentelemetry_collector_contrib_spark.operators.parsers import (
    CsvParser,
    UriParser,
)


# -- 1. URI error-path split ---------------------------------------------

def test_uri_full_url_semicolon_query_keeps_row(spark):
    df = spark.createDataFrame(
        [(0, "http://h/p?a=1;b=2&c=3")], "id int, body string"
    )
    # row survives (drop mode keeps it) with scheme/host/path intact
    rows = UriParser(on_error="drop")(df).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r.scheme == "http" and r.host == "h" and r.path == "/p"
    # the ';'-containing segment is skipped; the clean one survives
    assert dict(r.query_params) == {"c": ["3"]}


def test_uri_full_url_bad_escape_keeps_row_drops_pair(spark):
    df = spark.createDataFrame(
        [(0, "http://h/p?a=%zz&b=ok")], "id int, body string"
    )
    rows = UriParser(on_error="drop")(df).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r.host == "h"
    assert dict(r.query_params) == {"b": ["ok"]}


def test_uri_full_url_only_bad_segments_params_null(spark):
    df = spark.createDataFrame(
        [(0, "http://h/p?a=1;b=2")], "id int, body string"
    )
    rows = UriParser(on_error="drop")(df).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r.host == "h" and r.path == "/p"
    # url.Values ends up empty -> queryToMap no-op -> no params
    assert r.query_params is None


def test_uri_bare_query_semicolon_is_parse_error(spark):
    df = spark.createDataFrame([(0, "?a=1;b=2")], "id int, body string")
    assert UriParser(on_error="drop")(df).count() == 0


def test_uri_bare_query_bad_escape_is_parse_error(spark):
    # url.ParseQuery returns the QueryUnescape error for the '?'-prefixed
    # path; the row is a parse failure, not a raw-token keep
    df = spark.createDataFrame([(0, "?a=%zz")], "id int, body string")
    assert UriParser(on_error="drop")(df).count() == 0


def test_uri_bare_query_clean_still_parses(spark):
    df = spark.createDataFrame([(0, "?a=%2Fx&a=2")], "id int, body string")
    r = UriParser()(df).collect()[0]
    assert dict(r.query_params) == {"a": ["/x", "2"]}


# -- 2. CSV dynamic-header embedded newline ------------------------------

def test_csv_dynamic_header_quoted_newline_unquoted(spark):
    df = spark.createDataFrame(
        [(0, 'a,"line1\nline2",c', "h1,h2,h3")],
        "id int, body string, cols string",
    )
    p = CsvParser(header_attribute="cols")
    r = p(df).collect()[0]
    got = dict(r["parsed"])
    assert got["h2"] == "line1\nline2"
    assert got["h1"] == "a" and got["h3"] == "c"


def test_kv_quoted_value_newline_unquoted(spark):
    from opentelemetry_collector_contrib_spark.operators.parsers import (
        KeyValueParser,
    )

    df = spark.createDataFrame(
        [(0, 'k1="v1\nv2" k2=plain', {})],
        "id int, body string, attributes map<string,string>",
    )
    r = KeyValueParser()(df).collect()[0]
    got = dict(r.attributes)
    assert got.get("k1") == "v1\nv2"
    assert got.get("k2") == "plain"


# -- 3. gram-scan sentinel -----------------------------------------------

def test_gram_scan_sentinel_first_element_not_dup(spark):
    from opentelemetry_collector_contrib_spark.training.textstats import (
        _gram_scan,
    )

    df = spark.createDataFrame(
        [(0, ["\x00", "a", "a"]), (1, ["\x00"]), (2, ["x", "y"])],
        "id int, grams array<string>",
    )
    out = {
        r.id: r.scan
        for r in df.withColumn("scan", _gram_scan("grams")).collect()
    }
    # the two 'a's are the only duplicates; the sentinel-equal first
    # element contributes none
    assert out[0]["dup"] == 2 and out[0]["best"] == 2
    assert out[1]["dup"] == 0 and out[1]["best"] == 1
    assert out[2]["dup"] == 0


# -- 4. exact_dedup de-skew ----------------------------------------------

def test_exact_dedup_same_rows_as_window(spark):
    from pyspark.sql import Window

    from opentelemetry_collector_contrib_spark.training.dedup import (
        exact_dedup,
    )

    df = spark.createDataFrame(
        [(i, "viral" if i % 3 == 0 else f"doc{i}") for i in range(30)],
        "doc_id int, text string",
    )
    got = sorted(r.doc_id for r in exact_dedup(df).collect())
    w = Window.partitionBy(F.md5("text")).orderBy("doc_id")
    want = sorted(
        r.doc_id
        for r in df.withColumn("rn", F.row_number().over(w))
        .filter("rn = 1")
        .collect()
    )
    assert got == want


def test_exact_dedup_plan_is_hash_aggregate_not_window(spark):
    from opentelemetry_collector_contrib_spark.training.dedup import (
        exact_dedup,
    )

    df = spark.createDataFrame(
        [(i, f"t{i % 4}") for i in range(16)], "doc_id int, text string"
    )
    plan = exact_dedup(df)._jdf.queryExecution().executedPlan().toString()
    assert "HashAggregate" in plan
    assert "Window" not in plan, (
        "row_number window puts every copy of a viral dup class on one task"
    )


# -- 5. LSH default bucket cap --------------------------------------------

def test_lsh_default_cap_bounds_degenerate_bucket(spark):
    from opentelemetry_collector_contrib_spark.training.dedup import (
        lsh_candidate_pairs,
    )

    # every doc shares the identical signature -> one bucket per band
    n = 40
    sigs = spark.createDataFrame(
        [(i, [1, 2, 3, 4, 5, 6, 7, 8]) for i in range(n)],
        "doc_id int, sig array<int>",
    )
    uncapped = lsh_candidate_pairs(
        sigs, bands=4, rows_per_band=2, max_bucket=None
    ).count()
    assert uncapped == n * (n - 1) // 2
    capped = lsh_candidate_pairs(
        sigs, bands=4, rows_per_band=2, max_bucket=10
    ).count()
    assert capped == 0
    # the default cap (10k) is far above any honest near-dup class at
    # test scale — it must not change results here
    default = lsh_candidate_pairs(sigs, bands=4, rows_per_band=2).count()
    assert default == uncapped


# -- 6. expo collapse under ANSI ------------------------------------------

def test_expo_collapse_ansi_on_empty_arrays_materializes(spark):
    from opentelemetry_collector_contrib_spark.processors.expo import (
        collapse,
    )

    df = spark.createDataFrame(
        [
            (0, 2, [1, 2, 3, 4]),
            (1, -3, []),          # empty counts: the r03 driver crash shape
            (2, 1, [5]),
            (3, 0, []),
        ],
        "id int, offset int, counts array<long>",
    )
    prev = spark.conf.get("spark.sql.ansi.enabled")
    spark.conf.set("spark.sql.ansi.enabled", "true")
    try:
        out = collapse(df, "offset", "counts", steps=1)
        rows = {r.id: r for r in out.collect()}  # MATERIALIZE values
    finally:
        spark.conf.set("spark.sql.ansi.enabled", prev)
    assert rows[1]["counts"] == []
    # padding-preserving: input length kept, freed tail zeroed
    assert rows[0]["counts"] == [3, 7, 0, 0]
    assert rows[0]["offset"] == 1
