"""C4-style line + page cleanup (Raffel et al. 2020 §2.2).

Rule-by-rule unit coverage over hand-crafted pages, a zero-shuffle
plan guard, and sf0.001 oracle parity for the registered query
(`c4_line_filter`); the full ANSI-on oracle sweep (tools/ansi_sweep.py)
re-checks the same parity at sf0.01 under the driver's session confs.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from opentelemetry_collector_contrib_spark.training import c4_line_filter

GOOD = "alpha beta gamma delta epsilon."  # 5 words + terminal '.'


def _run(spark, pages, **kw):
    df = spark.createDataFrame(pages, "doc_id long, text string")
    return {
        r["doc_id"]: r.asDict()
        for r in c4_line_filter(df, **kw).collect()
    }


def test_line_rules(spark):
    out = _run(
        spark,
        [
            # doc 1: all rules pass on 3 lines, drops the bad ones
            (
                1,
                "\n".join(
                    [
                        GOOD,
                        "no terminal punctuation here at all",  # dropped: no punct
                        "short line.",  # dropped: < 5 words
                        "uses some JavaScript on this line.",  # dropped: js
                        "ends with a question mark maybe?",
                        'quoted line with five whole words"',
                    ]
                ),
            ),
            # doc 2: only 2 surviving lines -> page dropped (min_lines=3)
            (2, "\n".join([GOOD, GOOD, "too short."])),
        ],
    )
    assert set(out) == {1}
    assert out[1]["n_lines"] == 6
    assert out[1]["n_kept"] == 3
    assert out[1]["clean_text"].split("\n") == [
        GOOD,
        "ends with a question mark maybe?",
        'quoted line with five whole words"',
    ]


def test_page_rules(spark):
    lorem = "\n".join([GOOD, GOOD, "some Lorem Ipsum filler text here."])
    brace = "\n".join([GOOD, GOOD, "a line with code {literal} inside."])
    clean = "\n".join([GOOD, GOOD, GOOD])
    out = _run(spark, [(1, lorem), (2, brace), (3, clean)])
    # lorem-ipsum and '{' pages die wholesale even with enough kept lines
    assert set(out) == {3}
    assert out[3]["n_kept"] == 3


def test_exclamation_terminal_and_thresholds(spark):
    out = _run(
        spark,
        [(1, "\n".join(["one two three!", "four five six!"]))],
        min_words=3,
        min_lines=2,
    )
    assert out[1]["n_kept"] == 2


def test_empty_and_degenerate_docs(spark):
    # empty text and a punctuation-free doc both vanish without error
    out = _run(spark, [(1, ""), (2, "words but never any punctuation")])
    assert out == {}


def test_zero_shuffle_plan(spark):
    df = spark.createDataFrame([(1, GOOD)], "doc_id long, text string")
    plan = c4_line_filter(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # pure projection + filter, no shuffle
    assert "BatchEvalPython" not in plan  # no Python in the hot path


def test_query_matches_oracle_sf0001(spark, duck, sf_dir):
    import __spark_entry__ as e
    from tests.conftest import assert_frames_equal

    spk = e.queries()["c4_line_filter"](spark, sf_dir)
    orc = duck.sql(e.oracle_sql()["c4_line_filter"])
    assert_frames_equal(spk, orc)
