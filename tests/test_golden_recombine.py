"""Golden parity with the reference recombine transformer's own test
table (pkg/stanza/operator/transformer/recombine/transformer_test.go) —
each case's config, input entries, and expected output transcribed
directly. Entries become rows keyed by the stanza default source
identifier (`file.path` attribute ≅ our source column) with arrival
order as the order column.

One deliberate difference: batch end-of-input flushes every open batch
(the Go test only sees batches flushed by matches/caps/timeouts before
shutdown), so cases whose reference expectation omits a still-buffered
trailing batch carry it here, marked ``+ trailing flush``.
"""

from __future__ import annotations

import pytest

from opentelemetry_collector_contrib_spark.operators import Recombine

# (name, Recombine kwargs, input [(source, body)], expected [(source, body)])
CASES = [
    (
        "TwoEntriesLast",
        dict(is_last_entry="text = 'test2'"),
        [("f1", "test1"), ("f1", "test2")],
        [("f1", "test1\ntest2")],
    ),
    (
        "CombineWithEmptyString",
        dict(is_last_entry="text = 'test2'", combine_with=""),
        [("f1", "test1"), ("f1", "test2")],
        [("f1", "test1test2")],
    ),
    (
        "EntriesNonMatchingForFirstEntry",
        dict(is_first_entry="text = 'test1'"),
        [("f1", "test2"), ("f1", "test3"), ("f1", "test4")],
        [("f1", "test2\ntest3\ntest4")],
    ),
    (
        "EntriesMatchingForFirstEntryOneFileOnly",
        dict(is_first_entry="text = 'start'", overwrite_with="newest"),
        [("file1", "start"), ("file1", "more1a"), ("file1", "start"),
         ("file1", "more1b"), ("file1", "start"), ("file2", "more2a"),
         ("file2", "more2b")],
        # reference expectation + trailing flush of the buffered "start"
        [("file1", "start\nmore1a"), ("file1", "start\nmore1b"),
         ("file1", "start"), ("file2", "more2a\nmore2b")],
    ),
    (
        "TestMaxBatchSize",
        dict(is_last_entry="text = 'end'", max_batch_size=2),
        [("file1", "file1_event1"), ("file2", "file2_event1"),
         ("file1", "end"), ("file2", "file2_event2"), ("file2", "end")],
        [("file1", "file1_event1\nend"),
         ("file2", "file2_event1\nfile2_event2"), ("file2", "end")],
    ),
    (
        "TestMaxLogSizeForLastEntry",
        dict(is_last_entry="text = 'end'", max_log_size=5),
        [("file1", "file1"), ("file1", "file1"), ("file1", "file2"),
         ("file1", "end")],
        [("file1", "file1\nfile1"), ("file1", "file2\nend")],
    ),
    (
        "TestMaxLogSizeForFirstEntry",
        dict(is_first_entry="text = 'start'", max_log_size=12),
        [("file1", "start"), ("file1", "content1"), ("file1", "content2"),
         ("file1", "content3"), ("file1", "content4"), ("file1", "content5"),
         ("file1", "start"), ("file1", "start")],
        # reference expectation + trailing flush of the buffered "start"
        [("file1", "start\ncontent1"), ("file1", "content2\ncontent3"),
         ("file1", "content4\ncontent5"), ("file1", "start"),
         ("file1", "start")],
    ),
    (
        "TestBatchSplitWhenTriggerTheBatchSizeLimit",
        dict(is_first_entry="text = 'start'", max_batch_size=5),
        [("file1", "start")] + [("file1", f"content{i}") for i in range(1, 10)],
        [("file1", "start\ncontent1\ncontent2\ncontent3\ncontent4"),
         ("file1", "content5\ncontent6\ncontent7\ncontent8\ncontent9")],
    ),
    (
        "EntriesNonMatchingForFirstEntryWithMaxUnmatchedBatchSize=0",
        dict(is_first_entry="text = 'test1'", max_unmatched_batch_size=0),
        [("f1", "test2"), ("f1", "test3"), ("f1", "test4")],
        [("f1", "test2\ntest3\ntest4")],
    ),
    (
        "EntriesNonMatchingForFirstEntryWithMaxUnmatchedBatchSize=1",
        dict(is_first_entry="text = 'test1'", max_unmatched_batch_size=1),
        [("f1", "test2"), ("f1", "test3"), ("f1", "test4")],
        [("f1", "test2"), ("f1", "test3"), ("f1", "test4")],
    ),
    (
        "TestMaxUnmatchedBatchSizeForFirstEntry",
        dict(is_first_entry="text = 'test1'", max_unmatched_batch_size=2),
        [("f1", t) for t in ["test2", "test3", "test4", "test5", "test6",
                             "test1", "test7", "test8", "test1", "test9",
                             "test10"]],
        [("f1", "test2\ntest3"), ("f1", "test4\ntest5"), ("f1", "test6"),
         ("f1", "test1\ntest7\ntest8"), ("f1", "test1\ntest9\ntest10")],
    ),
    (
        "EntriesNonMatchingForLastEntryWithMaxUnmatchedBatchSize=1",
        dict(is_last_entry="text = 'test1'", max_unmatched_batch_size=1),
        [("f1", "test2"), ("f1", "test3"), ("f1", "test4")],
        [("f1", "test2"), ("f1", "test3"), ("f1", "test4")],
    ),
    (
        "EntriesMatchingForLastEntryMaxUnmatchedBatchSize=2",
        dict(is_last_entry="text = 'test1'", max_unmatched_batch_size=2),
        [("f1", t) for t in ["test2", "test3", "test4", "test5", "test1",
                             "test6", "test7", "test1"]],
        [("f1", "test2\ntest3"), ("f1", "test4\ntest5"), ("f1", "test1"),
         ("f1", "test6\ntest7"), ("f1", "test1")],
    ),
    (
        "EntriesMatchingForLastEntryMaxUnmatchedBatchSize=3",
        dict(is_last_entry="text = 'test1'", max_unmatched_batch_size=3),
        [("f1", t) for t in ["test2", "test3", "test4", "test5", "test1",
                             "test6", "test7", "test1"]],
        [("f1", "test2\ntest3\ntest4"), ("f1", "test5\ntest1"),
         ("f1", "test6\ntest7\ntest1")],
    ),
]


@pytest.mark.parametrize(
    "name,cfg,inp,expected", CASES, ids=[c[0][:52] for c in CASES]
)
def test_recombine_golden(spark, name, cfg, inp, expected):
    rows = [(src, i, body) for i, (src, body) in enumerate(inp)]
    df = spark.createDataFrame(rows, "source string, seq int, text string")
    out = Recombine(source_identifier="source", order_by="seq", **cfg)(df)
    got = [(r["source"], r["text"]) for r in out.orderBy("seq").collect()]
    assert sorted(got) == sorted(expected), f"{name}: {got}"