"""BPE merge learning / encoding (Sennrich et al. 2016) — the
iterative tokenizer-induction op. The wrapped-string merge pass must
reproduce the classic scan semantics (greedy left-to-right,
non-overlapping, merged output never re-merged within the pass)."""

from __future__ import annotations

from opentelemetry_collector_contrib_spark.training.bpe import (
    bpe_apply,
    bpe_learn,
)


def _toy(spark, text):
    return spark.createDataFrame([(text,)], "text string")


def test_bpe_textbook_example(spark):
    # the paper's canonical low/lower/lowest family: 'lo' then 'low'
    # dominate after the first rounds
    m = bpe_learn(_toy(spark, "low low lower lowest"), n_merges=3).collect()
    got = [(r.merge_rank, r.left_sym, r.right_sym, r.pair_count) for r in m]
    assert got == [(1, "l", "o", 4), (2, "lo", "w", 4), (3, "low", "e", 2)]


def test_bpe_greedy_nonoverlapping_and_early_stop(spark):
    # 'aaaa': round 1 counts 3 adjacent (a,a) positions; the merge pass
    # is greedy non-overlapping -> [aa, aa]; round 2 merges (aa, aa);
    # round 3 has no pairs left -> early stop with 2 rows
    m = bpe_learn(_toy(spark, "aaaa"), n_merges=5).collect()
    got = [(r.merge_rank, r.left_sym, r.right_sym, r.pair_count) for r in m]
    assert got == [(1, "a", "a", 3), (2, "aa", "aa", 1)]


def test_bpe_weighted_by_word_frequency(spark):
    # 'ab' occurs 3 times as a word, 'cd' once: (a,b) outranks (c,d)
    m = bpe_learn(_toy(spark, "ab ab ab cd"), n_merges=2).collect()
    assert (m[0].left_sym, m[0].right_sym, m[0].pair_count) == ("a", "b", 3)
    assert (m[1].left_sym, m[1].right_sym, m[1].pair_count) == ("c", "d", 1)


def test_bpe_deterministic_across_partitioning(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    a = [tuple(r) for r in bpe_learn(docs, n_merges=4).collect()]
    b = [tuple(r) for r in bpe_learn(docs.repartition(13), n_merges=4).collect()]
    assert a == b and len(a) == 4


def test_bpe_apply_segments_with_learned_merges(spark):
    toy = _toy(spark, "low low lower lowest")
    merges = [
        (r.left_sym, r.right_sym)
        for r in bpe_learn(toy, n_merges=3).collect()
    ]
    out = bpe_apply(toy, merges).collect()[0].bpe_tokens
    assert out == ["low", "low", "lowe", "r", "lowe", "s", "t"]


def test_bpe_apply_no_merges_is_character_split(spark):
    out = bpe_apply(_toy(spark, "ab c"), []).collect()[0].bpe_tokens
    assert out == ["a", "b", "c"]


def test_bpe_oracle_survives_merge_exhaustion():
    """r05 review finding: on a corpus whose words are all single
    characters, every merge round finds NO adjacent pairs — the oracle's
    per-round join must leave the vocab untouched (bpe_learn's
    early-stop), not annihilate it to zero rows via an empty cross
    join. Runs the generated DuckDB chain directly."""
    import duckdb

    from __spark_entry__ import _bpe_oracle_sql

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM (VALUES "
        "(1, 'a b c'), (2, 'a a b')) t(doc_id, text)"
    )
    lex = con.execute(_bpe_oracle_sql(8, tokenize=True)).fetchall()
    # 3 distinct words survive with their frequencies, 1 subword each
    assert sorted(lex) == [("a", 3, 1), ("b", 2, 1), ("c", 1, 1)]
    merges = con.execute(_bpe_oracle_sql(8, tokenize=False)).fetchall()
    assert merges == []  # no pairs -> no merge rows, not a crash
