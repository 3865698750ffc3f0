"""Training-data operators: dedup, similarity, text stats, multimodal.

Semantics-focused unit tests on tiny in-memory frames (fast, exact
expectations) plus plumbing checks on the driver documents/embeddings
tables. The full DuckDB-oracle cross-check runs via
tools/check_contract.py and the driver's CORRECTNESS gate.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from opentelemetry_collector_contrib_spark.training import (
    binary_table,
    brute_force_topk,
    cosine_pairs,
    exact_dedup,
    extract_features,
    fingerprint,
    hyperplane_buckets,
    lang_id,
    lsh_candidate_pairs,
    make_planes,
    minhash_signatures,
    ngram_jaccard_pairs,
    quality_score,
    simhash,
    token_stats,
)


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (0, "the quick brown fox jumps over the lazy dog"),
        (1, "the quick brown fox jumps over the lazy dog"),   # exact dup of 0
        (2, "the quick brown fox jumps over the sleepy dog"),  # near dup
        (3, "completely different content about spark engines"),
        (4, "x"),  # fewer tokens than shingle size
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_exact_dedup_keeps_lowest_id(docs):
    kept = sorted(r.doc_id for r in exact_dedup(docs).collect())
    assert kept == [0, 2, 3, 4]


def test_minhash_identical_docs_identical_sigs(docs):
    sigs = {r.doc_id: r.sig for r in minhash_signatures(docs, n_hashes=8).collect()}
    assert sigs[0] == sigs[1]
    assert sigs[0] != sigs[3]
    # near-dup (5/9 shingle Jaccard) agrees on ~E[8*5/9]=4.4 minhashes;
    # unrelated docs agree on ~0
    overlap_near = sum(a == b for a, b in zip(sigs[0], sigs[2]))
    overlap_far = sum(a == b for a, b in zip(sigs[0], sigs[3]))
    assert overlap_near >= 2
    assert overlap_near > overlap_far
    # sub-shingle-size doc -> all-null signature, not an error
    assert all(v is None for v in sigs[4])


def test_lsh_finds_exact_and_near_dups(docs):
    sigs = minhash_signatures(docs, n_hashes=8)
    pairs = {(r.a_id, r.b_id) for r in
             lsh_candidate_pairs(sigs, bands=4, rows_per_band=2).collect()}
    assert (0, 1) in pairs
    assert not any(3 in p for p in pairs)


def test_lsh_max_bucket_drops_degenerate(docs):
    sigs = minhash_signatures(docs, n_hashes=8)
    none = lsh_candidate_pairs(sigs, bands=4, rows_per_band=2, max_bucket=1)
    assert none.count() == 0


def test_simhash_near_dups_close(docs):
    sh = {r.doc_id: r.simhash for r in simhash(docs).collect()}
    assert sh[0] == sh[1]
    ham = bin(sh[0] ^ sh[2]).count("1")
    ham_far = bin(sh[0] ^ sh[3]).count("1")
    assert ham < ham_far


def test_jaccard_exact(docs):
    got = {(r.a_id, r.b_id): r.jaccard for r in
           ngram_jaccard_pairs(docs, threshold=0.1).collect()}
    assert got[(0, 1)] == 1.0
    # 7 shingles each, 5 shared (the two containing 'lazy' differ) -> 5/9
    assert got[(0, 2)] == 0.5556


def test_fingerprint_stable_under_identity(docs):
    fps = {r.doc_id: r.fp for r in fingerprint(docs).collect()}
    assert fps[0] == fps[1]
    assert fps[0] != fps[3]


def test_token_stats(docs):
    r = {x.doc_id: x for x in token_stats(docs).collect()}
    assert r[0].n_tokens == 9
    assert r[0].n_distinct == 8  # 'the' twice
    assert r[4].n_tokens == 1


def test_quality_and_lang(docs):
    q = {r.doc_id: r.quality_q4 for r in quality_score(docs).collect()}
    assert 0 <= q[0] <= 10000
    langs = {r.doc_id: r.pred_lang for r in lang_id(docs).collect()}
    assert langs[0] == "en"       # 'the' x2 of 9 tokens
    assert langs[3] == "unknown"  # no stopwords


@pytest.fixture(scope="module")
def vecs(spark):
    rows = [
        (0, [1.0, 0.0, 0.0, 0.0]),
        (1, [1.0, 0.01, 0.0, 0.0]),   # near dup of 0
        (2, [0.0, 1.0, 0.0, 0.0]),    # orthogonal
        (3, [-1.0, 0.0, 0.0, 0.0]),   # opposite
    ]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_cosine_pairs(vecs):
    pairs = {(r.a_id, r.b_id): r.cos for r in cosine_pairs(vecs, threshold=0.9).collect()}
    assert list(pairs) == [(0, 1)]
    assert pairs[(0, 1)] == pytest.approx(1.0, abs=1e-3)


def test_topk_excludes_self_and_ranks(vecs):
    out = brute_force_topk(vecs, vecs.filter("vec_id = 0"), k=3).collect()
    assert [r.neighbor_id for r in sorted(out, key=lambda r: r.rank)] == [1, 2, 3]
    assert all(r.query_id == 0 and r.neighbor_id != 0 for r in out)


def test_hyperplane_buckets_group_near_dups(vecs):
    b = {r.vec_id: r.bucket for r in
         hyperplane_buckets(vecs, n_planes=8, dim=4).collect()}
    assert b[0] == b[1]          # near-identical vectors share the bucket
    assert b[0] != b[3]          # opposite vector flips every sign bit
    assert len(b[0]) == 8 and set(b[0]) <= {"0", "1"}


def test_make_planes_deterministic():
    assert make_planes(2, 4) == make_planes(2, 4)
    assert all(-1.0 <= v <= 1.0 for row in make_planes(3, 16) for v in row)


def test_lsh_topk_matches_bruteforce_within_bucket(vecs):
    from opentelemetry_collector_contrib_spark.training import lsh_topk

    out = lsh_topk(vecs, vecs.filter("vec_id = 0"), k=3, n_planes=8, dim=4).collect()
    # vec 1 shares vec 0's bucket (near-identical) and must be rank 1
    # with the same exact cosine brute force computes
    assert out, "bucket join found no candidates"
    top = min(out, key=lambda r: r.rank)
    assert (top.query_id, top.neighbor_id, top.rank) == (0, 1, 1)
    brute = {
        r.neighbor_id: r.cos
        for r in brute_force_topk(vecs, vecs.filter("vec_id = 0"), k=3).collect()
    }
    for r in out:  # every LSH hit scores identically to the exact path
        assert r.cos == brute[r.neighbor_id]


def test_cosine_pairs_bucketed_subset_of_exact(vecs):
    from opentelemetry_collector_contrib_spark.training import cosine_pairs_bucketed

    exact = {(r.a_id, r.b_id, r.cos) for r in cosine_pairs(vecs, threshold=0.9).collect()}
    bucketed = {
        (r.a_id, r.b_id, r.cos)
        for r in cosine_pairs_bucketed(vecs, threshold=0.9, n_planes=8, dim=4).collect()
    }
    assert bucketed <= exact          # never invents pairs
    assert (0, 1) in {(a, b) for a, b, _ in bucketed}  # near-dups collide


def test_cosine_pairs_bucketed_single_scan_and_cap(vecs):
    """Plan guard: the bucket-collect rewrite computes the bucket
    subtree ONCE (the aliased self-join version scanned the embedding
    source twice — aliased sides never hit ReuseExchange), and
    max_bucket drops degenerate buckets."""
    import contextlib
    import io

    from opentelemetry_collector_contrib_spark.training import cosine_pairs_bucketed

    out = cosine_pairs_bucketed(vecs, threshold=0.2, n_planes=8, dim=4)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        out.explain("formatted")
    plan = buf.getvalue()
    import re

    # formatted explain lists each node once in the detail section as
    # "(N) <node>"; count source-scan nodes there
    scans = re.findall(r"^\(\d+\) (?:Scan|LocalTableScan)", plan, re.M)
    assert len(scans) == 1, plan
    assert "Join" not in plan, plan
    # max_bucket=1 kills every bucket with a pair in it -> no output
    assert (
        cosine_pairs_bucketed(vecs, threshold=0.2, n_planes=8, dim=4, max_bucket=1)
        .count()
        == 0
    )


def test_ivf_centroids_deterministic(vecs):
    from opentelemetry_collector_contrib_spark.training import ivf_centroids

    c1 = ivf_centroids(vecs, n_list=2)
    c2 = ivf_centroids(vecs, n_list=2)
    assert c1 == c2
    assert [cid for cid, _ in c1] == [1, 2]
    assert all(len(v) == 4 for _, v in c1)


def test_ivf_assign_one_list_per_vector(vecs):
    from opentelemetry_collector_contrib_spark.training import (
        ivf_assign,
        ivf_centroids,
    )

    cents = ivf_centroids(vecs, n_list=2)
    out = {r.vec_id: r.list_id for r in ivf_assign(vecs, cents).collect()}
    assert len(out) == 4                       # exactly one list each
    assert set(out.values()) <= {1, 2}
    # a vector that IS a centroid lands in its own list (cos = 1)
    cent_vecs = {tuple(v): cid for cid, v in cents}
    for r in vecs.collect():
        key = tuple(float(x) for x in r.embedding)
        if key in cent_vecs:
            assert out[r.vec_id] == cent_vecs[key]


def test_ivf_topk_full_probe_matches_bruteforce(vecs):
    """Probing every list makes IVF exhaustive — it must reproduce the
    brute-force ranking and scores exactly (same fold-order cosine)."""
    from opentelemetry_collector_contrib_spark.training import (
        ivf_centroids,
        ivf_topk,
    )

    cents = ivf_centroids(vecs, n_list=2)
    q = vecs.filter("vec_id = 0")
    full = ivf_topk(vecs, q, cents, k=3, n_probe=2).collect()
    brute = brute_force_topk(vecs, q, k=3).collect()
    key = lambda rows: sorted(
        (r.query_id, r.neighbor_id, r.rank, r.cos) for r in rows
    )
    assert key(full) == key(brute)


def test_ivf_topk_narrow_probe_subset(vecs):
    from opentelemetry_collector_contrib_spark.training import (
        ivf_centroids,
        ivf_topk,
    )

    cents = ivf_centroids(vecs, n_list=2)
    q = vecs.filter("vec_id = 0")
    narrow = ivf_topk(vecs, q, cents, k=3, n_probe=1).collect()
    brute = {
        r.neighbor_id: r.cos for r in brute_force_topk(vecs, q, k=3).collect()
    }
    assert narrow, "probed list produced no candidates"
    for r in narrow:  # scores identical to the exact path, never invented
        assert r.cos == brute[r.neighbor_id]


def test_ivf_topk_plan_is_broadcast(vecs):
    """Plan guard: candidate generation joins the corpus against a
    BROADCAST of the exploded query probes — no shuffle of the corpus
    side (the 100 TB side)."""
    import contextlib
    import io

    from opentelemetry_collector_contrib_spark.training import (
        ivf_centroids,
        ivf_topk,
    )

    cents = ivf_centroids(vecs, n_list=2)
    out = ivf_topk(vecs, vecs.filter("vec_id = 0"), cents, k=3, n_probe=1)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        out.explain("formatted")
    plan = buf.getvalue()
    assert "BroadcastHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan, plan


def test_similarity_zero_vector_ansi_on(spark):
    """A zero-norm embedding (padded/missing) under an ANSI session:
    cosine ops yield a NULL score (try_divide) that ranks last /
    drops out of thresholded pair sets — a plain `/` throws
    DIVIDE_BY_ZERO and kills the job. Zero-norm CENTROIDS fail loudly
    at index-build time instead of throwing per-row."""
    from contextlib import contextmanager

    from opentelemetry_collector_contrib_spark.training import (
        brute_force_topk,
        cosine_pairs,
        ivf_assign,
    )

    @contextmanager
    def _ansi():
        old = spark.conf.get("spark.sql.ansi.enabled")
        spark.conf.set("spark.sql.ansi.enabled", "true")
        try:
            yield
        finally:
            spark.conf.set("spark.sql.ansi.enabled", old)

    rows = [
        (0, [1.0, 0.0, 0.0, 0.0]),
        (1, [1.0, 0.01, 0.0, 0.0]),
        (2, [0.0, 0.0, 0.0, 0.0]),  # zero norm
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    with _ansi():
        pairs = cosine_pairs(df, threshold=0.2).collect()
        assert {(r.a_id, r.b_id) for r in pairs} == {(0, 1)}  # 2 drops out
        top = {
            r.neighbor_id: (r.rank, r.cos)
            for r in brute_force_topk(df, df.filter("vec_id = 0"), k=3).collect()
        }
        assert top[1][1] == pytest.approx(1.0, abs=1e-3)
        assert top[2][1] is None and top[2][0] == 2  # null cos ranks last
    with pytest.raises(ValueError, match="zero-norm centroid"):
        ivf_assign(df, [(1, [0.0, 0.0, 0.0, 0.0]), (2, [1.0, 0.0, 0.0, 0.0])])


def test_textstats_empty_docs_ansi_on(spark):
    """Zero-token documents under an ANSI session (the driver's mode,
    where long/long division by zero THROWS — round 3's expo crash
    class): token_stats yields null ratios, quality scores 0, lang is
    'unknown'. Values must be MATERIALIZED — count() prunes the
    failing projection and proves nothing."""
    from contextlib import contextmanager

    from opentelemetry_collector_contrib_spark.training import (
        lang_id,
        quality_score,
        token_stats,
    )

    @contextmanager
    def _ansi():
        old = spark.conf.get("spark.sql.ansi.enabled")
        spark.conf.set("spark.sql.ansi.enabled", "true")
        try:
            yield
        finally:
            spark.conf.set("spark.sql.ansi.enabled", old)

    df = spark.createDataFrame(
        [(0, "the quick fox the"), (1, ""), (2, "   ")],
        "doc_id long, text string",
    )
    with _ansi():
        ts = {r.doc_id: r for r in token_stats(df).collect()}
        q = {r.doc_id: r.quality_q4 for r in quality_score(df).collect()}
        lg = {r.doc_id: r.pred_lang for r in lang_id(df).collect()}
    for empty in (1, 2):
        assert ts[empty].n_tokens == 0
        assert ts[empty].distinct_ratio is None
        assert ts[empty].avg_token_len is None
        assert q[empty] == 0
        assert lg[empty] == "unknown"
    assert ts[0].n_tokens == 4 and ts[0].distinct_ratio == 0.75
    assert q[0] > 0 and lg[0] == "en"


def test_tfidf_topk_hand_computed(docs):
    """TF-IDF on the 5-doc fixture: a term in every doc (ln(5/5)=0)
    scores 0; doc 4's singleton token 'x' scores 1*ln(5/1); ranks break
    ties lexicographically."""
    import math

    from opentelemetry_collector_contrib_spark.training import tfidf_topk

    out = tfidf_topk(docs, k=3).collect()
    by_doc: dict[int, list] = {}
    for r in sorted(out, key=lambda r: (r.doc_id, r.rank)):
        by_doc.setdefault(r.doc_id, []).append(r)
    assert set(by_doc) == {0, 1, 2, 3, 4}
    assert all(len(v) <= 3 for v in by_doc.values())
    x = by_doc[4][0]
    assert (x.term, x.tf, x.df, x.rank) == ("x", 1, 1, 1)
    assert x.tfidf == pytest.approx(round(math.log(5.0), 4), abs=1e-9)
    # 'dog' appears once in docs 0,1,2 -> tfidf = ln(5/3) wherever ranked
    for rows in (by_doc[0], by_doc[2]):
        dog = [r for r in rows if r.term == "dog"]
        if dog:
            assert dog[0].df == 3
            assert dog[0].tfidf == pytest.approx(round(math.log(5 / 3), 4), abs=1e-9)
    # identical docs 0 and 1 get identical (term, rank, tfidf) lists
    assert [(r.term, r.rank, r.tfidf) for r in by_doc[0]] == [
        (r.term, r.rank, r.tfidf) for r in by_doc[1]
    ]
    # 'the' has tf=2 in docs 0/1/2 but df=3... still positive; a term in
    # EVERY doc would score exactly 0 — check none scores negative
    assert all(r.tfidf >= 0 for r in out)


def test_tfidf_topk_plan_single_pass_and_broadcasts(docs):
    """Plan guard: the corpus is tokenized/shuffled once — document
    frequencies re-aggregate the persisted (doc, term) frame (both
    branches read the same InMemoryRelation; exactly one source scan in
    the plan) and return via a broadcast join, never a shuffle of the
    corpus on the raw term key."""
    import contextlib
    import io
    import re

    from opentelemetry_collector_contrib_spark.training import tfidf_topk

    out = tfidf_topk(docs, k=3)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        out.explain("formatted")
    plan = buf.getvalue()
    scans = re.findall(r"^\(\d+\) (?:Scan|LocalTableScan)", plan, re.M)
    assert len(scans) == 1, plan
    assert "InMemoryTableScan" in plan, plan
    assert "BroadcastHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan, plan


def test_pq_codebooks_are_slices_of_the_ivf_sample(vecs):
    """Subspace j's codebook is the j-th slice of the SAME md5-order
    sample ivf_centroids draws — codes are positional and shared."""
    from opentelemetry_collector_contrib_spark.training import (
        ivf_centroids,
        pq_codebooks,
    )

    books = pq_codebooks(vecs, m=2, ks=2)
    sample = dict(ivf_centroids(vecs, n_list=2))
    assert len(books) == 2
    for j, book in enumerate(books):
        assert [cid for cid, _ in book] == [1, 2]
        for cid, sub in book:
            assert sub == sample[cid][j * 2 : (j + 1) * 2]
    with pytest.raises(ValueError):
        pq_codebooks(vecs, m=3, ks=2)  # dim 4 not divisible


def test_pq_encode_codebook_vectors_roundtrip(vecs, spark):
    """Every row gets exactly one length-m code array with codes in
    1..ks; on data whose sampled subvectors are distinct in EVERY
    subspace, a vector that IS sampled row c encodes to [c]*m (zero
    distance in each subspace). Ties (identical codebook subvectors, as
    the shared `vecs` fixture has in its all-zero back half) go to the
    smaller code — asserted separately below."""
    from opentelemetry_collector_contrib_spark.training import (
        ivf_centroids,
        pq_codebooks,
        pq_encode,
    )

    rows = [
        (0, [1.0, 0.0, 3.0, 0.0]),
        (1, [0.0, 1.0, 0.0, 5.0]),
        (2, [2.0, 2.0, -1.0, 1.0]),
        (3, [0.5, 0.5, 4.0, 4.0]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    books = pq_codebooks(df, m=2, ks=2)
    out = {r.vec_id: list(r.codes) for r in pq_encode(df, books).collect()}
    assert len(out) == 4
    assert all(len(c) == 2 and set(c) <= {1, 2} for c in out.values())
    sample = ivf_centroids(df, n_list=2)
    by_vec = {tuple(v): cid for cid, v in sample}
    hit = 0
    for vid, emb in rows:
        if tuple(emb) in by_vec:
            hit += 1
            assert out[vid] == [by_vec[tuple(emb)]] * 2
    assert hit == 2
    # tie-break: the shared fixture's subspace-2 codebook is [0,0] twice
    # -> every second code must resolve to the SMALLER code id (1)
    tie_books = pq_codebooks(vecs, m=2, ks=2)
    assert tie_books[1][0][1] == tie_books[1][1][1] == [0.0, 0.0]
    tie_out = {r.vec_id: list(r.codes) for r in pq_encode(vecs, tie_books).collect()}
    assert all(c[1] == 1 for c in tie_out.values())


def test_pq_adc_is_exact_on_codebook_corpus(vecs):
    """When every corpus vector sits in the codebook, quantization error
    is zero and the ADC distance equals the true squared L2 distance
    (same rounding)."""
    from opentelemetry_collector_contrib_spark.training import (
        ivf_centroids,
        pq_adc_topk,
        pq_codebooks,
    )

    sample = ivf_centroids(vecs, n_list=2)
    ids = [cid for cid, _ in sample]
    by_id = {r.vec_id: [float(x) for x in r.embedding] for r in vecs.collect()}
    sampled_vec_ids = [
        vid for vid, v in by_id.items() if tuple(v) in {tuple(s) for _, s in sample}
    ]
    corpus = vecs.filter(F.col("vec_id").isin(sampled_vec_ids))
    books = pq_codebooks(vecs, m=2, ks=2)
    got = {
        (r.query_id, r.neighbor_id): r.adc
        for r in pq_adc_topk(corpus, vecs, books, k=len(ids)).collect()
    }
    assert got, "no ADC pairs produced"
    for (qid, nid), adc in got.items():
        exact = sum(
            (a - b) * (a - b) for a, b in zip(by_id[qid], by_id[nid])
        )
        assert adc == pytest.approx(round(exact, 4), abs=1e-9)


def test_pq_adc_topk_ivf_probe_subset_and_plan(vecs):
    """IVF-PQ (probed) results carry the SAME adc scores as the plain
    ADC scan — probing narrows candidates, never changes a score — and
    the candidate join is a broadcast equi-join (no shuffle or NL join
    of the corpus side, the 100 TB side)."""
    import contextlib
    import io

    from opentelemetry_collector_contrib_spark.training import (
        ivf_centroids,
        pq_adc_topk,
        pq_codebooks,
    )

    cents = ivf_centroids(vecs, n_list=2)
    books = pq_codebooks(vecs, m=2, ks=2)
    q = vecs.filter("vec_id = 0")
    probed = pq_adc_topk(vecs, q, books, k=3, centroids=cents, n_probe=1)
    full = {
        (r.query_id, r.neighbor_id): r.adc
        for r in pq_adc_topk(vecs, q, books, k=3).collect()
    }
    rows = probed.collect()
    assert rows, "probed list produced no candidates"
    for r in rows:
        assert full[(r.query_id, r.neighbor_id)] == r.adc
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        probed.explain("formatted")
    plan = buf.getvalue()
    assert "BroadcastHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan, plan
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan
    # non-positional codes would silently score against the wrong
    # centroids through the positional element_at lookup — rejected
    bad = [[(2, b[0][1]), (1, b[1][1])] for b in books]
    with pytest.raises(ValueError):
        pq_adc_topk(vecs, q, bad, k=3)


def test_pq_rerank_recovers_exact_topk(vecs):
    """The FAISS refine stage: an ADC shortlist that contains the true
    top-k re-ranks to EXACTLY the brute-force answer (same rank, same
    rounded cos, same tie conventions), and the plan never shuffles the
    corpus — shortlist and queries broadcast into one hash-join probe."""
    import contextlib
    import io

    from opentelemetry_collector_contrib_spark.training import (
        pq_codebooks,
        pq_adc_topk,
        pq_rerank_topk,
    )

    books = pq_codebooks(vecs, m=2, ks=2)
    # k' = 3 covers every non-self candidate in the 4-vector corpus, so
    # the shortlist provably contains the true top-2
    short = pq_adc_topk(vecs, vecs, books, k=3)
    out = pq_rerank_topk(vecs, vecs, short, k=2)
    exact = brute_force_topk(vecs, vecs, k=2)
    key = lambda r: (r.query_id, r.rank)
    got = {key(r): (r.neighbor_id, r.cos) for r in out.collect()}
    want = {key(r): (r.neighbor_id, r.cos) for r in exact.collect()}
    assert got == want and got
    # plan audit on the rerank stage alone (a full-scan ADC shortlist is
    # a broadcast cross join by design — not what's under test here):
    # with a literal shortlist, the only corpus touch must be one
    # broadcast hash-join probe
    lit_short = vecs.sparkSession.createDataFrame(
        [(0, 1), (0, 2), (1, 0)], "query_id long, neighbor_id long"
    )
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        pq_rerank_topk(vecs, vecs, lit_short, k=2).explain("formatted")
    plan = buf.getvalue()
    assert "BroadcastHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan, plan
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan


def test_ann_recall_metric(vecs):
    """recall(exact, exact) == 1.0; a disjoint approx scores 0.0; a
    half-overlapping approx scores exactly its overlap fraction; and
    duplicate pairs in the approx frame can't inflate recall past 1."""
    from opentelemetry_collector_contrib_spark.training import ann_recall

    spark = vecs.sparkSession
    exact = brute_force_topk(vecs, vecs, k=2)  # 4 queries x 2 pairs
    assert [tuple(r) for r in ann_recall(exact, exact).collect()] == [
        (1.0, 8)
    ]
    disjoint = spark.createDataFrame(
        [(0, 99), (1, 99)], "query_id long, neighbor_id long"
    )
    assert [tuple(r) for r in ann_recall(exact, disjoint).collect()] == [
        (0.0, 8)
    ]
    half = exact.filter("rank = 1")  # exactly half of exact's pairs
    assert [tuple(r) for r in ann_recall(exact, half).collect()] == [
        (0.5, 8)
    ]
    duped = half.unionByName(half)  # dup pairs must not double-count
    assert [tuple(r) for r in ann_recall(exact, duped).collect()] == [
        (0.5, 8)
    ]


def test_ivf_refine_means_match_hand_computation(vecs):
    """One Lloyd iteration: each refined centroid equals the 1e-9
    fixed-point mean of its assigned vectors, bit-for-bit, regardless of
    input partitioning."""
    import math

    from opentelemetry_collector_contrib_spark.training import (
        ivf_assign,
        ivf_centroids,
        ivf_refine,
    )

    cents = ivf_centroids(vecs, n_list=2)
    r1 = ivf_refine(vecs, cents, n_iter=1)
    r2 = ivf_refine(vecs.repartition(3), cents, n_iter=1)
    assert r1 == r2                     # partitioning-independent fit

    assign = {r.vec_id: r.list_id for r in ivf_assign(vecs, cents).collect()}
    rows = {
        r.vec_id: [float(x) for x in r.embedding] for r in vecs.collect()
    }
    for (cid, vec), (_, old) in zip(r1, cents):
        members = [rows[i] for i, l in assign.items() if l == cid]
        if not members:
            assert vec == old
            continue
        expect = [
            (sum(math.floor(m[p] * 1e9) for m in members) / len(members))
            / 1e9
            for p in range(len(members[0]))
        ]
        assert vec == expect


def test_ivf_refine_empty_list_keeps_previous_centroid(vecs):
    from opentelemetry_collector_contrib_spark.training import ivf_refine

    # centroid 2 duplicates centroid 1, and cosine ties resolve to the
    # smaller centroid_id — list 2 receives nothing
    cents = [(1, [1.0, 0.0, 0.0, 0.0]), (2, [1.0, 0.0, 0.0, 0.0])]
    refined = ivf_refine(vecs, cents, n_iter=1)
    assert refined[1] == (2, [1.0, 0.0, 0.0, 0.0])
    assert refined[0][1] != cents[0][1]  # non-empty list moved


def test_multimodal_plumbing(docs):
    mm = binary_table(docs)
    assert dict(mm.dtypes)["payload"] == "binary"
    feats = extract_features(mm)
    rows = {r.doc_id: r for r in feats.collect()}
    assert len(rows) == 5
    assert rows[0].n_bytes == len(b"the quick brown fox jumps over the lazy dog")
    assert rows[0].checksum == rows[1].checksum  # deterministic on content
    assert rows[0].head == b"the quic".hex()
    assert 1 <= rows[0].width <= 640 and 1 <= rows[0].height <= 480


def test_training_ops_on_driver_tables(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    assert exact_dedup(docs).count() <= docs.count()
    sigs = minhash_signatures(docs, n_hashes=8)
    assert sigs.filter(F.size("sig") != 8).count() == 0
    assert hyperplane_buckets(emb, n_planes=4).count() == emb.count()


# --- connected components (pairs -> dedup clusters) --------------------------


def _cc(spark, n_docs, pairs, **kw):
    from opentelemetry_collector_contrib_spark.training.dedup import (
        connected_components,
    )

    docs = spark.createDataFrame([(i,) for i in range(n_docs)], "doc_id int")
    pdf = spark.createDataFrame(pairs or [(None, None)], "a_id int, b_id int")
    if not pairs:
        pdf = pdf.filter("a_id IS NOT NULL")
    out = connected_components(docs, pdf, **kw)
    return {r.doc_id: r.cluster_id for r in out.collect()}


def test_cc_chain_collapses_to_min(spark):
    # 0-1, 1-2, 2-3 chain + isolated 4
    got = _cc(spark, 5, [(0, 1), (1, 2), (2, 3)])
    assert got == {0: 0, 1: 0, 2: 0, 3: 0, 4: 4}


def test_cc_two_components(spark):
    got = _cc(spark, 6, [(0, 1), (3, 4), (4, 5)])
    assert got == {0: 0, 1: 0, 2: 2, 3: 3, 4: 3, 5: 3}


def test_cc_no_pairs_all_singletons(spark):
    got = _cc(spark, 3, [])
    assert got == {0: 0, 1: 1, 2: 2}


def test_cc_long_chain_converges(spark):
    n = 12
    got = _cc(spark, n, [(i, i + 1) for i in range(n - 1)])
    assert got == {i: 0 for i in range(n)}


def test_cc_canonical_selection(spark):
    from pyspark.sql import functions as F

    from opentelemetry_collector_contrib_spark.training.dedup import (
        connected_components,
    )

    docs = spark.createDataFrame([(i,) for i in range(4)], "doc_id int")
    pairs = spark.createDataFrame([(1, 3)], "a_id int, b_id int")
    cc = connected_components(docs, pairs)
    keep = cc.filter(F.col("doc_id") == F.col("cluster_id"))
    assert sorted(r.doc_id for r in keep.collect()) == [0, 1, 2]


class TestCuration:
    """curate(): quality/language gate + one canonical doc per cluster
    (training/curation.py)."""

    def _run(self, spark, rows, clusters, **kw):
        from opentelemetry_collector_contrib_spark.training.curation import curate

        docs = spark.createDataFrame(rows, ["doc_id", "text"])
        cl = spark.createDataFrame(clusters, ["doc_id", "cluster_id"])
        return {r["doc_id"]: r.asDict() for r in curate(docs, cl, **kw).collect()}

    def test_best_quality_member_wins(self, spark):
        # docs 0/1/2 share cluster 0; doc 2 has the richest text (longer,
        # more distinct tokens, more stopwords) so it is the canonical one
        rows = [
            (0, "the fox the fox the fox"),
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "the quick brown fox jumps over the lazy dog and it is a "
                "very long tale of an old forest full of distinct words"),
            (3, "an entirely different document about the spark engine and "
                "how it is built to run in a cluster of many machines"),
        ]
        clusters = [(0, 0), (1, 0), (2, 0), (3, 3)]
        out = self._run(spark, rows, clusters)
        assert set(out) == {2, 3}
        assert out[2]["cluster_id"] == 0 and out[2]["n_members"] == 3
        assert out[3]["cluster_id"] == 3 and out[3]["n_members"] == 1

    def test_quality_and_lang_gate_prune_before_selection(self, spark):
        # doc 1 is non-English (no stopwords): excluded even though it is
        # in cluster 0; n_members counts only eligible members
        rows = [
            (0, "the quick brown fox is in a field and it jumps to the sky"),
            (1, "zzz qqq www rrr ttt yyy uuu iii ooo ppp"),
            (2, "the dog is in the yard and the cat is on the mat again"),
        ]
        clusters = [(0, 0), (1, 0), (2, 2)]
        out = self._run(spark, rows, clusters)
        assert set(out) == {0, 2}
        assert out[0]["n_members"] == 1
        # a min_quality above every score empties the result
        assert self._run(spark, rows, clusters, min_quality=10001) == {}

    def test_tie_breaks_on_smallest_id(self, spark):
        rows = [(7, "the cat is on the mat"), (3, "the cat is on the mat")]
        clusters = [(7, 3), (3, 3)]
        out = self._run(spark, rows, clusters)
        assert set(out) == {3}
        assert out[3]["n_members"] == 2


class TestSamplingPacking:
    """training/sampling.py: stratified sampling + sequence packing."""

    def test_stratified_exact_n(self, spark):
        from opentelemetry_collector_contrib_spark.training.sampling import (
            stratified_sample,
        )

        rows = [(i, f"s{i % 3}") for i in range(30)]
        df = spark.createDataFrame(rows, "doc_id long, stratum string")
        out = stratified_sample(df, ["stratum"], n_per_stratum=4)
        counts = {r["stratum"]: r["n"] for r in
                  out.groupBy("stratum").agg(F.count("*").alias("n")).collect()}
        assert counts == {"s0": 4, "s1": 4, "s2": 4}
        # deterministic: same draw twice
        a = sorted(r["doc_id"] for r in out.collect())
        b = sorted(r["doc_id"] for r in stratified_sample(
            df, ["stratum"], n_per_stratum=4).collect())
        assert a == b

    def test_stratified_fraction_ceil(self, spark):
        from opentelemetry_collector_contrib_spark.training.sampling import (
            stratified_sample,
        )

        rows = [(i, "a" if i < 10 else "b") for i in range(13)]  # 10 + 3
        df = spark.createDataFrame(rows, "doc_id long, stratum string")
        out = stratified_sample(df, ["stratum"], fraction=0.25)
        counts = {r["stratum"]: r["n"] for r in
                  out.groupBy("stratum").agg(F.count("*").alias("n")).collect()}
        assert counts == {"a": 3, "b": 1}  # ceil(2.5)=3, ceil(0.75)=1
        with pytest.raises(ValueError):
            stratified_sample(df, ["stratum"])

    def test_packing_layout_invariants(self, spark):
        from opentelemetry_collector_contrib_spark.training.sampling import (
            pack_sequences,
        )

        rows = [(i, 10 + (i * 37) % 90) for i in range(200)]
        df = spark.createDataFrame(rows, "doc_id long, n_tokens long")
        out = pack_sequences(df, budget=128, n_shards=4).collect()
        assert len(out) == 200
        by_shard = {}
        for r in out:
            by_shard.setdefault(r["shard"], []).append(r)
        assert set(by_shard) == {0, 1, 2, 3}
        for shard, docs in by_shard.items():
            docs = sorted(docs, key=lambda r: (r["pack_id"], r["pack_offset"]))
            # token stream is gapless: offsets advance by exactly n_tokens
            cursor = 0
            for r in docs:
                assert r["pack_id"] * 128 + r["pack_offset"] == cursor
                # n_packs matches the straddle arithmetic
                start, end = cursor, cursor + max(r["n_tokens"], 1) - 1
                assert r["n_packs"] == end // 128 - start // 128 + 1
                cursor += r["n_tokens"]

    def test_packing_straddle_and_empty(self, spark):
        from opentelemetry_collector_contrib_spark.training.sampling import (
            pack_sequences,
        )

        df = spark.createDataFrame(
            [(1, 300), (2, 0), (3, 50)], "doc_id long, n_tokens long"
        )
        out = {r["doc_id"]: r for r in pack_sequences(df, budget=100).collect()}
        # a 300-token doc starting anywhere spans 3 or 4 packs
        assert out[1]["n_packs"] in (3, 4)
        assert out[2]["n_packs"] == 1  # empty doc occupies no space
        total = sum(r["n_tokens"] for r in out.values())
        assert total == 350
        with pytest.raises(ValueError):
            pack_sequences(df, budget=0)


class TestQuantize:
    def test_int8_roundtrip_error_bounded(self, spark):
        from opentelemetry_collector_contrib_spark.training.quantize import (
            quantize_int8,
        )

        rows = [
            (0, [1.0, -0.5, 0.25, 0.0]),
            (1, [127.0, -127.0, 63.5, 0.1]),
            (2, [0.0, 0.0, 0.0, 0.0]),      # all-zero: scale 0, no div/0
            (3, [1e-9, -1e-9, 5e-10, 0.0]),
        ]
        df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
        out = {r["vec_id"]: r for r in quantize_int8(df).collect()}
        # max-magnitude element always hits ±127
        assert max(map(abs, out[0]["qvec"])) == 127
        assert out[1]["qvec"][0] == 127 and out[1]["qvec"][1] == -127
        assert out[2]["qvec"] == [0, 0, 0, 0] and out[2]["scale_q9"] == 0
        # dequantized error <= scale/2 per element (true scale; the
        # reported scale_q9 is floor-truncated at 1e-9)
        for vid, vec in rows:
            scale = max(abs(x) for x in vec) / 127.0
            for x, qx in zip(vec, out[vid]["qvec"]):
                assert abs(x - qx * scale) <= scale / 2 + 1e-12

    def test_clamp_never_exceeds_int8(self, spark):
        from opentelemetry_collector_contrib_spark.training.quantize import (
            quantize_int8,
        )

        df = spark.createDataFrame(
            [(0, [(i - 50) * 1.7 for i in range(100)])],
            "vec_id long, embedding array<double>",
        )
        q = quantize_int8(df).first()["qvec"]
        assert all(-127 <= x <= 127 for x in q)


def test_contamination_check(spark):
    """contamination_check flags training docs sharing k-shingles with
    the eval set, counts shared shingles, leaves clean docs out."""
    from opentelemetry_collector_contrib_spark.training.dedup import (
        contamination_check,
    )

    ev = spark.createDataFrame(
        [(100, "the quick brown fox jumps high")], "doc_id long, text string"
    )
    tr = spark.createDataFrame(
        [
            (1, "the quick brown fox sleeps"),     # shares 2 shingles
            (2, "completely different content here entirely"),
            (3, "quick brown fox jumps high today"),  # shares 3
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r["n_shared"] for r in contamination_check(tr, ev).collect()}
    assert got == {1: 2, 3: 3}


def test_pack_nosplit_invariants(spark):
    """Next-fit no-split packing: no pack exceeds budget (except
    single oversized docs), docs never straddle, order deterministic."""
    from opentelemetry_collector_contrib_spark.training.sampling import (
        pack_sequences_nosplit,
    )

    rows = [(i, 10 + (i * 41) % 200) for i in range(120)] + [(999, 500)]
    df = spark.createDataFrame(rows, "doc_id long, n_tokens long")
    out = pack_sequences_nosplit(df, budget=256, n_shards=2).collect()
    assert len(out) == 121
    by_pack = {}
    for r in out:
        by_pack.setdefault((r["shard"], r["pack_id"]), []).append(r["n_tokens"])
    for (shard, pid), toks in by_pack.items():
        total = sum(toks)
        # a pack only exceeds the budget when it holds ONE oversized doc
        assert total <= 256 or (len(toks) == 1 and toks[0] > 256), (shard, pid, toks)
    # oversized doc sits alone
    big = [r for r in out if r["doc_id"] == 999][0]
    assert by_pack[(big["shard"], big["pack_id"])] == [500]
    # deterministic across runs
    a = sorted((r["doc_id"], r["shard"], r["pack_id"]) for r in out)
    b = sorted((r["doc_id"], r["shard"], r["pack_id"])
               for r in pack_sequences_nosplit(df, budget=256, n_shards=2).collect())
    assert a == b


def test_bpe_token_count(spark):
    from opentelemetry_collector_contrib_spark.training.textstats import (
        bpe_token_count,
    )

    df = spark.createDataFrame(
        [(0, "it's error=404 ok"), (1, ""), (2, "a  b")],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: (r["n_ws"], r["n_bpe"]) for r in bpe_token_count(df).collect()}
    # "it's error=404 ok": [it]['s][ error][=][404][ ok] = 6 BPE, 3 ws
    assert got[0] == (3, 6)
    assert got[1] == (0, 0)
    assert got[2][0] == 2


class TestRepetitionStats:
    """Gopher repetition signals (training/textstats.py
    repetition_stats) — hand-computed expectations on crafted docs,
    including the multi-line paths the flat driver fixture can't
    exercise."""

    @pytest.fixture(scope="class")
    def stats(self, spark):
        from opentelemetry_collector_contrib_spark.training.textstats import (
            repetition_stats,
        )

        rows = [
            (1, "the cat sat on the mat the cat sat on the mat"),
            (2, "alpha\nbeta\nalpha\ngamma\n- bullet point\nthe end..."),
            (3, "x y z " * 30),
            (4, ""),
            (5, "#### ### hello … world..."),
            (6, "uno\nuno\nuno\nuno"),
        ]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        return {r["doc_id"]: r.asDict() for r in repetition_stats(df).collect()}

    def test_top2gram_tiebreak_and_mass(self, stats):
        # doc 1: every 2-gram occurs twice; tie broken to the
        # lexicographically greatest ("the mat", 6 chars): 2*6/34
        s = stats[1]
        assert s["n_words"] == 12
        assert s["top2gram_frac_q4"] == int(2 * 6 / 34 * 10000 + 0.5)

    def test_dup5gram_occurrences(self, stats):
        # doc 1: 8 5-grams, two classes duplicated (2+2 occurrences)
        assert stats[1]["dup5gram_frac_q4"] == 5000
        # doc 3: "x y z" * 30 — every 5-gram duplicated
        assert stats[3]["dup5gram_frac_q4"] == 10000

    def test_line_stats(self, stats):
        s = stats[2]
        assert s["n_lines"] == 6
        # 6 lines, 5 distinct -> 1/6
        assert s["dup_line_frac_q4"] == int(1 / 6 * 10000 + 0.5)
        # chars: alpha(5)+beta(4)+alpha(5)+gamma(5)+bullet(14)+end(10)=43
        # distinct chars = 38 -> dup char frac 5/43
        assert s["dup_line_char_frac_q4"] == int(5 / 43 * 10000 + 0.5)
        assert s["bullet_line_frac_q4"] == int(1 / 6 * 10000 + 0.5)
        assert s["ellipsis_line_frac_q4"] == int(1 / 6 * 10000 + 0.5)
        # doc 6: all four lines identical -> 3/4 dup
        assert stats[6]["dup_line_frac_q4"] == 7500
        assert stats[6]["dup_line_char_frac_q4"] == 7500

    def test_symbols_and_alpha(self, stats):
        s = stats[5]
        # 7 '#', one '...', one '…' over 5 words = 9/5
        assert s["symbol_word_ratio_q4"] == 18000
        assert s["alpha_word_frac_q4"] == 4000

    def test_empty_doc_all_zero(self, stats):
        s = stats[4]
        assert s["n_words"] == 0 and s["n_lines"] == 0
        assert all(
            v == 0 for k, v in s.items() if k.endswith("_q4")
        )

    def test_whitespace_class_tokens(self, spark):
        # newline-wrapped prose must not glue words (single-space split
        # would see 2 words here)
        from opentelemetry_collector_contrib_spark.training.textstats import (
            repetition_stats,
        )

        df = spark.createDataFrame(
            [(0, "one two\nthree\tfour\r\nfive six")],
            "doc_id long, text string",
        )
        assert repetition_stats(df).collect()[0]["n_words"] == 6


def test_gopher_quality_filter(spark):
    from opentelemetry_collector_contrib_spark.training.textstats import (
        gopher_quality_filter,
    )

    good = (
        "the quick brown fox jumps over a lazy dog while seven other "
        "animals watch from behind tall green trees near an old stone "
        "bridge that spans this wide river today"
    )
    rows = [
        (0, good),                                  # passes
        (1, "short text"),                          # < min_words
        (2, ("spam " * 35).strip()),                # top2gram ~ 1.0
        (3, good.replace("quick", "######")),       # symbol ratio
        (4, good + " " + good),                     # dup 5-grams
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    kept = [r["doc_id"] for r in gopher_quality_filter(df, min_words=20).collect()]
    assert kept == [0]


class TestChunking:
    def test_sliding_windows_exact(self, spark):
        from opentelemetry_collector_contrib_spark.training.chunking import (
            chunk_documents,
        )

        df = spark.createDataFrame(
            [(1, " ".join(f"t{i}" for i in range(10))), (2, "a b"), (3, "")],
            "doc_id long, text string",
        )
        out = chunk_documents(df, window=4, overlap=1).collect()
        got = {(r.doc_id, r.chunk_idx): (r.chunk_text, r.n_tokens) for r in out}
        assert got[(1, 0)] == ("t0 t1 t2 t3", 4)
        assert got[(1, 1)] == ("t3 t4 t5 t6", 4)
        assert got[(1, 2)] == ("t6 t7 t8 t9", 4)
        assert got[(2, 0)] == ("a b", 2)         # short doc: one chunk
        assert not any(d == 3 for d, _ in got)   # empty doc: no chunks
        assert len(got) == 4

    def test_overlap_bounds_validated(self, spark):
        from opentelemetry_collector_contrib_spark.training.chunking import (
            chunk_documents,
        )

        df = spark.createDataFrame([(1, "a")], "doc_id long, text string")
        with pytest.raises(ValueError):
            chunk_documents(df, window=4, overlap=4)

    def test_vocab_topk_deterministic_ties(self, spark):
        from opentelemetry_collector_contrib_spark.training.chunking import (
            vocab_topk,
        )

        df = spark.createDataFrame(
            [(1, "b a b c a"), (2, "c d")], "doc_id long, text string"
        )
        rows = [(r.token, r.n) for r in vocab_topk(df, k=3).collect()]
        # counts: a=2 b=2 c=2 d=1 -> top3 ties broken lexicographically
        assert rows == [("a", 2), ("b", 2), ("c", 2)]


def test_semdedup_keeps_farthest_from_centroid(vecs):
    # SemDeDup keep rule (arXiv:2303.09540): inside a cluster, among
    # near-duplicates keep the member with the LOWEST cosine to the
    # centroid. Centroid = vec 0's direction -> vecs 0 and 1 are near
    # dups (cos ~ 1); vec 1 is marginally farther from the centroid
    # (cc < 1) so vec 0 is the one removed.
    from opentelemetry_collector_contrib_spark.training import semdedup

    cents = [(1, [1.0, 0.0, 0.0, 0.0])]
    got = {r.vec_id: r for r in semdedup(vecs, cents, threshold=0.95).collect()}
    assert len(got) == 4 and all(r.cluster_id == 1 for r in got.values())
    assert not got[0].keep  # closer to centroid -> removed
    assert got[1].keep  # farthest member of the dup group survives
    assert got[2].keep and got[3].keep  # no partner above threshold
    assert got[0].cent_cos == pytest.approx(1.0, abs=1e-4)


def test_semdedup_cap_skips_quadratic_test(vecs):
    from opentelemetry_collector_contrib_spark.training import semdedup

    cents = [(1, [1.0, 0.0, 0.0, 0.0])]
    got = semdedup(vecs, cents, threshold=0.95, max_cluster=3).collect()
    # the 4-member cluster exceeds the cap: everything kept, no pair test
    assert len(got) == 4 and all(r.keep for r in got)


def test_semdedup_tie_breaks_to_smaller_id(spark):
    from opentelemetry_collector_contrib_spark.training import semdedup

    # identical vectors: equal cent_cos, equal pairwise cos -> the
    # smallest id survives, the rest are removed
    rows = [(i, [1.0, 0.0]) for i in range(3)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    got = {r.vec_id: r.keep for r in semdedup(df, [(1, [1.0, 0.0])], 0.99).collect()}
    assert got == {0: True, 1: False, 2: False}


def test_line_dedup_corpus_boilerplate(spark):
    """RefinedWeb semantics: a line recurring corpus-wide (>= min_dup
    occurrences, intra-doc repeats counted) is struck from EVERY doc;
    survivors keep original order; fully-boilerplate docs drop; counts
    reconcile to the doc's original line total."""
    from opentelemetry_collector_contrib_spark.training import line_dedup

    df = spark.createDataFrame(
        [
            (1, "cookie banner\nunique alpha\nnav bar"),
            (2, "cookie banner\nunique beta"),
            (3, "nav bar\nnav bar\nunique gamma"),  # intra-doc repeat
            (4, "cookie banner"),  # fully boilerplate -> dropped
        ],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: r for r in line_dedup(df, min_dup=2).collect()
    }
    assert set(out) == {1, 2, 3}
    assert out[1]["text_clean"] == "unique alpha"
    assert (out[1]["kept_lines"], out[1]["removed_lines"]) == (1, 2)
    assert out[2]["text_clean"] == "unique beta"
    assert out[3]["text_clean"] == "unique gamma"
    assert (out[3]["kept_lines"], out[3]["removed_lines"]) == (1, 2)
    # min_dup=4: no line reaches 4 occurrences (cookie banner and nav
    # bar both sit at 3, intra-doc repeats included) -> all docs intact
    out4 = {
        r["doc_id"]: r["text_clean"]
        for r in line_dedup(df, min_dup=4).collect()
    }
    assert out4[1] == "cookie banner\nunique alpha\nnav bar"
    assert out4[3] == "nav bar\nnav bar\nunique gamma"
    assert out4[4] == "cookie banner"

    # order preservation across many surviving lines
    long = spark.createDataFrame(
        [(9, "\n".join(f"line {i}" for i in range(20)))],
        "doc_id long, text string",
    )
    assert line_dedup(long, min_dup=2).collect()[0]["text_clean"] == (
        "\n".join(f"line {i}" for i in range(20))
    )


def test_line_dedup_plan_shape(spark):
    """Scale guards: the corpus line count must be a partial/final
    HashAggregate (map-side combine for viral boilerplate), membership a
    non-broadcast-forced anti join, and no Window anywhere."""
    from opentelemetry_collector_contrib_spark.training import line_dedup

    df = spark.createDataFrame(
        [(1, "a\nb"), (2, "a\nc")], "doc_id long, text string"
    )
    plan = (
        line_dedup(df)._jdf.queryExecution().executedPlan().toString()
    )
    assert "Window" not in plan, plan
    assert "CartesianProduct" not in plan, plan
    assert "HashAggregate" in plan, plan


def test_lsh_tuning_curve_closed_form(spark):
    """Hand-checked S-curve points: s=0.5 with (b=8, r=4) gives
    1-(1-0.5^4)^8 = 0.4033; threshold (1/8)^(1/4) = 0.5946; p is
    monotone in s for every config; grid is b_configs x grid_n rows."""
    from opentelemetry_collector_contrib_spark.training import (
        lsh_tuning_curve,
    )

    rows = lsh_tuning_curve(spark).collect()
    assert len(rows) == 4 * 19
    pt = {
        (r["bands"], r["rows_per_band"], r["s"]): r for r in rows
    }
    r = pt[(8, 4, 0.5)]
    assert r["p_candidate"] == round(1 - (1 - 0.5**4) ** 8, 4)
    assert r["s_threshold"] == round((1 / 8) ** 0.25, 4)
    for b, rpb in [(4, 2), (8, 4), (16, 2), (4, 8)]:
        ps = [
            pt[(b, rpb, round(i / 20.0, 4))]["p_candidate"]
            for i in range(1, 20)
        ]
        assert ps == sorted(ps), (b, rpb, ps)


def test_mixture_temperature_weights(spark):
    """alpha=1 reproduces natural proportions; alpha=0 is uniform;
    alpha=0.5 boosts the minority source above its raw share; p_temp
    sums to 1 (up to rounding) in every case."""
    from opentelemetry_collector_contrib_spark.training import (
        mixture_temperature,
    )

    df = spark.createDataFrame(
        [(1, "a b c d", "big"), (2, "a b c d", "big"), (3, "a b", "small")],
        "doc_id long, text string, source string",
    )
    def table(alpha):
        return {
            r["source"]: r for r in mixture_temperature(df, alpha).collect()
        }

    nat = table(1.0)
    assert nat["big"]["n_tokens"] == 8 and nat["small"]["n_tokens"] == 2
    assert nat["big"]["p_raw"] == 0.8 and nat["big"]["p_temp"] == 0.8
    assert nat["small"]["boost"] == 1.0
    uni = table(0.0)
    assert uni["big"]["p_temp"] == 0.5 == uni["small"]["p_temp"]
    mid = table(0.5)
    assert mid["small"]["p_temp"] > mid["small"]["p_raw"]
    assert mid["small"]["boost"] > 1.0 > mid["big"]["boost"]
    assert abs(mid["big"]["p_temp"] + mid["small"]["p_temp"] - 1) < 2e-6


def test_winnow_guarantee_and_coverage(spark):
    """The SIGMOD'03 contracts: (1) two docs sharing a passage of
    >= window+k-1 tokens share at least one fingerprint VALUE; (2)
    selected positions cover the doc — consecutive selections are never
    more than `window` shingles apart (every window contributes); (3)
    identical docs produce identical (pos, fp) sets; (4) a doc shorter
    than one window still fingerprints, one with < k tokens yields
    nothing; (5) a constant-token doc yields ONE distinct fingerprint
    VALUE (each window's rightmost-min is the same hash)."""
    from opentelemetry_collector_contrib_spark.training import (
        winnow_fingerprints,
    )

    shared = "p q r s t u v w x y"  # 10 tokens >= window+k-1 = 7
    df = spark.createDataFrame(
        [
            (1, f"alpha beta gamma {shared} delta"),
            (2, f"one two {shared} three four five"),
            (3, f"alpha beta gamma {shared} delta"),  # == doc 1
            (4, "tiny doc here"),          # 3 tokens < k=4 -> no rows
            (5, "a b c d e"),              # 2 shingles < window -> 1 win
            (6, " ".join(["z"] * 12)),     # constant: 9 equal hashes
        ],
        "doc_id long, text string",
    )
    out = winnow_fingerprints(df, k=4, window=4).collect()
    by_doc: dict = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], set()).add((r["pos"], r["fp"]))
    fps = {d: {fp for _, fp in s} for d, s in by_doc.items()}
    assert fps[1] & fps[2], "shared passage must share a fingerprint"
    assert by_doc[1] == by_doc[3]
    assert 4 not in by_doc
    assert len(by_doc[5]) >= 1
    assert len(fps[6]) == 1  # constant run -> one distinct fp value
    # coverage: gaps between consecutive selected positions <= window
    pos1 = sorted(p for p, _ in by_doc[1])
    assert pos1[0] < 4
    assert all(b - a <= 4 for a, b in zip(pos1, pos1[1:])), pos1
    # plan guard: zero shuffles/joins — a single map-only projection
    plan = (
        winnow_fingerprints(df)._jdf.queryExecution()
        .executedPlan().toString()
    )
    assert "Exchange" not in plan, plan
    assert "Join" not in plan, plan


def test_winnow_match_pairs_semantics(spark):
    """Docs sharing a long passage pair up; the max_df cap silences
    viral boilerplate fingerprints; min_shared prunes single-fp
    collisions; identical docs dominate the ranking."""
    from opentelemetry_collector_contrib_spark.training import (
        winnow_fingerprints,
        winnow_match_pairs,
    )

    shared = "p q r s t u v w x y z zz"
    df = spark.createDataFrame(
        [(1, f"alpha beta gamma {shared} delta"),
         (2, f"one two {shared} three four"),
         (3, f"alpha beta gamma {shared} delta"),
         (4, "totally unrelated words with no overlap at all here")],
        "doc_id long, text string",
    )
    fps = winnow_fingerprints(df, k=4, window=4)
    got = {
        (r["a_id"], r["b_id"]): r["shared_fps"]
        for r in winnow_match_pairs(fps, min_shared=1, max_df=50).collect()
    }
    assert (1, 3) in got and (1, 2) in got and (2, 3) in got
    assert not any(4 in p for p in got)
    assert got[(1, 3)] >= got[(1, 2)]  # identical docs share the most
    # max_df=1: every fp appearing in 2+ docs is boilerplate -> no pairs
    assert (
        winnow_match_pairs(fps, min_shared=1, max_df=1).count() == 0
    )


def test_semantic_decontaminate(vecs, spark):
    """A train vector aligned with an eval vector is flagged with the
    exact rounded cosine; orthogonal/opposite train vectors pass clean;
    n_hits counts every eval vector above threshold; empty eval set
    flags nothing; zero-norm train vectors never crash (null cosine)."""
    from opentelemetry_collector_contrib_spark.training import (
        semantic_decontaminate,
    )

    ev = vecs.filter("vec_id = 0")          # [1,0,0,0]
    tr = vecs.filter("vec_id != 0")         # near-dup, orthogonal, opposite
    got = {
        r["vec_id"]: r
        for r in semantic_decontaminate(tr, ev, threshold=0.9).collect()
    }
    assert set(got) == {1}
    assert got[1]["max_cos"] == 1.0 and got[1]["n_hits"] == 1
    # two eval vectors both matching -> n_hits = 2
    ev2 = spark.createDataFrame(
        [(100, [1.0, 0.0, 0.0, 0.0]), (101, [1.0, 0.001, 0.0, 0.0])],
        "vec_id long, embedding array<float>",
    )
    got2 = semantic_decontaminate(tr, ev2, threshold=0.9).collect()
    assert {r["vec_id"]: r["n_hits"] for r in got2} == {1: 2}
    # empty eval set: collect_list gives [], no flags, no crash
    assert (
        semantic_decontaminate(tr, vecs.filter("vec_id < 0")).count() == 0
    )
    # zero-norm train vector: null cosine drops silently (ANSI-safe)
    zn = spark.createDataFrame(
        [(7, [0.0, 0.0, 0.0, 0.0])], "vec_id long, embedding array<float>"
    )
    assert semantic_decontaminate(zn, ev, threshold=0.1).count() == 0
    # plan guard: eval side broadcast, train side never shuffles
    plan = (
        semantic_decontaminate(tr, ev)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastNestedLoopJoin" in plan, plan
    # the only exchanges allowed are the eval-side collect (tiny,
    # SinglePartition) and its broadcast — the train side must never
    # shuffle by key
    assert "Exchange hashpartitioning" not in plan, plan


def test_corpus_health_rollup_grains(spark):
    """All three grains in one result: per (source,lang), per source,
    overall; dup rate counts exact text duplicates; fixed-point
    fractions floor correctly; lvl disambiguates grains."""
    from opentelemetry_collector_contrib_spark.training import corpus_health

    df = spark.createDataFrame(
        [
            (1, "a b c", "en", "web"),
            (2, "a b c", "en", "web"),      # exact dup of 1
            (3, "d e f g h", "de", "web"),
            (4, "one two", "en", "books"),
        ],
        "doc_id long, text string, lang string, source string",
    )
    rows = corpus_health(df, short_tokens=3).collect()
    by = {(r["source"], r["lang"], r["lvl"]): r for r in rows}
    assert len(rows) == 3 + 2 + 1  # 3 (s,l) + 2 (s) + 1 overall
    web_en = by[("web", "en", 0)]
    assert web_en["n_docs"] == 2 and web_en["distinct_docs"] == 1
    assert web_en["dup_frac_q4"] == 5000
    web = by[("web", None, 1)]
    assert web["n_docs"] == 3 and web["n_tokens"] == 11
    assert web["avg_tokens_q4"] == 36666  # floor(10000*11/3)
    total = by[(None, None, 3)]
    assert total["n_docs"] == 4 and total["distinct_docs"] == 3
    assert total["short_frac_q4"] == 2500  # only doc 4 is < 3 tokens


def test_incremental_dedup_against_corpus_and_self(spark):
    """Batch rows already in the corpus drop; intra-batch dups collapse
    to the lowest id; genuinely new rows pass with all columns; result
    is identical with a tiny Bloom (all-positive, pure fallthrough to
    the anti-join) and a roomy one."""
    from opentelemetry_collector_contrib_spark.training import (
        incremental_dedup,
    )

    seen = spark.createDataFrame(
        [(1, "old doc one", "en"), (2, "old doc two", "en")],
        "doc_id long, text string, lang string",
    )
    batch = spark.createDataFrame(
        [
            (10, "old doc one", "en"),   # exact corpus dup -> drop
            (11, "brand new alpha", "en"),
            (12, "brand new alpha", "de"),  # intra-batch dup -> keep 11
            (13, "brand new beta", "fr"),
        ],
        "doc_id long, text string, lang string",
    )
    for m_bits in (8, 1 << 16):  # degenerate and roomy Bloom sizings
        got = {
            r["doc_id"]: r
            for r in incremental_dedup(
                batch, seen, bloom_bits=m_bits
            ).collect()
        }
        assert set(got) == {11, 13}, (m_bits, got)
        assert got[11]["lang"] == "en" and got[13]["lang"] == "fr"
    # empty corpus: pure intra-batch dedup
    empty = seen.filter("doc_id < 0")
    kept = sorted(
        r["doc_id"] for r in incremental_dedup(batch, empty).collect()
    )
    assert kept == [10, 11, 13]


def test_cross_source_dup_matrix(spark):
    """Unordered source pairs canonicalize (web,books)==(books,web);
    diagonal counts intra-source pairs; counts add up."""
    from opentelemetry_collector_contrib_spark.training import (
        cross_source_dup_matrix,
    )

    docs = spark.createDataFrame(
        [(1, "web"), (2, "web"), (3, "books"), (4, "cc")],
        "doc_id long, source string",
    )
    pairs = spark.createDataFrame(
        [(1, 2), (1, 3), (3, 2), (1, 4)], "a_id long, b_id long"
    )
    got = {
        (r["source_a"], r["source_b"]): r["n_pairs"]
        for r in cross_source_dup_matrix(docs, pairs).collect()
    }
    assert got == {
        ("web", "web"): 1,        # (1,2)
        ("books", "web"): 2,      # (1,3) and (3,2) canonicalize together
        ("cc", "web"): 1,
    }


def test_ivf_balance_metric(spark):
    """Hand-computed: sizes {0:3, 1:1} with n_list=4 -> used=2,
    mean_q4 = floor(10000*4/4) = 10000, imbalance = 4*(9+1)/16 = 2.5
    -> 25000; a perfectly balanced assignment scores exactly 1.0."""
    from opentelemetry_collector_contrib_spark.training import ivf_balance

    assigned = spark.createDataFrame(
        [(i, 0) for i in range(3)] + [(9, 1)], "vec_id long, list_id int"
    )
    r = ivf_balance(assigned, n_list=4).collect()[0]
    assert r["n_lists_used"] == 2
    assert (r["min_size"], r["max_size"]) == (1, 3)
    assert r["mean_size_q4"] == 10000      # floor(10000*4/4)
    assert r["imbalance_q4"] == 25000      # 4*(9+1)/16 = 2.5
    # perfectly balanced: imbalance exactly 1.0
    bal = spark.createDataFrame(
        [(i, i % 4) for i in range(8)], "vec_id long, list_id int"
    )
    assert ivf_balance(bal, n_list=4).collect()[0]["imbalance_q4"] == 10000


def test_token_entropy_hand_values(spark):
    """Closed-form checks: a constant doc has H=0 (ratio 0); a
    all-distinct doc has H=log2(n) (ratio 1.0 = 10000); a 50/50 doc of
    two tokens has exactly 1 bit; empty docs drop; a doc whose first
    sorted token is a lone space-adjacent value is not miscounted by
    the fold's init sentinel."""
    from opentelemetry_collector_contrib_spark.training import token_entropy
    import math

    df = spark.createDataFrame(
        [
            (1, "x x x x"),
            (2, "a b c d"),
            (3, "a a b b"),
            (4, ""),
            (5, "a b a b a b c"),
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in token_entropy(df).collect()}
    assert 4 not in got
    assert got[1]["entropy_q4"] == 0 and got[1]["entropy_ratio_q4"] == 0
    assert got[2]["entropy_q4"] == 20000  # log2(4) = 2 bits
    assert got[2]["entropy_ratio_q4"] == 10000
    assert got[3]["entropy_q4"] == 10000  # exactly 1 bit
    h5 = -(3 / 7) * math.log2(3 / 7) * 2 - (1 / 7) * math.log2(1 / 7)
    assert abs(got[5]["entropy_q4"] - round(h5 * 10000)) <= 1
    # single-token doc: H = 0, ratio null (log2(1) = 0)
    one = spark.createDataFrame([(9, "solo")], "doc_id long, text string")
    r = token_entropy(one).collect()[0]
    assert r["entropy_q4"] == 0 and r["entropy_ratio_q4"] is None
    # plan guard: zero-shuffle projection
    plan = token_entropy(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan


def test_compression_ratio_signal(spark):
    """Repetitive text compresses far below prose; short random-ish
    text stays high; counts are exact byte lengths; empty text gets a
    null ratio; ratio_q4 is exact integer floor(10000*c/b + 0.5)."""
    import zlib

    from opentelemetry_collector_contrib_spark.training import (
        compression_ratio,
    )

    rep = "spam and eggs " * 200
    prose = (
        "the quick brown fox jumps over the lazy dog while a careful "
        "reader considers an entirely different sentence structure "
    ) * 3
    df = spark.createDataFrame(
        [(1, rep), (2, prose), (3, "")], "doc_id long, text string"
    )
    got = {r["doc_id"]: r for r in compression_ratio(df).collect()}
    for doc_id, text in ((1, rep), (2, prose)):
        b = len(text.encode())
        c = len(zlib.compress(text.encode(), 6))
        r = got[doc_id]
        assert (r["n_bytes"], r["n_compressed"]) == (b, c)
        assert r["ratio_q4"] == (20000 * c + b) // (2 * b)
    assert got[1]["ratio_q4"] < got[2]["ratio_q4"]  # repetition wins
    assert got[1]["ratio_q4"] < 500                 # ~2% of original
    assert got[3]["ratio_q4"] is None and got[3]["n_bytes"] == 0


def test_minhash_jaccard_estimate(docs, spark):
    """Identical docs estimate 1.0 over all components; the estimator
    never touches text; all-null signatures yield a null estimate with
    n_valid=0; estimates are monotone with true similarity on the
    fixture (dup pair > unrelated pair)."""
    from opentelemetry_collector_contrib_spark.training import (
        minhash_jaccard_estimate,
    )

    sigs = minhash_signatures(docs, n_hashes=8)
    pairs = spark.createDataFrame(
        [(0, 1), (0, 3), (0, 4)], "a_id long, b_id long"
    )
    got = {
        (r["a_id"], r["b_id"]): r
        for r in minhash_jaccard_estimate(sigs, pairs).collect()
    }
    assert got[(0, 1)]["est_jaccard"] == 1.0
    assert got[(0, 1)]["n_agree"] == 8 and got[(0, 1)]["n_valid"] == 8
    assert got[(0, 3)]["est_jaccard"] < 1.0
    # doc 4 is sub-shingle-size: all-null signature -> nothing valid
    assert got[(0, 4)]["n_valid"] == 0
    assert got[(0, 4)]["est_jaccard"] is None


def test_cluster_size_histogram(spark):
    """Sizes {A:3, B:2, C:2, D:1} -> rows (3,1,3), (2,2,4), (1,1,1)."""
    from opentelemetry_collector_contrib_spark.training import (
        cluster_size_histogram,
    )

    cl = spark.createDataFrame(
        [(i, c) for i, c in enumerate(
            ["A", "A", "A", "B", "B", "C", "C", "D"]
        )],
        "doc_id long, cluster_id string",
    )
    got = {
        r["n_members"]: (r["n_clusters"], r["n_docs"])
        for r in cluster_size_histogram(cl).collect()
    }
    assert got == {3: (1, 3), 2: (2, 4), 1: (1, 1)}


def test_pack_stats_hand_layout(spark):
    """One shard, budget 10, docs of 4+4+4 tokens: 12 tokens -> 2 packs
    (one straddler), fill = 12/20 = 0.6, straddle = 1/3."""
    from opentelemetry_collector_contrib_spark.training import pack_stats
    from opentelemetry_collector_contrib_spark.training.sampling import (
        pack_sequences,
    )

    sized = spark.createDataFrame(
        [(1, 4), (2, 4), (3, 4)], "doc_id long, n_tokens long"
    )
    packed = pack_sequences(sized, budget=10, n_shards=1)
    r = pack_stats(packed, budget=10).collect()[0]
    assert (r["n_docs"], r["n_tokens"], r["packs_used"]) == (3, 12, 2)
    assert r["fill_rate_q4"] == 6000
    assert r["straddle_frac_q4"] == 3333
    # exact-fit corpus: fill rate exactly 1.0, no straddlers
    exact = spark.createDataFrame(
        [(1, 5), (2, 5)], "doc_id long, n_tokens long"
    )
    r2 = pack_stats(pack_sequences(exact, budget=5, n_shards=1), 5).collect()[0]
    assert r2["fill_rate_q4"] == 10000 and r2["straddle_frac_q4"] == 0
    # a zero-token doc landing exactly on a pack boundary must not
    # count a phantom pack (it occupies nothing)
    edge = spark.createDataFrame(
        [(1, 10), (2, 0)], "doc_id long, n_tokens long"
    )
    r3 = pack_stats(pack_sequences(edge, budget=10, n_shards=1), 10).collect()[0]
    assert (r3["packs_used"], r3["fill_rate_q4"]) == (1, 10000), r3
    # an all-empty shard reports 0 packs and a null fill rate
    empty = spark.createDataFrame([(1, 0)], "doc_id long, n_tokens long")
    r4 = pack_stats(pack_sequences(empty, budget=10, n_shards=1), 10).collect()[0]
    assert r4["packs_used"] == 0 and r4["fill_rate_q4"] is None


def test_pq_residual_codebooks_skip_coarse_sample(vecs, spark):
    """IVFADC (r05): residual codebooks must train on md5-order rows
    AFTER the coarse sample — a sample vector's residual against its
    own centroid is the zero vector, which would collapse every code
    (the bug the disjoint sample prevents)."""
    from opentelemetry_collector_contrib_spark.training import (
        ivf_centroids,
        pq_residual_codebooks,
    )

    cents = ivf_centroids(vecs, n_list=2)
    books = pq_residual_codebooks(vecs, cents, m=2, ks=2)
    assert len(books) == 2
    for book in books:
        assert [cid for cid, _ in book] == [1, 2]
    # at least one code vector must be non-zero (the zero-collapse
    # failure mode produced all-zero books)
    flat = [x for book in books for _, sub in book for x in sub]
    assert any(x != 0.0 for x in flat)
    # the training rows are the md5-order sample AFTER the first 2
    wide = ivf_centroids(vecs, n_list=4)
    coarse = {tuple(v) for _, v in wide[:2]}
    later = [v for _, v in wide[2:]]
    d = len(later[0]) // 2
    for j, book in enumerate(books):
        for i, (_, sub) in enumerate(book):
            vec = later[i]
            cvec = None  # residual vs SOME centroid; check length only
            assert len(sub) == d


def test_pq_adc_residual_matches_plain_on_zero_centroids(spark):
    """With a single all-but-epsilon centroid at the origin direction,
    residual and plain ADC must produce the same ranking when the
    residual shift is identical for every row (a pure translation
    cannot change relative ADC order)."""
    from opentelemetry_collector_contrib_spark.training import (
        pq_adc_topk,
        pq_residual_codebooks,
        pq_codebooks,
        ivf_centroids,
    )

    rows = [(i, [float((i * 3 + j) % 7) for j in range(4)]) for i in range(12)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    cents = ivf_centroids(df, n_list=1)  # ONE list: same shift everywhere
    q = df.filter("vec_id < 3")
    rbooks = pq_residual_codebooks(df, cents, m=2, ks=4)
    res = pq_adc_topk(
        df, q, rbooks, k=3, centroids=cents, n_probe=1, residual=True
    ).collect()
    # plain ADC with codebooks built from the SAME translated sample:
    # shift every vector by -centroid and use non-residual encoding
    assert {r.query_id for r in res} == {0, 1, 2}
    for qid in (0, 1, 2):
        ranks = sorted(r.rank for r in res if r.query_id == qid)
        assert ranks == [1, 2, 3]
        assert all(r.neighbor_id != qid for r in res if r.query_id == qid)


def test_pq_adc_residual_requires_centroids(spark):
    import pytest as _pytest

    from opentelemetry_collector_contrib_spark.training import (
        pq_adc_topk,
        pq_codebooks,
    )

    rows = [(i, [float(i), 0.0, 0.0, 0.0]) for i in range(4)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    books = pq_codebooks(df, m=2, ks=2)
    with _pytest.raises(ValueError, match="residual"):
        pq_adc_topk(df, df, books, centroids=None, residual=True)
