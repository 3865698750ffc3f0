"""Training-data pipeline operators (extension beyond the reference).

Large-scale training corpora need dedup / similarity / text-quality /
multimodal plumbing alongside the log-pipeline semantics. Everything
here is expression-first (whole-stage codegen), with shuffles only
where the semantics demand a join or grouped aggregation, and each op
has a DuckDB-lockstep oracle (the ``*_SQL`` builders) so the driver's
correctness gate covers it.
"""

from .dedup import (
    exact_dedup,
    jaccard_verify_pairs,
    line_dedup,
    lsh_candidate_pairs,
    lsh_tuning_curve,
    passage_dedup_stats,
    minhash_signatures,
    ngram_jaccard_pairs,
    shingles,
    simhash,
    winnow_fingerprints,
    tokens,
)
from .multimodal import binary_table, extract_features
from .similarity import (
    brute_force_topk,
    cosine_pairs,
    cosine_pairs_bucketed,
    hyperplane_buckets,
    ivf_assign,
    ivf_centroids,
    ivf_refine,
    ann_recall,
    pq_adc_topk,
    pq_rerank_topk,
    pq_codebooks,
    pq_encode,
    rotate_vectors,
    rotation_masks,
    rotation_matrix,
    semdedup,
    ivf_topk,
    lsh_topk,
    make_planes,
)
from .textstats import (
    bpe_token_count,
    fingerprint,
    gopher_quality_filter,
    lang_id,
    quality_score,
    repetition_stats,
    c4_line_filter,
    lm_score,
    tfidf_topk,
    token_stats,
)

from .chunking import chunk_documents, vocab_topk  # noqa: F401
from .classify import hashed_logit_score, pseudo_weights_q4  # noqa: F401
from .curation import curate, domain_quota, topk_per_key  # noqa: F401
from .sampling import (  # noqa: F401
    dsir_sample,
    mixture_temperature,
    pack_sequences,
    source_kl_divergence,
    stratified_sample,
)
from .privacy import PII_PATTERNS, pii_scrub  # noqa: F401
from .sketches import (  # noqa: F401
    bloom_build,
    bloom_probe,
    cms_build,
    cms_estimate,
    corpus_distinct_hll,
    hist_quantile_sketch,
    hll_estimate,
    hll_registers,
)

__all__ = [
    "binary_table",
    "bpe_token_count",
    "brute_force_topk",
    "cosine_pairs",
    "cosine_pairs_bucketed",
    "lsh_topk",
    "exact_dedup",
    "jaccard_verify_pairs",
    "line_dedup",
    "extract_features",
    "fingerprint",
    "hyperplane_buckets",
    "ivf_assign",
    "ivf_centroids",
    "ivf_refine",
    "ann_recall",
    "pq_adc_topk",
    "pq_rerank_topk",
    "rotate_vectors",
    "rotation_masks",
    "rotation_matrix",
    "pq_codebooks",
    "pq_encode",
    "semdedup",
    "ivf_topk",
    "lang_id",
    "lsh_candidate_pairs",
    "lsh_tuning_curve",
    "make_planes",
    "minhash_signatures",
    "ngram_jaccard_pairs",
    "passage_dedup_stats",
    "quality_score",
    "repetition_stats",
    "gopher_quality_filter",
    "shingles",
    "simhash",
    "winnow_fingerprints",
    "c4_line_filter",
    "lm_score",
    "tfidf_topk",
    "token_stats",
    "tokens",
    "curate",
    "domain_quota",
    "hashed_logit_score",
    "pseudo_weights_q4",
    "source_kl_divergence",
    "dsir_sample",
    "mixture_temperature",
    "chunk_documents",
    "vocab_topk",
    "pack_sequences",
    "topk_per_key",
    "stratified_sample",
    "bloom_build",
    "bloom_probe",
    "cms_build",
    "cms_estimate",
    "corpus_distinct_hll",
    "hist_quantile_sketch",
    "pii_scrub",
    "PII_PATTERNS",
    "hll_estimate",
    "hll_registers",
]
