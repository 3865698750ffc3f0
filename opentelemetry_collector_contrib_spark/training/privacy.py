"""PII scrubbing for document text — the C4-style cleanup stage.

Large-scale curation pipelines mask personal identifiers before
training (C4 dropped pages on a badwords list; modern pipelines mask
emails / IPs / phone numbers in place). This is a pure column-level
regex stage: zero shuffles, runs inside whole-stage codegen, scales
with the scan.

The patterns are deliberately written in the common subset of Java
regex (Spark) and RE2 (DuckDB) — character classes, bounded repeats,
non-capturing groups and ASCII ``\\b`` word boundaries only; no
lookarounds, no backreferences — so the oracle twin masks and counts
byte-identically. Counts are taken on the ORIGINAL text per pattern
(a mask for one pattern can never fabricate a match for another, but
defining counts pre-mask removes any ordering question). Null text
passes through as null with zero counts.

Reference parity: the collector's redaction processor
(processor/redactionprocessor/processor.go) masks attribute VALUES by
key/value policy; this is the analogous stage for document bodies in
the training extension surface (no collector equivalent).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# ordered: masks are applied in this sequence (same order in oracles)
PII_PATTERNS: tuple[tuple[str, str], ...] = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"),
    ("ipv4", r"\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b"),
)


def pii_scrub(
    df: DataFrame,
    text_col: str = "text",
    patterns: tuple[tuple[str, str], ...] = PII_PATTERNS,
    out_col: str = "scrubbed",
) -> DataFrame:
    """Mask every PII pattern occurrence in ``text_col`` and count
    matches per pattern: adds ``n_<name>`` (LONG, 0 for null text) per
    pattern and ``out_col`` with each match replaced by ``<NAME>``.

    All existing columns pass through. Plan shape: a single projection
    — no UDF, no shuffle, no action; at 100 TB this is scan-speed work
    that pipelines into whatever stage follows.
    """
    # explicit null guard, NOT coalesce(size(...)): size(NULL) is -1
    # with ANSI off (legacy sizeOfNull) and NULL with ANSI on — the
    # guard gives 0 under both session modes
    counts = [
        F.when(F.col(text_col).isNull(), F.lit(0))
        .otherwise(
            F.size(F.regexp_extract_all(F.col(text_col), F.lit(pat), F.lit(0)))
        )
        .cast("long")
        .alias(f"n_{name}")
        for name, pat in patterns
    ]
    scrubbed = F.col(text_col)
    for name, pat in patterns:
        scrubbed = F.regexp_replace(scrubbed, pat, f"<{name.upper()}>")
    return df.select("*", *counts, scrubbed.alias(out_col))
