"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship parse -> enrich -> route -> aggregate
pipeline (SURVEY.md 7.2). ``queries()`` exposes one entry per
implemented operator family from SURVEY.md section 2 plus the
training-data ops; ``oracle_sql()`` carries the DuckDB-lockstep SQL for
each (tables ``events documents embeddings`` are driver-registered
views; transcripts derive from ``events`` via the shared CTE in
``opentelemetry_collector_contrib_spark.data.transcripts`` so Spark and DuckDB compute from
identical inputs).

Ops with no SQL-expressible twin (xxhash64 sampling, mapInPandas
multimodal decode) appear in ``queries()`` only -> rows-only check.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from opentelemetry_collector_contrib_spark.connectors import (
    ExceptionsConnector,
    Route,
    RoutingConnector,
    ServiceGraphConnector,
    SpanMetricsConnector,
)
from opentelemetry_collector_contrib_spark.data import derive_transcripts
from opentelemetry_collector_contrib_spark.data.transcripts import (
    ROLE_GROUPS_ORACLE_CTE,
    TOOL_CATALOG_ORACLE_CTE,
    TRANSCRIPTS_ORACLE_CTE,
)
from opentelemetry_collector_contrib_spark.operators import (
    CsvParser,
    JsonParser,
    ContainerParser,
    KeyValueParser,
    Recombine,
    SyslogParser,
    UriParser,
)
from opentelemetry_collector_contrib_spark.processors.groupbyattrs import GroupByAttrs
from opentelemetry_collector_contrib_spark.processors.redaction import Redaction
from opentelemetry_collector_contrib_spark.pipeline import (
    ROUTES,
    TranscriptPipeline,
    run_flagship,
)
from opentelemetry_collector_contrib_spark.processors import (
    Action,
    AttributesProcessor,
    CumulativeToDelta,
    DeltaToCumulative,
    DeltaToRate,
    FilterProcessor,
    GenerationRule,
    IntervalProcessor,
    MetricOp,
    MetricTransform,
    MetricsGeneration,
    MetricsTransform,
    ProbabilisticSampler,
    SpanProcessor,
    TailPolicy,
    TailSampling,
)
from opentelemetry_collector_contrib_spark.processors import GroupByTrace as GroupByTraceProc
from opentelemetry_collector_contrib_spark.functions import compile_statement
from opentelemetry_collector_contrib_spark.training import (
    binary_table,
    tokens,
    brute_force_topk,
    cosine_pairs,
    cosine_pairs_bucketed,
    lsh_topk,
    exact_dedup,
    extract_features,
    fingerprint,
    hyperplane_buckets,
    ivf_assign,
    ivf_centroids,
    ivf_refine,
    ivf_topk,
    pq_adc_topk,
    pq_codebooks,
    pq_residual_codebooks,
    pq_encode,
    rotate_vectors,
    rotation_masks as _rotation_masks,
    semdedup,
    jaccard_verify_pairs,
    lang_id,
    lsh_candidate_pairs,
    make_planes,
    minhash_signatures,
    ngram_jaccard_pairs,
    quality_score,
    simhash,
    tfidf_topk,
    token_stats,
)

# ---------------------------------------------------------------------------
# shared loaders

def _transcripts(spark: SparkSession, sf_dir: str) -> DataFrame:
    return derive_transcripts(spark.read.parquet(f"{sf_dir}/events.parquet"))


def _spread(df: DataFrame) -> DataFrame:
    """Small single-file inputs arrive as ONE split, serializing every
    downstream projection on one task. At real scale
    `spark.sql.files.maxPartitionBytes` splits the scan; for the tiny
    bench files we repartition explicitly so the heavy per-doc work
    (minhash/simhash/cosine) uses the whole cluster."""
    parallelism = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < max(parallelism // 2, 2):
        return df.repartition(parallelism)
    return df


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _spread(spark.read.parquet(f"{sf_dir}/documents.parquet"))


def _emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _spread(spark.read.parquet(f"{sf_dir}/embeddings.parquet"))


def _pipe() -> TranscriptPipeline:
    return TranscriptPipeline()


# ---------------------------------------------------------------------------
# oracle SQL builders (DuckDB dialect, lockstep with the Spark ops)

_PAT = r"^at=(\S+) ([A-Z]+) \[(\w+)\] evt=(\w+) code=(\d+) dur_ms=(\d+) k=(\d+)$"
_GROUPS = ["at", "level", "tool_name", "evt", "code", "dur_ms", "k"]

_PARSE_COLS = ",\n    ".join(
    f"CASE WHEN regexp_matches(text, '{_PAT}') THEN regexp_extract(text, '{_PAT}', {i+1}) END AS {g}"
    for i, g in enumerate(_GROUPS)
)

_SEV_NUM = (
    "CASE lower(level) WHEN 'fatal' THEN 21 WHEN 'error' THEN 17 "
    "WHEN 'warn' THEN 13 WHEN 'info' THEN 9 WHEN 'debug' THEN 5 ELSE 0 END"
)

_BASE_CTES = f"""WITH {TRANSCRIPTS_ORACLE_CTE.strip()},
{TOOL_CATALOG_ORACLE_CTE.strip()},
{ROLE_GROUPS_ORACLE_CTE.strip()},
parsed AS (
  SELECT t.*,
    {_PARSE_COLS}
  FROM transcripts t
),
enriched AS (
  SELECT p.*, c.tool_category, c.risk_level, g.role_group,
         {_SEV_NUM} AS severity_number
  FROM parsed p
  LEFT JOIN tool_catalog c USING (tool)
  LEFT JOIN role_groups g USING (role)
),
routed AS (
  SELECT *,
    CASE WHEN level IN ('ERROR','FATAL') THEN 'sink_errors'
         WHEN tool_category = 'exec' THEN 'sink_exec'
         ELSE 'sink_default' END AS route
  FROM enriched
)"""

# DuckDB-lockstep text primitives (match training.dedup/textstats)
_TOKS = "list_filter(string_split(text, ' '), t -> t != '')"
_SH3 = (
    f"list_transform(range(0, greatest(len({_TOKS})-2, 0)), "
    f"i -> array_to_string(list_slice({_TOKS}, i+1, i+3), ' '))"
)
_STOP = "['the','a','an','and','of','to','in','is','it']"

# Gopher repetition-stats lockstep (training/textstats.py
# repetition_stats): whitespace-CLASS tokens, \n lines, 2-/5-gram
# duplicate mass via per-doc GROUP BYs (the Spark side computes the
# same counts with a single sorted-array scan per row). Struct max =
# (cnt, gram) lexicographic — identical tie-break to the Spark scan's
# >= update rule over the ascending-sorted gram array.
_WTOKS = "list_filter(string_split_regex(text, '[ \\t\\r\\n]+'), t -> t != '')"
_REPSTATS_SQL = f"""WITH base AS (
  SELECT doc_id, text, {_WTOKS} AS toks,
         list_filter(string_split(text, chr(10)), l -> l != '') AS lines
  FROM documents
), sh AS (
  SELECT doc_id, text, toks, lines,
    CASE WHEN len(toks) >= 2 THEN list_transform(range(0, len(toks)-1),
         i -> toks[i+1] || ' ' || toks[i+2]) ELSE [] END AS g2,
    CASE WHEN len(toks) >= 5 THEN list_transform(range(0, len(toks)-4),
         i -> toks[i+1] || ' ' || toks[i+2] || ' ' || toks[i+3] || ' '
              || toks[i+4] || ' ' || toks[i+5]) ELSE [] END AS g5
  FROM base
), g2c AS (
  SELECT doc_id, gram, count(*)::BIGINT AS cnt
  FROM (SELECT doc_id, unnest(g2) AS gram FROM sh) GROUP BY 1, 2
), top2 AS (
  SELECT doc_id, max(struct_pack(cnt := cnt, gram := gram)) AS m
  FROM g2c GROUP BY 1
), g5c AS (
  SELECT doc_id, gram, count(*)::BIGINT AS cnt
  FROM (SELECT doc_id, unnest(g5) AS gram FROM sh) GROUP BY 1, 2
), dup5 AS (
  SELECT doc_id, sum(CASE WHEN cnt > 1 THEN cnt ELSE 0 END)::BIGINT AS dup
  FROM g5c GROUP BY 1
), scalars AS (
  SELECT s.doc_id,
    len(s.toks)::INT AS n_words,
    len(s.lines)::INT AS n_lines,
    CASE WHEN len(s.toks) = 0 THEN 0::BIGINT ELSE
      list_reduce(list_transform(s.toks, t -> len(t)::BIGINT), (a,b) -> a+b)
    END AS tok_chars,
    CASE WHEN len(s.lines) = 0 THEN 0::BIGINT ELSE
      list_reduce(list_transform(s.lines, l -> len(l)::BIGINT), (a,b) -> a+b)
    END AS line_chars,
    CASE WHEN len(s.lines) = 0 THEN 0::BIGINT ELSE
      list_reduce(list_transform(list_distinct(s.lines), l -> len(l)::BIGINT),
                  (a,b) -> a+b)
    END AS dline_chars,
    len(list_distinct(s.lines))::INT AS n_dlines,
    coalesce(t.m.cnt, 0) * (len(coalesce(t.m.gram, ' ')) - 1) AS top_mass,
    coalesce(d.dup, 0) AS dup5_occ,
    len(s.g5)::INT AS n_g5,
    (len(s.text) - len(replace(s.text, '#', '')))
      + (len(s.text) - len(replace(s.text, '...', '')))::DOUBLE / 3
      + (len(s.text) - len(replace(s.text, '…', ''))) AS symbols,
    len(list_filter(s.lines, l -> starts_with(l, '-') OR starts_with(l, '*')
                                   OR starts_with(l, '•')))::INT AS bullet_lines,
    len(list_filter(s.lines, l -> ends_with(l, '...')
                                   OR ends_with(l, '…')))::INT AS ellipsis_lines,
    len(list_filter(s.toks, t -> regexp_matches(t, '[A-Za-z]')))::INT AS alpha_words
  FROM sh s LEFT JOIN top2 t USING (doc_id) LEFT JOIN dup5 d USING (doc_id)
)
SELECT doc_id, n_words, n_lines,
  CASE WHEN n_lines > 0 THEN floor((n_lines - n_dlines)::DOUBLE / n_lines
       * 10000 + 0.5)::BIGINT ELSE 0 END AS dup_line_frac_q4,
  CASE WHEN line_chars > 0 THEN floor((line_chars - dline_chars)::DOUBLE
       / line_chars * 10000 + 0.5)::BIGINT ELSE 0 END AS dup_line_char_frac_q4,
  CASE WHEN tok_chars > 0 THEN floor(top_mass::DOUBLE / tok_chars
       * 10000 + 0.5)::BIGINT ELSE 0 END AS top2gram_frac_q4,
  CASE WHEN n_g5 > 0 THEN floor(dup5_occ::DOUBLE / n_g5
       * 10000 + 0.5)::BIGINT ELSE 0 END AS dup5gram_frac_q4,
  CASE WHEN n_words > 0 THEN floor(symbols / n_words
       * 10000 + 0.5)::BIGINT ELSE 0 END AS symbol_word_ratio_q4,
  CASE WHEN n_lines > 0 THEN floor(bullet_lines::DOUBLE / n_lines
       * 10000 + 0.5)::BIGINT ELSE 0 END AS bullet_line_frac_q4,
  CASE WHEN n_lines > 0 THEN floor(ellipsis_lines::DOUBLE / n_lines
       * 10000 + 0.5)::BIGINT ELSE 0 END AS ellipsis_line_frac_q4,
  CASE WHEN n_words > 0 THEN floor(alpha_words::DOUBLE / n_words
       * 10000 + 0.5)::BIGINT ELSE 0 END AS alpha_word_frac_q4,
  CASE WHEN n_words > 0 THEN floor(tok_chars::DOUBLE / n_words
       * 10000 + 0.5)::BIGINT ELSE 0 END AS mean_word_len_q4
FROM scalars"""

_MINHASH_N, _BANDS, _ROWS = 8, 4, 2
# Skew guard for the banded-LSH headline queries: buckets larger than
# this are degenerate content (boilerplate/empty docs sharing a band
# hash) and are dropped BEFORE the quadratic in-bucket pair expansion —
# the same cap the cosine-bucket twin uses. Mirrored in the DuckDB
# oracles via QUALIFY count(*) OVER (PARTITION BY band, bh).
_LSH_MAX_BUCKET = 200
_MINHASH_P = 1_000_000_007
# 60-bit int from the first 15 hex chars of md5(shingle), mod p —
# portable nibble-parse (DuckDB has no hex->int cast)
_H15 = "(" + "+".join(
    f"(ascii(substring(md5(s),{i},1)) - CASE WHEN ascii(substring(md5(s),{i},1)) >= 97 THEN 87 ELSE 48 END)::BIGINT * {16 ** (15 - i)}"
    for i in range(1, 16)
) + f") % {_MINHASH_P}"


def _hex15_of(expr: str) -> str:
    """DuckDB twin of training.sketches._hex15 over an arbitrary SQL
    expression: first 15 hex chars of md5(expr) nibble-parsed to a
    60-bit non-negative BIGINT (DuckDB has no hex->int cast)."""
    h = f"md5({expr})"
    return "(" + "+".join(
        f"(ascii(substring({h},{i},1)) - CASE WHEN ascii(substring({h},{i},1)) >= 97 THEN 87 ELSE 48 END)::BIGINT * {16 ** (15 - i)}"
        for i in range(1, 16)
    ) + ")"


# sketch-family constants — lockstep with training/sketches.py defaults
_BLOOM_K, _BLOOM_M = 4, 4096
_CMS_D, _CMS_W = 4, 1024
_HLL_M, _HLL_REST_BITS, _HLL_ALPHA = 64, 54, 0.709
# the SAME Python float on both sides: Spark embeds it via F.lit in
# hll_estimate, the oracle embeds repr() (round-trips exactly)
_HLL_NUMER = _HLL_ALPHA * _HLL_M * _HLL_M * float(2**60)


def _bloom_arg(j: int) -> str:
    return f"'bloom{j}:' || text"


def _cms_arg(j: int) -> str:
    return f"'cms{j}:' || tok"


def _minhash_params(n: int) -> list[tuple[int, int]]:
    return [
        ((j * 2 + 1) * 40503 % _MINHASH_P, (j * 7919 + 13) % _MINHASH_P)
        for j in range(n)
    ]


_SIG = "[" + ",".join(
    f"list_min(list_transform({_SH3}, s -> ({a} * ({_H15}) + {b}) % {_MINHASH_P}))"
    for a, b in _minhash_params(_MINHASH_N)
) + "]"

_HEXVAL = "+".join(
    f"(ascii(substring(md5(tok),{i},1)) - CASE WHEN ascii(substring(md5(tok),{i},1)) >= 97 THEN 87 ELSE 48 END)::BIGINT * {16 ** (8 - i)}"
    for i in range(1, 9)
)
_BITSUMS = ",".join(
    f"sum(CASE WHEN (hv // {1 << j}) % 2 = 1 THEN 1 ELSE -1 END) AS s{j}"
    for j in range(32)
)
_SIMH = "+".join(f"(CASE WHEN s{j} > 0 THEN {1 << j} ELSE 0 END)" for j in range(32))

def _dot_sql(a: str, b: str) -> str:
    """Generic left-fold dot product over DOUBLE-cast lists (same
    evaluation order as training.similarity._dot — identical bits)."""
    return (
        f"list_reduce(list_transform(list_zip({a}::DOUBLE[], {b}::DOUBLE[]),"
        " z -> z[1]*z[2]), (x,y) -> x+y)"
    )


def _nrm_sql(a: str) -> str:
    return (
        f"sqrt(list_reduce(list_transform({a}::DOUBLE[], x -> x*x),"
        " (p,q) -> p+q))"
    )


# table-alias shorthands over the ONE fold builder pair above — the
# evaluation-order contract that keeps Spark/DuckDB bit-identical must
# exist in exactly one place (r05 review finding)
_DOT_AB = _dot_sql("a.embedding", "b.embedding")


def _nrm(t: str) -> str:
    return _nrm_sql(f"{t}.embedding")


def _l2_sql(a: str, b: str) -> str:
    """DuckDB twin of training.similarity._l2sq: squared L2 distance as
    the same 0.0-seeded left fold (list_reduce's implicit first-element
    seed equals 0.0 + t1 in IEEE), bit-identical."""
    return (
        f"list_reduce(list_transform(list_zip({a}::DOUBLE[], {b}::DOUBLE[]),"
        " z -> (z[1]-z[2])*(z[1]-z[2])), (x,y) -> x+y)"
    )


# IVF coarse quantizer, the DuckDB twin of training.similarity
# .ivf_centroids: the 16 vectors that sort first by md5(id) become
# centroids 1..16 (same deterministic sample both engines).
_IVF_CENT = (
    "cent AS (SELECT row_number() OVER (ORDER BY md5(vec_id::VARCHAR), vec_id)"
    " AS centroid_id, embedding AS cemb FROM embeddings"
    " QUALIFY centroid_id <= 16)"
)
# ranking key is dot/||centroid|| — the row norm is a common positive
# factor across centroids so it cannot change the per-row order, and
# the Spark side (training.similarity._centroid_ranking) ranks by the
# SAME expression, keeping order and ties bit-identical
_IVF_COS_EC = (
    f"({_dot_sql('e.embedding', 'c.cemb')} / {_nrm_sql('c.cemb')})"
)


_PLANES = make_planes(8, 64)


def _md5_hash60_sql(expr: str) -> str:
    """DuckDB twin of conv(substring(md5(expr),1,15),16,10): the full
    60-bit hash (no bucket mod) — the shuffle_order rank key. One
    builder: delegates to ``_hex15_of`` so the bit-exactness-critical
    nibble arithmetic exists in exactly one place."""
    return _hex15_of(expr)


def _md5_bucket_sql(expr: str, seed: int = 22) -> str:
    """DuckDB twin of processors.sampler._bucket (md5 mode): first 15
    hex chars of md5('<seed>:' || expr) nibble-parsed to a 60-bit int,
    mod 10000 — bit-exact with Spark's conv(substring(md5(..),1,15),16,10)."""
    h = f"md5('{seed}:' || {expr})"
    return "(" + "+".join(
        f"(ascii(substring({h},{i},1)) - CASE WHEN ascii(substring({h},{i},1)) >= 97 THEN 87 ELSE 48 END)::BIGINT * {16 ** (15 - i)}"
        for i in range(1, 16)
    ) + ") % 10000"


def _fnv_bucket_sql(expr: str, seed: int = 22) -> str:
    """DuckDB twin of processors.sampler._fnv_bucket — the reference's
    EXACT FNV-1a (fnvhasher.go): seed's 4 LE bytes folded driver-side,
    data bytes folded via list_reduce over the hex-pair expansion,
    masked to the 14-bit bucket (sampler_mode.go:311-312)."""
    h0 = 2166136261
    for b in seed.to_bytes(4, "little"):
        h0 = ((h0 ^ b) * 16777619) & 0xFFFFFFFF
    hx = f"hex(encode({expr}))"

    def nib(pos: str) -> str:
        a = f"ascii(substring({hx}, {pos}, 1))"
        return f"({a} - CASE WHEN {a} >= 65 THEN 55 ELSE 48 END)::BIGINT"

    byte = f"({nib('i*2+1')} * 16 + {nib('i*2+2')})"
    return (
        f"(list_reduce(list_prepend({h0}::BIGINT, "
        f"list_transform(range(0, octet_length(encode({expr}))), i -> {byte})), "
        f"(acc, x) -> (xor(acc, x) * 16777619) % 4294967296) % 16384)"
    )


def _plane_dot(p: int) -> str:
    lit = "[" + ",".join(repr(v) for v in _PLANES[p]) + "]"
    return (
        f"list_reduce(list_transform(list_zip(embedding::DOUBLE[], {lit}::DOUBLE[]),"
        " z -> z[1]*z[2]), (x,y) -> x+y)"
    )


# 4-plane LSH bucket key (shared by the ann_lsh_topk / bucketed-cosine
# oracles; planes 0..3 of make_planes are prefix-stable for any n_planes)
_BUCKET4 = " || ".join(
    f"(CASE WHEN {_plane_dot(p)} >= 0 THEN '1' ELSE '0' END)" for p in range(4)
)


# ---------------------------------------------------------------------------
# queries


def entry(spark: SparkSession) -> DataFrame:
    """Flagship DAG over sf0.001: per-sink aggregate counts."""
    return run_flagship(spark, "/root/testdata/sf0.001")


def _q_flagship(spark, sf_dir):
    return run_flagship(spark, sf_dir)


def _q_transcripts(spark, sf_dir):
    return _transcripts(spark, sf_dir)


def _q_parse_regex(spark, sf_dir):
    parsed = _pipe().parse(_transcripts(spark, sf_dir))
    return parsed.select("conv_id", "turn_idx", *_GROUPS)


def _q_parse_time_severity(spark, sf_dir):
    parsed = _pipe().parse(_transcripts(spark, sf_dir))
    return parsed.select(
        "conv_id", "turn_idx", "event_ts", "severity_number", "severity_text"
    )


def _q_enrich(spark, sf_dir):
    df = _pipe().enrich(_pipe().parse(_transcripts(spark, sf_dir)))
    return df.select(
        "conv_id", "turn_idx", "tool", "tool_category", "risk_level", "role_group"
    )


def _q_enrich_geoip(spark, sf_dir):
    """CIDR range-join enrich (geoip posture,
    processor/geoipprocessor/geoip_processor.go:83-135): events gain a
    deterministic synthetic IPv4, the nation table becomes a /16 prefix
    dimension; broadcast bucket equi-join + range residual, no
    BroadcastNestedLoopJoin, fact side never shuffles."""
    from opentelemetry_collector_contrib_spark.processors import CidrEnrich

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    fact = ev.select(
        "event_id",
        F.concat_ws(
            ".",
            F.lit("10"),
            (F.col("event_id") % 40).cast("string"),
            ((F.col("event_id") * 7) % 256).cast("string"),
            ((F.col("event_id") * 13) % 256).cast("string"),
        ).alias("ip"),
    )
    nation = spark.read.parquet(f"{sf_dir}/nation.parquet")
    dim = nation.select(
        F.concat(
            F.lit("10."), F.col("n_nationkey").cast("string"), F.lit(".0.0/16")
        ).alias("cidr"),
        F.col("n_name").alias("name"),
        F.col("n_regionkey").alias("regionkey"),
    )
    out = CidrEnrich(dim, ip_col="ip", prefix="geo_")(fact)
    return out.select(
        "event_id",
        "ip",
        "geo_name",
        F.coalesce("geo_regionkey", F.lit(-1)).alias("geo_regionkey"),
    )


def _q_route_once(spark, sf_dir):
    routed, _ = _pipe()(_transcripts(spark, sf_dir))
    return routed.select("conv_id", "turn_idx", "route")


def _q_route_multi(spark, sf_dir):
    p = TranscriptPipeline(match_once=False)
    rc = RoutingConnector(ROUTES, default_sinks=["sink_default"], match_once=False)
    df = p.enrich(p.parse(_transcripts(spark, sf_dir)))
    return rc(df).select("conv_id", "turn_idx", "route")


def _q_counts(spark, sf_dir):
    _, counts = _pipe()(_transcripts(spark, sf_dir))
    return counts.select(
        "metric_name",
        F.element_at("attrs", "route").alias("route"),
        F.element_at("attrs", "role").alias("role"),
        "count",
    )


def _q_recombine(spark, sf_dir):
    out = Recombine()(_transcripts(spark, sf_dir))
    return out.select("conv_id", "turn_idx", "role", "text", "tool", "ts")


def _q_recombine_sessions(spark, sf_dir):
    out = Recombine(is_first_entry="turn_idx % 5 = 0")(_transcripts(spark, sf_dir))
    return out.select("conv_id", "turn_idx", "text")


def _q_filter(spark, sf_dir):
    fp = FilterProcessor(conditions=["role = 'system'", "tool = 'none'"])
    return fp(_transcripts(spark, sf_dir)).select("conv_id", "turn_idx", "role", "tool")


def _q_attributes(spark, sf_dir):
    parsed = _pipe().parse(_transcripts(spark, sf_dir))
    proc = AttributesProcessor(
        actions=[
            Action("upsert", key="env", value="prod"),
            Action("insert", key="k", value="0"),
            Action("convert", key="dur_ms", converted_type="int"),
            Action("extract", key="at", pattern=r"(?P<day_part>\d{4}-\d{2}-\d{2})"),
        ]
    )
    return proc(parsed).select("conv_id", "turn_idx", "env", "k", "dur_ms", "day_part")


def _q_ottl(spark, sf_dir):
    df = _transcripts(spark, sf_dir)
    for stmt in [
        'set(flag, "hot") where Len(text) > 80',
        'set(role, ConvertCase(role, "upper"))',
        'replace_pattern(text, "code=\\\\d+", "code=*")',
    ]:
        df = compile_statement(stmt)(df)
    return df.select("conv_id", "turn_idx", "role", "flag", "text")


def _q_parse_json(spark, sf_dir):
    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    parsed = JsonParser(parse_from="props", parse_to=None)(events)
    return parsed.select(
        "event_id", F.element_at("parsed", "k").alias("k_prop")
    )


def _q_parse_kv(spark, sf_dir):
    df = _transcripts(spark, sf_dir)
    parsed = KeyValueParser(
        parse_from="text", parse_to=None, keys=["evt", "code", "dur_ms", "k"]
    )(df)
    return parsed.select("conv_id", "turn_idx", "evt", "code", "dur_ms", "k")


def _q_parse_kv_reference(spark, sf_dir):
    # the exact SplitString/ParseKeyValuePairs state machine
    # (KeyValueParser mode='reference') over a quoted kv line CONSTRUCTED
    # from transcript columns — quoted values with embedded spaces
    # exercise the quote-respecting split; the oracle reconstructs the
    # expected fields directly from the source columns (same results,
    # independent derivation)
    df = _transcripts(spark, sf_dir)
    line = F.concat(
        F.lit('role="'), F.col("role"), F.lit(' turn" tool='), F.col("tool"),
        F.lit(" idx="), F.col("turn_idx").cast("string"),
    )
    parsed = KeyValueParser(mode="reference", parse_from="kvline", parse_to=None,
                            keys=["role", "tool", "idx"])(
        df.withColumn("kvline", line).select("conv_id", "turn_idx", "kvline")
    )
    return parsed.select(
        "conv_id", "turn_idx",
        F.col("role").alias("kv_role"),
        F.col("tool").alias("kv_tool"),
        F.col("idx").alias("kv_idx"),
    )


def _q_parse_csv(spark, sf_dir):
    df = _transcripts(spark, sf_dir).withColumn(
        "line", F.concat_ws(",", "role", "tool", "conv_id")
    )
    parsed = CsvParser(
        header=["role2", "tool2", "conv2"], parse_from="line", parse_to=None
    )(df)
    return parsed.select("conv_id", "turn_idx", "role2", "tool2", "conv2")


def _q_parse_uri(spark, sf_dir):
    df = _transcripts(spark, sf_dir).withColumn(
        "uri",
        F.concat(
            F.lit("https://"), F.col("tool"), F.lit(".example.com/"),
            F.col("role"), F.lit("?turn="), F.col("turn_idx").cast("string"),
        ),
    )
    parsed = UriParser(parse_from="uri")(df)
    return parsed.select(
        "conv_id", "turn_idx", "scheme", "host", "path", "query"
    )


def _q_redaction(spark, sf_dir):
    df = _transcripts(spark, sf_dir).withColumn(
        "attributes",
        F.map_from_arrays(
            F.array(F.lit("role"), F.lit("tool"), F.lit("secret")),
            F.array(F.col("role"), F.col("tool"), F.lit("hunter2")),
        ),
    )
    red = Redaction(
        allowed_keys=["role", "tool"],
        blocked_value_patterns=["^bash$", "^http$"],
        summary="debug",
    )(df)
    return red.select(
        "conv_id",
        "turn_idx",
        F.element_at("attributes", "role").alias("role_attr"),
        F.element_at("attributes", "tool").alias("tool_attr"),
        F.element_at("attributes", "redaction.redacted.keys").alias("redacted_keys"),
        F.element_at("attributes", "redaction.masked.count").alias("masked_count"),
    )


def _q_parse_syslog(spark, sf_dir):
    df = _transcripts(spark, sf_dir).withColumn(
        "line",
        F.concat(
            F.lit("<"), (F.lit(8) + F.col("turn_idx") % 8).cast("string"),
            F.lit(">1 "), F.date_format("ts", "yyyy-MM-dd'T'HH:mm:ss"),
            F.lit(" h-"), F.col("conv_id"), F.lit(" "), F.col("tool"),
            F.lit(" "), F.col("turn_idx").cast("string"), F.lit(" - - "),
            F.col("text"),
        ),
    )
    parsed = SyslogParser(protocol="rfc5424", parse_from="line")(df)
    return parsed.select(
        "conv_id", "turn_idx", "priority", "facility", "severity_number",
        "version", "event_ts", "hostname", "appname", "proc_id", "msg_id",
        "structured_data", "message",
    )


def _q_spanmetrics(spark, sf_dir):
    parsed = _pipe().enrich(_pipe().parse(_transcripts(spark, sf_dir)))
    sm = SpanMetricsConnector(
        duration_col="dur_ms",
        dimensions=["tool_category"],
        buckets=[100, 500, 1000, 2500],
    )
    return sm(parsed)


def _q_spanmetrics_calls(spark, sf_dir):
    # calls metric: namespace prefix + configured dims with a default
    # (reserved key dims absent from this frame are skipped)
    parsed = _pipe().enrich(_pipe().parse(_transcripts(spark, sf_dir)))
    sm = SpanMetricsConnector(
        duration_col="dur_ms",
        dimensions=["tool_category", "missing_dim"],
        dimension_defaults={"missing_dim": "none"},
        namespace="traces.span.metrics",
    )
    return sm.calls(parsed)


def _q_parse_container(spark, sf_dir):
    ts_str = F.date_format("ts", "yyyy-MM-dd'T'HH:mm:ss")
    docker = F.concat(
        F.lit('{"log": "'), F.col("text"), F.lit('", "stream": "stdout", "time": "'),
        ts_str, F.lit('"}'),
    )
    cri = F.concat(
        ts_str, F.lit(" stderr "),
        F.when(F.col("turn_idx") % 3 == 0, "P").otherwise("F"),
        F.lit(" "), F.col("text"),
    )
    df = _transcripts(spark, sf_dir).withColumn(
        "body", F.when(F.col("turn_idx") % 2 == 0, docker).otherwise(cri)
    )
    parsed = ContainerParser()(df)
    return parsed.select(
        "conv_id", "turn_idx", "log", "stream", "event_ts", "partial"
    )


def _q_servicegraph(spark, sf_dir):
    sg = ServiceGraphConnector(
        client_condition="role = 'user'",
        server_condition="role = 'tool'",
    )
    out = sg(_transcripts(spark, sf_dir))
    return out.select(
        "client", "server", "request_count",
        F.round("latency_sum_s", 6).alias("latency_sum_s"),
    )


def _q_servicegraph_hist(spark, sf_dir):
    sg = ServiceGraphConnector(
        client_condition="role = 'user'",
        server_condition="role = 'tool'",
        latency_buckets_s=[600, 7200, 86400],
    )
    return sg(_transcripts(spark, sf_dir))


def _span_frame(spark, sf_dir):
    """Deterministic span frame from transcripts for the exceptions
    connector: each turn is a span; turns with turn_idx % 7 == 3 carry
    an ``exception`` event (type/message/stacktrace in event attrs),
    turns with turn_idx % 13 == 5 a non-exception ``checkpoint`` event,
    and tool='none' spans have no service name (the connector skips
    them, connector_metrics.go:78-82)."""
    t = _transcripts(spark, sf_dir)
    exc_event = F.struct(
        F.lit("exception").alias("name"),
        F.col("ts").alias("ts"),
        F.map_from_arrays(
            F.array(
                F.lit("exception.type"),
                F.lit("exception.message"),
                F.lit("exception.stacktrace"),
            ),
            F.array(
                F.concat(F.lit("E"), (F.col("turn_idx") % 3).cast("string")),
                F.concat(F.lit("boom "), F.col("role")),
                F.concat(F.lit("st:"), F.col("conv_id")),
            ),
        ).alias("attributes"),
    )
    chk_event = F.struct(
        F.lit("checkpoint").alias("name"),
        F.col("ts").alias("ts"),
        F.map_from_arrays(F.array(F.lit("k")), F.array(F.lit("v"))).alias(
            "attributes"
        ),
    )
    return t.select(
        F.col("conv_id").alias("trace_id"),
        F.concat(
            F.col("conv_id"), F.lit("#"), F.col("turn_idx").cast("string")
        ).alias("span_id"),
        F.when(
            F.col("tool") != "none", F.concat(F.lit("svc-"), F.col("tool"))
        ).alias("service_name"),
        F.concat(F.lit("turn-"), F.col("role")).alias("span_name"),
        F.when(F.col("role") == "user", "SPAN_KIND_CLIENT")
        .when(F.col("role") == "tool", "SPAN_KIND_SERVER")
        .otherwise("SPAN_KIND_INTERNAL")
        .alias("span_kind"),
        F.when(F.col("turn_idx") % 5 == 0, "STATUS_CODE_ERROR")
        .otherwise("STATUS_CODE_OK")
        .alias("status_code"),
        F.map_from_arrays(
            F.array(F.lit("turn")), F.array(F.col("turn_idx").cast("string"))
        ).alias("attributes"),
        F.array_compact(
            F.array(
                F.when(F.col("turn_idx") % 7 == 3, exc_event),
                F.when(F.col("turn_idx") % 13 == 5, chk_event),
            )
        ).alias("events"),
    )


def _q_filter_spans(spark, sf_dir):
    # traces-signal filter (processor/filterprocessor/traces.go): span
    # attribute exclude matcher + OTTL-shaped condition cascade over the
    # deterministic span frame
    from opentelemetry_collector_contrib_spark.processors import (
        FilterSpansProcessor,
        SpanMatchProperties,
    )

    spans = _span_frame(spark, sf_dir)
    proc = FilterSpansProcessor(
        exclude=SpanMatchProperties(attributes=[("turn", "3")]),
        conditions=["span_kind = 'SPAN_KIND_CLIENT'"],
    )
    return proc(spans).select(
        "trace_id", "span_id", "span_name", "span_kind", "status_code"
    )


def _q_transform_spanevent(spark, sf_dir):
    # OTTL span-event context (pkg/ottl/contexts/ottlspanevent): ordered
    # statements over each span's nested events — stamp the enclosing
    # span's name via the span.* namespace, rename matching events via a
    # guarded set — then explode the rebuilt arrays to flat rows for the
    # oracle compare (positions prove event order survived the regroup)
    from opentelemetry_collector_contrib_spark.processors.spanevents import (
        SpanEventTransform,
    )

    spans = _span_frame(spark, sf_dir)
    out = SpanEventTransform(
        [
            'set(attributes["parent_span"], span.name)',
            'set(name, "exception.renamed") where name == "exception"',
        ]
    )(spans)
    ev = out.select(
        "trace_id",
        "span_id",
        F.posexplode("events").alias("pos", "e"),
    )
    return ev.select(
        "trace_id",
        "span_id",
        "pos",
        F.col("e.name").alias("event_name"),
        F.element_at("e.attributes", "parent_span").alias("parent_span"),
    )


def _q_count_spans_signal(spark, sf_dir):
    # the count connector's span + span-event signals (config.go:19-29
    # per-signal default metric names): spans counted per service with
    # the missing-service default bucket, events counted per name after
    # one explode
    from opentelemetry_collector_contrib_spark.connectors.count import (
        SIGNAL_DEFAULT_METRICS,
        CountConnector,
        MetricDef,
    )

    spans = _span_frame(spark, sf_dir)
    c_spans = CountConnector(
        [
            MetricDef(
                name=SIGNAL_DEFAULT_METRICS["spans"],
                attributes=[("service_name", "unknown")],
            )
        ]
    )(spans)
    events = spans.select(F.explode("events").alias("e")).select(
        F.col("e.name").alias("event_name")
    )
    c_events = CountConnector(
        [
            MetricDef(
                name=SIGNAL_DEFAULT_METRICS["spanevents"],
                attributes=[("event_name", None)],
            )
        ]
    )(events)
    out = c_spans.unionByName(c_events)
    return out.select(
        "metric_name",
        F.coalesce(
            F.element_at("attrs", "service_name"),
            F.element_at("attrs", "event_name"),
        ).alias("dim"),
        "count",
    )


def _q_servicegraph_spanpair(spark, sf_dir):
    # reference span-pair store semantics as a full-outer equi-join:
    # even turns are client spans, odd turns server spans whose parent
    # is the previous turn's span id; every 10th server is missing so
    # its client expires into a virtual edge (peer attr or "unknown")
    from opentelemetry_collector_contrib_spark.connectors import SpanServiceGraph

    t = _transcripts(spark, sf_dir)
    svc = F.concat(F.lit("svc-"), (F.col("turn_idx") % 5).cast("string"))
    dur = ((F.col("turn_idx") % 9 + 1) / F.lit(1000.0)).cast("double")
    spans = t.filter(
        (F.col("turn_idx") % 2 == 0) | (F.col("turn_idx") % 10 != 7)
    ).select(
        F.col("conv_id").alias("trace_id"),
        F.concat(F.col("conv_id"), F.lit("#"), F.col("turn_idx").cast("string")).alias(
            "span_id"
        ),
        F.when(
            F.col("turn_idx") % 2 == 1,
            F.concat(
                F.col("conv_id"), F.lit("#"), (F.col("turn_idx") - 1).cast("string")
            ),
        )
        .otherwise(F.lit(""))
        .alias("parent_span_id"),
        F.when(F.col("turn_idx") % 2 == 0, "SPAN_KIND_CLIENT")
        .otherwise("SPAN_KIND_SERVER")
        .alias("span_kind"),
        svc.alias("service_name"),
        F.when(F.col("turn_idx") % 5 == 0, "STATUS_CODE_ERROR")
        .otherwise("STATUS_CODE_OK")
        .alias("status_code"),
        dur.alias("duration_s"),
        F.map_filter(
            F.create_map(
                F.lit("peer.service"),
                F.when(
                    F.col("turn_idx") % 3 != 0,
                    F.concat(F.lit("peer-"), (F.col("turn_idx") % 3).cast("string")),
                ),
            ),
            lambda _, v: v.isNotNull(),
        ).alias("attributes"),
    )
    out = SpanServiceGraph()(spans)
    return out.select(
        "client",
        "server",
        "connection_type",
        "request_count",
        "failed_count",
        # exact micro sums: the connector sums bigint micros internally
        # and divides once, so round(sum_s*1e6) recovers the integer sum
        # exactly (±ulp from the /1e6 round-trip rounds away) — the
        # value-hash is parallelism-proof
        F.round(F.col("client_latency_sum_s") * 1e6, 0).cast("bigint").alias("client_lat_us"),
        F.round(F.col("server_latency_sum_s") * 1e6, 0).cast("bigint").alias("server_lat_us"),
    )


def _q_exceptions_metrics(spark, sf_dir):
    return ExceptionsConnector().metrics(_span_frame(spark, sf_dir))


def _q_exceptions_logs(spark, sf_dir):
    return ExceptionsConnector().logs(_span_frame(spark, sf_dir)).select(
        "ts", "severity_text", "severity_number", "trace_id", "span_id",
        "service_name", "span_name", "span_kind", "status_code",
        "exception_type", "exception_message", "exception_stacktrace",
    )


def _q_groupbyattrs(spark, sf_dir):
    # record attrs live in the map; promote (role, tool) to resource
    # identity and regroup — output is the per-identity record count
    df = _transcripts(spark, sf_dir).select(
        "conv_id",
        "turn_idx",
        F.map_from_arrays(
            F.array(F.lit("role"), F.lit("tool")),
            F.array(F.col("role"), F.col("tool")),
        ).alias("attributes"),
    )
    grouped = GroupByAttrs(keys=["role", "tool"], hash_col=None)(df)
    return grouped.groupBy("role", "tool").agg(
        F.count(F.lit(1)).alias("records")
    )


def _q_delta_to_cumulative(spark, sf_dir):
    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    out = DeltaToCumulative(
        value_col="value", stream_keys=["user_id"], order_col="event_id"
    )(events)
    return out.select(
        "user_id", "event_id", F.round("cumulative", 6).alias("cumulative")
    )


def _q_cumulative_to_delta(spark, sf_dir):
    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    out = CumulativeToDelta(
        value_col="value", stream_keys=["user_id"], order_col="event_id"
    )(events)
    return out.select(
        "user_id", "event_id", F.round("delta", 6).alias("delta")
    )


def _q_delta_to_cumulative_guarded(spark, sf_dir):
    # the reference accumulator's sample guards (delta.go:28-57): every
    # 7th event shares its predecessor's timestamp (out-of-order dup ->
    # dropped) and every 11th carries an older start (different
    # process's series -> dropped unless it IS the series head)
    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    eid = F.col("event_id")
    synth = events.select(
        "user_id",
        "event_id",
        "value",
        (eid - (eid % 7 == 0).cast("int")).alias("ts_syn"),
        F.when(eid % 11 == 0, -1).otherwise(0).alias("start_syn"),
    )
    out = DeltaToCumulative(
        value_col="value",
        stream_keys=["user_id"],
        order_col="ts_syn",
        start_col="start_syn",
        tiebreak_col="event_id",
    )(synth)
    return out.select(
        "user_id", "event_id", F.round("cumulative", 6).alias("cumulative")
    )


def _q_decontaminate(spark, sf_dir):
    # train/eval decontamination: every 50th doc plays the eval set;
    # training docs sharing any 3-shingle with it are flagged with
    # their shared-shingle count (broadcast eval side, one exchange)
    from opentelemetry_collector_contrib_spark.training.dedup import (
        contamination_check,
    )

    docs = _docs(spark, sf_dir)
    ev = docs.filter(F.col("doc_id") % 50 == 0)
    tr = docs.filter(F.col("doc_id") % 50 != 0)
    return contamination_check(tr, ev)


def _q_quantize_int8(spark, sf_dir):
    # symmetric int8 embedding quantization (scale = max|x|/127,
    # round-half-up, clamped) — zero-shuffle projection
    from opentelemetry_collector_contrib_spark.training.quantize import (
        quantize_int8,
    )

    out = quantize_int8(_emb(spark, sf_dir))
    return out.select(
        "vec_id",
        "scale_q9",
        F.array_join(F.col("qvec").cast("array<string>"), "|").alias("qvec_str"),
    )


def _q_sample_stratified(spark, sf_dir):
    # deterministic md5-ranked draw: 5 events per user stratum
    from opentelemetry_collector_contrib_spark.training.sampling import (
        stratified_sample,
    )

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    out = stratified_sample(ev, ["user_id"], n_per_stratum=5, id_col="event_id")
    return out.select("user_id", "event_id")


def _q_pack_sequences(spark, sf_dir):
    # GPT-style concat-and-chunk: documents md5-shuffled into 4 shards,
    # token streams cut every 256 tokens; straddlers span packs
    from opentelemetry_collector_contrib_spark.training.sampling import (
        pack_sequences,
    )

    docs = _docs(spark, sf_dir)
    sized = docs.select(
        "doc_id", F.size(tokens(F.col("text"))).cast("long").alias("n_tokens")
    )
    return pack_sequences(sized, budget=256, n_shards=4)


def _q_pack_stats(spark, sf_dir):
    # packing-efficiency report over the headline 4-shard/256-budget
    # layout: packs used, fill rate, straddler fraction per shard
    from opentelemetry_collector_contrib_spark.training import pack_stats
    from opentelemetry_collector_contrib_spark.training.sampling import (
        pack_sequences,
    )

    docs = _docs(spark, sf_dir)
    sized = docs.select(
        "doc_id", F.size(tokens(F.col("text"))).cast("long").alias("n_tokens")
    )
    return pack_stats(pack_sequences(sized, budget=256, n_shards=4), budget=256)


def _q_bpe_token_count(spark, sf_dir):
    # whitespace + BPE-ish pretokenizer counts — the context-window
    # budgeter (training/textstats.py BPE_PATTERN, engine-portable
    # regex subset)
    from opentelemetry_collector_contrib_spark.training.textstats import (
        bpe_token_count,
    )

    return bpe_token_count(_docs(spark, sf_dir))


def _q_pack_nosplit(spark, sf_dir):
    # next-fit no-split packing (SFT layout): sequential per shard via
    # one applyInPandas, parallel across the 4 shards
    from opentelemetry_collector_contrib_spark.training.sampling import (
        pack_sequences_nosplit,
    )

    docs = _docs(spark, sf_dir)
    sized = docs.select(
        "doc_id", F.size(tokens(F.col("text"))).cast("long").alias("n_tokens")
    )
    return pack_sequences_nosplit(sized, budget=256, n_shards=4)


def _q_transform_metric_ctx(spark, sf_dir):
    # metric-context OTTL editors composed: gauge->sum retype, then
    # count + sum extraction from histogram metrics (appended, HasSum
    # gate) — processors/transform_metrics.py
    from opentelemetry_collector_contrib_spark.processors.transform_metrics import (
        convert_gauge_to_sum,
        extract_count_metric,
        extract_sum_metric,
    )

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    m3 = F.col("event_id") % 3
    frame = ev.select(
        "event_id",
        F.when(m3 == 0, "req").when(m3 == 1, "cpu").otherwise("lat").alias(
            "metric_name"
        ),
        F.when(m3 == 0, "sum").when(m3 == 1, "gauge").otherwise("histogram").alias(
            "metric_type"
        ),
        F.when(m3 == 0, "cumulative").when(m3 == 2, "delta").alias("temporality"),
        F.when(m3 == 0, F.lit(True)).alias("is_monotonic"),
        F.when(m3 == 0, "1").when(m3 == 1, "%").otherwise("ms").alias("unit"),
        F.when(m3 <= 1, F.floor(F.col("value") * 1e6).cast("double")).alias("value"),
        F.when(m3 == 2, (F.col("event_id") % 100).cast("long")).alias("count"),
        F.when(
            (m3 == 2) & (F.col("event_id") % 5 != 0),
            F.floor(F.col("value") * 1e6).cast("double"),
        ).alias("hsum"),
    )
    out = extract_sum_metric(
        extract_count_metric(
            convert_gauge_to_sum(frame, "delta", True), monotonic=False
        ),
        monotonic=True,
    )
    return out.select(
        "event_id",
        "metric_name",
        "metric_type",
        "temporality",
        F.coalesce(F.col("is_monotonic").cast("string"), F.lit("null")).alias(
            "is_monotonic"
        ),
        "unit",
        F.coalesce("value", F.lit(-1.0)).alias("value"),
        F.coalesce("count", F.lit(-1)).alias("count"),
        F.coalesce("hsum", F.lit(-1.0)).alias("hsum"),
    )


def _q_expo_cumulative(spark, sf_dir):
    # delta -> cumulative EXPONENTIAL histograms: mixed scales per
    # stream (2 or 3), synthetic bucket arrays of 0..3 buckets, zero
    # counts — exercises the floor-shift scale alignment, the empty-
    # point state carry, and the dense gap fill (processors/expo.py)
    from opentelemetry_collector_contrib_spark.processors.expo import (
        DeltaToCumulativeExpo,
    )

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    eid = F.col("event_id")
    counts = F.slice(
        F.array(*[((eid + i * 7) % 10 + 1).cast("long") for i in range(3)]),
        1,
        (eid % 4).cast("int"),
    )
    dp = ev.select(
        "user_id",
        eid.alias("ts"),
        (F.lit(2) + F.col("user_id") % 2).cast("int").alias("scale"),
        ((eid % 37) - 18).cast("int").alias("offset"),
        counts.alias("counts"),
        (eid % 3).cast("long").alias("zero_count"),
    )
    out = DeltaToCumulativeExpo(stream_keys=["user_id"], order_col="ts")(dp)
    return out.select(
        "user_id",
        F.col("ts").alias("event_id"),
        "scale_out",
        "zero_cum",
        "offset_out",
        F.array_join(F.col("counts_out").cast("array<string>"), "|").alias(
            "counts_str"
        ),
    )


def _q_delta_to_rate_ref(spark, sf_dir):
    # reference-faithful deltatorate (processor.go:96-103): rate =
    # value / (ts - start_ts) per datapoint, only configured DELTA
    # metrics convert, zero windows yield 0
    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    eid = F.col("event_id")
    synth = events.select(
        F.concat(F.lit("m"), (F.col("user_id") % 3).cast("string")).alias("metric"),
        "event_id",
        F.round("value", 6).alias("value"),
        F.col("ts"),
        (F.col("ts") - F.make_interval(secs=(eid % 5).cast("int"))).alias("start"),
        F.when(eid % 2 == 0, "delta").otherwise("cumulative").alias("temporality"),
    )
    out = DeltaToRate(
        stream_keys=["metric"],
        order_col="ts",
        start_col="start",
        metrics=["m0", "m1"],
        temporality_col="temporality",
    )(synth)
    return out.select(
        "metric", "event_id", F.round("rate", 6).alias("rate")
    )


def _q_expo_widen_zero(spark, sf_dir):
    # zero-threshold widening at scale 0 to width 2.0: buckets with
    # upper bound <= 2 fold into the zero count, the array slices to
    # start after index 0, the threshold rounds up to the folded
    # bucket's upper bound (zero.go:14-42). Positive-only datapoints.
    from opentelemetry_collector_contrib_spark.processors.expo import (
        widen_zero_exprs,
    )

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    eid = F.col("event_id")
    dp = ev.select(
        "event_id",
        ((eid % 9) - 4).cast("int").alias("pos_offset"),
        F.slice(
            F.array(*[((eid + i * 3) % 6 + 1).cast("long") for i in range(4)]),
            1,
            (eid % 5).cast("int"),
        ).alias("pos_counts"),
        (eid % 3).cast("long").alias("zero_count"),
    )
    ex = widen_zero_exprs(
        0, 2.0, F.col("zero_count"), F.col("pos_offset"), F.col("pos_counts")
    )
    return dp.select(
        "event_id",
        ex["zero_count"].alias("zero_cnt"),
        ex["zero_threshold"].alias("zero_threshold"),
        ex["pos_offset"].alias("off_out"),
        F.array_join(ex["pos_counts"].cast("array<string>"), "|").alias(
            "counts_str"
        ),
    )


def _q_cumulative_to_delta_mono(spark, sf_dir):
    # monotonic-sum semantics (processor_test.go restart_detected): a
    # value below its predecessor is a counter restart — dropped but
    # re-referenced; the synthetic value stream has plenty of dips so
    # the restart path is exercised on every stream
    events = spark.read.parquet(f"{sf_dir}/events.parquet").withColumn(
        "mono", F.lit(True)
    )
    out = CumulativeToDelta(
        value_col="value",
        stream_keys=["user_id"],
        order_col="event_id",
        monotonic_col="mono",
    )(events)
    return out.select(
        "user_id", "event_id", F.round("delta", 6).alias("delta")
    )


def _q_delta_to_rate(spark, sf_dir):
    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    out = DeltaToRate(
        value_col="value", stream_keys=["user_id"], order_col="ts"
    )(events)
    return out.select(
        "user_id", "event_id", F.round("rate", 6).alias("rate")
    )


def _q_interval_last(spark, sf_dir):
    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    out = IntervalProcessor(
        interval="1 hour", value_col="value", stream_keys=["user_id"],
        order_col="ts", tiebreak_col="event_id",
    )(events)
    return out.select(
        "user_id", "interval_start", "event_id", F.round("value", 6).alias("value")
    )


def _q_sampler(spark, sf_dir):
    # deterministic md5-bucket sampling (bit-exact DuckDB twin)
    s = ProbabilisticSampler(percentage=25.0, attribute_source="conv_id")
    return s(_transcripts(spark, sf_dir)).select("conv_id", "turn_idx")


def _q_sampler_proportional(spark, sf_dir):
    df = _transcripts(spark, sf_dir).withColumn("prior", F.lit(0.5))
    s = ProbabilisticSampler(
        percentage=30.0, attribute_source="conv_id",
        mode="proportional", prior_col="prior",
    )
    return s(df).select("conv_id", "turn_idx", "sampling_probability")


def _q_sampler_equalizing(spark, sf_dir):
    # rows already sampled harder than the target (user turns, prior
    # 0.2 < 0.5) pass through; the rest are cut down to 50%
    df = _transcripts(spark, sf_dir).withColumn(
        "prior", F.when(F.col("role") == "user", 0.2).otherwise(1.0)
    )
    s = ProbabilisticSampler(
        percentage=50.0, attribute_source="conv_id",
        mode="equalizing", prior_col="prior",
    )
    return s(df).select("conv_id", "turn_idx", "sampling_probability")


def _q_sampler_fnv(spark, sf_dir):
    # byte-exact reference hashing: Go hash/fnv FNV-1a over
    # i32tob(seed) ++ key bytes, 14-bit bucket vs pct * 163.84 — the
    # decisions here EQUAL the collector's hash_seed mode decisions
    s = ProbabilisticSampler(
        percentage=25.0, attribute_source="conv_id", hash_function="fnv"
    )
    return s(_transcripts(spark, sf_dir)).select("conv_id", "turn_idx")


def _q_k8sattributes(spark, sf_dir):
    # pod association by connection IP against a nation-derived pod dim;
    # every 5th event carries a pre-existing attr that must WIN over the
    # pod metadata; ips with event_id%30 >= 25 have no pod (no match)
    from opentelemetry_collector_contrib_spark.processors import (
        AssociationRule,
        AssociationSource,
        K8sAttributes,
    )

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    fact = ev.select(
        "event_id",
        F.concat(
            F.lit("10."), (F.col("event_id") % 30).cast("string"), F.lit(".0.1")
        ).alias("ip"),
        F.when(
            F.col("event_id") % 5 == 0,
            F.expr("map('k8s.nation', 'preset')"),
        )
        .otherwise(F.expr("map()"))
        .cast("map<string,string>")
        .alias("attributes"),
    )
    nation = spark.read.parquet(f"{sf_dir}/nation.parquet")
    pods = nation.select(
        F.concat(
            F.lit("10."), F.col("n_nationkey").cast("string"), F.lit(".0.1")
        ).alias("pod_ip"),
        F.map_from_arrays(
            F.array(F.lit("k8s.nation"), F.lit("k8s.region")),
            F.array(F.col("n_name"), F.col("n_regionkey").cast("string")),
        ).alias("metadata"),
    )
    proc = K8sAttributes(
        pods,
        [AssociationRule(sources=[AssociationSource("connection")], dim_keys=["pod_ip"])],
    )
    out = proc(fact)
    return out.select(
        "event_id",
        "ip",
        F.element_at("attributes", "k8s.nation").alias("nation_attr"),
        F.element_at("attributes", "k8s.region").alias("region_attr"),
        F.element_at("attributes", "k8s.pod.ip").alias("pod_ip_attr"),
    )


def _q_span_rename(spark, sf_dir):
    # spanprocessor to_attributes: every 7th span gets a non-matching
    # name so BOTH branches (first-match {group} splice + untouched
    # passthrough) are oracle-exercised; set_status gated on the
    # extracted attribute afterward
    t = _transcripts(spark, sf_dir).select(
        "conv_id",
        "turn_idx",
        F.when(
            F.col("turn_idx") % 7 == 0,
            F.concat(F.lit("noop-"), F.col("turn_idx").cast("string")),
        )
        .otherwise(
            F.concat(
                F.lit("/api/"), "role", F.lit("/op/"), "tool", F.lit("/run")
            )
        )
        .alias("span_name"),
        F.expr("map()").cast("map<string,string>").alias("attributes"),
        F.lit("UNSET").alias("status_code"),
    )
    sp = SpanProcessor(
        to_attributes=[r"^/api/(?P<rolePart>[^/]+)/op/(?P<toolPart>[^/]+)/run$"]
    )
    mark = SpanProcessor(
        status_code="Error",
        status_description="exec span",
        include_condition="element_at(attributes, 'toolPart') = 'bash'",
    )
    out = mark(sp(t))
    return out.select(
        "conv_id",
        "turn_idx",
        "span_name",
        F.element_at("attributes", "rolePart").alias("role_part"),
        F.element_at("attributes", "toolPart").alias("tool_part"),
        "status_code",
        "status_description",
    )


def _q_tail_sampling(spark, sf_dir):
    # thresholds sit in the upper tail of the sf0.01 distribution so the
    # decision is DISCRIMINATING (some traces kept, some dropped)
    ts = TailSampling(policies=[
        TailPolicy("slow", "latency", threshold_ms=2_570_000_000),
        TailPolicy("late_editor", "condition",
                   condition="tool = 'editor' AND turn_idx >= 95"),
        TailPolicy("prob", "probabilistic", percentage=10.0),
    ])
    return ts(_transcripts(spark, sf_dir)).select("conv_id", "turn_idx")


def _q_tail_invert(spark, sf_dir):
    # string_attribute with invert_match: keep traces where NO row's
    # text contains FATAL (InvertSampled promotion path, 40/150 convs
    # at sf0.01 — discriminating)
    ts = TailSampling(policies=[
        TailPolicy("no_fatal", "string_attribute", key="text",
                   values=["FATAL"], enabled_regex_matching=True,
                   invert_match=True),
    ])
    return ts(_transcripts(spark, sf_dir)).select("conv_id", "turn_idx")


def _q_tail_span_count(spark, sf_dir):
    # span_count range OR'd with a row condition: the reference's
    # multi-policy combine (any Sampled keeps)
    ts = TailSampling(policies=[
        TailPolicy("mid", "span_count", min_spans=60, max_spans=70),
        TailPolicy("fatal", "condition", condition="text LIKE '%FATAL%'"),
    ])
    return ts(_transcripts(spark, sf_dir)).select("conv_id", "turn_idx")


def _q_groupbytrace(spark, sf_dir):
    g = GroupByTraceProc()(_transcripts(spark, sf_dir))
    return g.select(
        "conv_id",
        "span_count",
        F.md5(
            F.array_join(
                F.transform("spans", lambda s: s.getField("text")), "\x1f"
            )
        ).alias("digest"),
    )


def _metric_frame(spark, sf_dir):
    """Long metric frame derived from events. Values are floor-scaled to
    integral doubles (floor(value * 1e6)) so sums stay exact and
    associative — bit-stable at any parallelism and vs the oracle."""
    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    return events.select(
        F.when(F.col("event_id") % 2 == 0, "req.count")
        .otherwise("err.count")
        .alias("metric_name"),
        F.floor(F.col("value") * 1e6).cast("double").alias("value"),
        F.create_map(
            F.lit("uid"), F.col("user_id").cast("string")
        ).alias("labels"),
    )


def _q_filter_metrics(spark, sf_dir):
    # metrics-signal filter (processor/filterprocessor/metrics.go):
    # regexp include on the metric name AND a strict-on-regexp-side
    # resource attribute conjunction
    from opentelemetry_collector_contrib_spark.processors import (
        FilterMetricsProcessor,
        MetricMatchProperties,
    )

    m = _metric_frame(spark, sf_dir).withColumn(
        "resource",
        F.create_map(
            F.lit("env"),
            F.when(
                F.element_at("labels", "uid").cast("long") % 3 == 0, "prod"
            ).otherwise("dev"),
        ),
    )
    proc = FilterMetricsProcessor(
        include=MetricMatchProperties(
            match_type="regexp",
            metric_names=[r"req\..*"],
            resource_attributes=[("env", "prod")],
        )
    )
    return proc(m).select(
        "metric_name",
        F.element_at("labels", "uid").alias("uid"),
        "value",
        F.element_at("resource", "env").alias("env"),
    )


def _q_metrics_transform(spark, sf_dir):
    # combine req.count + err.count into one summed metric per label set
    mt = MetricsTransform([
        MetricTransform(
            # non-capturing: a capture group would become a "$1" label on
            # every combined point (reference combine(), otlp.go:398-441)
            include=r"^(?:req|err)\.count$", match_type="regexp",
            action="combine", new_name="all.count", aggregation_type="sum",
        )
    ])
    out = mt(_metric_frame(spark, sf_dir))
    return out.select(
        "metric_name", F.element_at("labels", "uid").alias("uid"), "value"
    )


def _q_metrics_combine_captures(spark, sf_dir):
    # combine with capture-group labels (otlp.go:398-441: each include
    # group becomes a label keyed by its name) + a second update whose
    # match_labels only hits SOME datapoints per metric — canChangeMetric
    # is false, so the dp-level scale applies per matching point and the
    # rename/aggregate class would be skipped (transformMetric:526-563).
    # Int-typed points: scale truncates toward zero.
    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    frame = events.select(
        F.when(F.col("event_id") % 2 == 0, "lat.p50.ms")
        .otherwise("lat.p99.ms")
        .alias("metric_name"),
        F.floor(F.col("value") * 1e3).cast("double").alias("value"),
        F.create_map(
            F.lit("uid"), (F.col("user_id") % 10).cast("string")
        ).alias("labels"),
        F.lit("int").alias("value_type"),
    )
    mt = MetricsTransform(
        [
            MetricTransform(
                include=r"^lat\.(?P<q>p\d+)\.ms$", match_type="regexp",
                action="combine", new_name="lat.ms", aggregation_type="sum",
            ),
            MetricTransform(
                include="lat.ms", action="update",
                match_labels={"q": "p99"},
                operations=[MetricOp("experimental_scale_value", scale=2.0)],
            ),
        ],
        type_col="value_type",
    )
    out = mt(frame)
    return out.select(
        "metric_name",
        F.element_at("labels", "q").alias("q"),
        F.element_at("labels", "uid").alias("uid"),
        "value",
        "value_type",
    )


def _q_grafanacloud_hosts(spark, sf_dir):
    # hourly flush of distinct host ids; every 3rd event lacks host.id
    # and falls back to host.name (first-present-identifier rule)
    from opentelemetry_collector_contrib_spark.connectors import GrafanaCloudConnector

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    spans = ev.select(
        F.col("ts"),
        F.map_filter(
            F.create_map(
                F.lit("host.id"),
                F.when(
                    F.col("event_id") % 3 != 0,
                    F.concat(F.lit("h"), (F.col("user_id") % 37).cast("string")),
                ),
                F.lit("host.name"),
                F.concat(F.lit("n"), (F.col("user_id") % 11).cast("string")),
            ),
            lambda _, v: v.isNotNull(),
        ).alias("attributes"),
    )
    conn = GrafanaCloudConnector(
        host_identifiers=["host.id", "host.name"], flush_interval="1 hour"
    )
    return conn(spans)


def _q_sumologic_shape(spark, sf_dir):
    # cloud_namespace -> translate -> nest pipeline (sumologicprocessor
    # sub-op order, processor.go:33-45); nesting include-listed to the
    # net.* keys so the oracle can build the fixed JSON shape
    from opentelemetry_collector_contrib_spark.processors import (
        NestingConfig,
        SumoLogicProcessor,
    )

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    fact = ev.select(
        "event_id",
        F.create_map(
            F.lit("cloud.platform"),
            F.element_at(
                F.array(
                    F.lit("aws_ec2"), F.lit("aws_ecs"),
                    F.lit("aws_elastic_beanstalk"), F.lit("gcp_compute_engine"),
                ),
                (F.col("event_id") % 4 + 1).cast("int"),
            ),
            F.lit("host.name"),
            F.concat(F.lit("h"), (F.col("user_id") % 20).cast("string")),
            F.lit("net.peer"),
            F.concat(F.lit("p"), (F.col("event_id") % 7).cast("string")),
        ).alias("attributes"),
    )
    proc = SumoLogicProcessor(
        nest_attributes=NestingConfig(enabled=True, include=["net."])
    )
    out = proc(fact)
    return out.select(
        "event_id",
        F.element_at("attributes", "aws_service").alias("aws_service"),
        F.element_at("attributes", "cloud.namespace").alias("namespace"),
        F.element_at("attributes", "host").alias("host"),
        F.element_at("attributes", "net").alias("net_json"),
    )


_SCHEMA_VERSIONS = {
    "1.0.0": {},
    "1.1.0": {"all": {"changes": [
        {"rename_attributes": {"attribute_map": {"k8s.cluster": "k8s.cluster.name"}}}]}},
    "1.2.0": {"logs": {"changes": [
        {"rename_attributes": {"attribute_map": {"log.path": "log.file.path"}}}]}},
}


def _q_schema_translate(spark, sf_dir):
    # mixed source versions translated to 1.2.0 in one pass: rows at
    # 1.0.0 get both renames, 1.1.0 only the 1.2.0 rename, 1.2.0 none
    from opentelemetry_collector_contrib_spark.processors import SchemaProcessor

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    fact = ev.select(
        "event_id",
        F.concat(
            F.lit("https://opentelemetry.io/schemas/1."),
            (F.col("event_id") % 3).cast("string"),
            F.lit(".0"),
        ).alias("schema_url"),
        F.create_map(
            F.lit("k8s.cluster"),
            F.concat(F.lit("c"), (F.col("user_id") % 5).cast("string")),
            F.lit("log.path"),
            F.concat(F.lit("/p"), (F.col("event_id") % 7).cast("string")),
        ).alias("attributes"),
    )
    proc = SchemaProcessor(versions=_SCHEMA_VERSIONS, target="1.2.0", signal="log")
    out = proc(fact)
    return out.select(
        "event_id",
        "schema_url",
        F.element_at("attributes", "k8s.cluster.name").alias("cluster_new"),
        F.element_at("attributes", "k8s.cluster").alias("cluster_old"),
        F.element_at("attributes", "log.file.path").alias("path_new"),
        F.element_at("attributes", "log.path").alias("path_old"),
    )


def _q_metrics_generation(spark, sf_dir):
    # aggregate per uid, then generate err.ratio = err/req percent
    mt = MetricsTransform([
        MetricTransform(
            include=".*", match_type="regexp", action="update",
            operations=[MetricOp("aggregate_labels", label_set=["uid"],
                                 aggregation_type="sum")],
        )
    ])
    mg = MetricsGeneration([
        GenerationRule(name="err.ratio", type="calculate",
                       metric1="err.count", metric2="req.count",
                       operation="percent")
    ])
    out = mg(mt(_metric_frame(spark, sf_dir)))
    return out.filter(F.col("metric_name") == "err.ratio").select(
        "metric_name",
        F.element_at("labels", "uid").alias("uid"),
        F.round("value", 6).alias("value"),
    )


def _q_dedup_exact(spark, sf_dir):
    return exact_dedup(_docs(spark, sf_dir)).select("doc_id")


def _q_dedup_lsh(spark, sf_dir):
    sigs = minhash_signatures(_docs(spark, sf_dir), n_hashes=_MINHASH_N)
    return lsh_candidate_pairs(
        sigs, bands=_BANDS, rows_per_band=_ROWS, max_bucket=_LSH_MAX_BUCKET
    )


def _q_bpe_merges(spark, sf_dir):
    # BPE tokenizer induction (Sennrich et al. 2016): the first 8
    # merges learned from the corpus word-frequency table — the
    # iterative checkpointed-loop posture (one corpus scan, then
    # vocab-sized rounds, one argmax row to the driver per round)
    from opentelemetry_collector_contrib_spark.training.bpe import bpe_learn

    return bpe_learn(_docs(spark, sf_dir), n_merges=8)


def _q_bpe_tokenize(spark, sf_dir):
    # the ENCODE path: learn 8 merges (driver-side index constants,
    # same posture as IVF centroids), then the zero-shuffle literal
    # replace chain segments every distinct word — (word, freq,
    # n_subwords), i.e. the encoded lexicon
    from opentelemetry_collector_contrib_spark.training.bpe import (
        SEP,
        _merged,
        _symbols,
        bpe_learn,
    )
    from opentelemetry_collector_contrib_spark.training import tokens

    docs = _docs(spark, sf_dir)
    merges = [
        (r.left_sym, r.right_sym) for r in bpe_learn(docs, n_merges=8).collect()
    ]
    words = (
        docs.select(F.explode(tokens(F.col("text"))).alias("word"))
        .filter(~F.col("word").contains(SEP))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    return words.select(
        "word",
        "freq",
        F.size(_symbols(_merged(F.col("word"), merges)))
        .cast("long")
        .alias("n_subwords"),
    )


def _q_lsh_verified(spark, sf_dir):
    # the production fuzzy-dedup composition: banded-LSH candidates ->
    # exact-Jaccard verify on candidates ONLY (per-pair array_intersect,
    # zero explode — verify cost proportional to |candidates|)
    docs = _docs(spark, sf_dir)
    sigs = minhash_signatures(docs, n_hashes=_MINHASH_N)
    pairs = lsh_candidate_pairs(
        sigs, bands=_BANDS, rows_per_band=_ROWS, max_bucket=_LSH_MAX_BUCKET
    )
    return jaccard_verify_pairs(docs, pairs, threshold=0.8)


def _q_fuzzy_dedup_funnel(spark, sf_dir):
    # the COMPLETE production fuzzy-dedup pipeline in one Spark plan
    # (BigCode/Dolma posture): minhash -> banded LSH (capped buckets) ->
    # exact-Jaccard verify on candidates only -> connected components
    # over VERIFIED edges -> one canonical doc per cluster. Differs from
    # dedup_clusters exactly by the verify stage: a band-collision false
    # positive cannot merge two clusters. Member counts come from a
    # groupBy + join (map-side combine; a count window over cluster_id
    # would put a viral cluster on one task — the exact_dedup lesson).
    from opentelemetry_collector_contrib_spark.training.dedup import (
        connected_components,
    )

    docs = _docs(spark, sf_dir)
    sigs = minhash_signatures(docs, n_hashes=_MINHASH_N)
    cand = lsh_candidate_pairs(
        sigs, bands=_BANDS, rows_per_band=_ROWS, max_bucket=_LSH_MAX_BUCKET
    )
    verified = jaccard_verify_pairs(docs, cand, threshold=0.8).select(
        "a_id", "b_id"
    )
    cl = connected_components(docs, verified)
    counts = cl.groupBy("cluster_id").agg(F.count(F.lit(1)).alias("n_members"))
    return cl.join(counts, "cluster_id").select(
        "doc_id",
        "cluster_id",
        "n_members",
        (F.col("doc_id") == F.col("cluster_id")).alias("keep"),
    )


def _q_passage_dedup(spark, sf_dir):
    # passage-window exact-substring dedup stats (Lee et al. 2021):
    # 10-word non-overlapping passages, duplicate = occurs in 2+ docs
    from opentelemetry_collector_contrib_spark.training import (
        passage_dedup_stats,
    )

    return passage_dedup_stats(_docs(spark, sf_dir), words_per_passage=10)


def _q_dedup_clusters(spark, sf_dir):
    # LSH candidate pairs -> connected components: each doc labeled with
    # the minimum reachable doc_id (the canonical representative); docs
    # in no pair keep their own id
    from opentelemetry_collector_contrib_spark.training.dedup import (
        connected_components,
    )

    docs = _docs(spark, sf_dir)
    sigs = minhash_signatures(docs, n_hashes=_MINHASH_N)
    pairs = lsh_candidate_pairs(
        sigs, bands=_BANDS, rows_per_band=_ROWS, max_bucket=_LSH_MAX_BUCKET
    )
    return connected_components(docs, pairs)


def _q_curation(spark, sf_dir):
    # the composed pipeline: quality + language gate, then ONE canonical
    # (best-quality) document per LSH dedup cluster — see
    # training/curation.py for the 100 TB plan audit
    from opentelemetry_collector_contrib_spark.training.curation import curate
    from opentelemetry_collector_contrib_spark.training.dedup import (
        connected_components,
    )

    docs = _docs(spark, sf_dir)
    sigs = minhash_signatures(docs, n_hashes=_MINHASH_N)
    pairs = lsh_candidate_pairs(
        sigs, bands=_BANDS, rows_per_band=_ROWS, max_bucket=_LSH_MAX_BUCKET
    )
    clusters = connected_components(docs, pairs)
    return curate(docs, clusters, min_quality=4000, lang="en")


def _q_dedup_simhash(spark, sf_dir):
    return simhash(_docs(spark, sf_dir))


def _q_dedup_jaccard(spark, sf_dir):
    return ngram_jaccard_pairs(_docs(spark, sf_dir), threshold=0.2)


def _q_dedup_cosine(spark, sf_dir):
    # threshold 0.2 so the oracle is NON-vacuous (0.8 matched zero rows
    # on both sides at sf0.01 — a hash match on an empty frame verifies
    # nothing about the dot-product/norm/rounding path; 0.2 yields ~7k
    # pairs from 500 vectors)
    return cosine_pairs(_emb(spark, sf_dir), threshold=0.2)


def _q_ann_topk(spark, sf_dir):
    emb = _emb(spark, sf_dir)
    return brute_force_topk(emb, emb.filter("vec_id < 5"), k=5)


def _q_ann_lsh(spark, sf_dir):
    return hyperplane_buckets(_emb(spark, sf_dir), n_planes=8)


def _q_ann_lsh_topk(spark, sf_dir):
    # the composed 100 TB ANN path: bucket join + exact within-bucket
    # scoring + per-query top-k (4 planes -> 16 buckets at this SF)
    emb = _emb(spark, sf_dir)
    return lsh_topk(emb, emb.filter("vec_id < 20"), k=5, n_planes=4)


def _q_ann_ivf_assign(spark, sf_dir):
    # IVF coarse assignment: fit = deterministic md5-order sample of 16
    # data vectors; assignment is a zero-shuffle projection
    emb = _emb(spark, sf_dir)
    return ivf_assign(emb, ivf_centroids(emb, n_list=16))


def _q_ann_ivf_topk(spark, sf_dir):
    # IVF-flat ANN: 16 lists, 2 probes per query — the data-adaptive
    # twin of ann_lsh_topk with the same one-scan/broadcast posture
    emb = _emb(spark, sf_dir)
    cents = ivf_centroids(emb, n_list=16)
    return ivf_topk(emb, emb.filter("vec_id < 20"), cents, k=5, n_probe=2)


def _q_ann_ivf_kmeans(spark, sf_dir):
    # one Lloyd iteration over the sampled quantizer (1e-9 fixed-point
    # means — bit-identical in any engine), then the refined assignment
    emb = _emb(spark, sf_dir)
    cents = ivf_refine(emb, ivf_centroids(emb, n_list=16), n_iter=1)
    return ivf_assign(emb, cents)



def _q_pq_encode(spark, sf_dir):
    # PQ compression: 64 dims -> 4 codes (m=4 subspaces, ks=16 codes,
    # codebooks = slices of the same md5-order sample the IVF quantizer
    # uses). Exploded to (vec_id, subspace, code) rows so the oracle
    # compares scalar cells, not engine-specific array renderings.
    emb = _emb(spark, sf_dir)
    enc = pq_encode(emb, pq_codebooks(emb, m=4, ks=16))
    return enc.select(
        "vec_id", F.posexplode("codes").alias("subspace", "code")
    )


def _q_pq_topk(spark, sf_dir):
    # IVF-PQ ANN (FAISS-canonical composition): coarse probe n_probe=2
    # of 16 lists, then asymmetric-distance scoring from the 4 codes
    # only — the compressed-domain twin of ann_ivf_topk
    emb = _emb(spark, sf_dir)
    cents = ivf_centroids(emb, n_list=16)
    books = pq_codebooks(emb, m=4, ks=16)
    return pq_adc_topk(
        emb, emb.filter("vec_id < 20"), books, k=5, centroids=cents, n_probe=2
    )


def _q_pq_rerank(spark, sf_dir):
    # the FAISS refine composition: IVF-PQ ADC shortlist (k'=20, 4x the
    # final k) -> exact cosine rescoring of just those candidates — the
    # production ANN search shape (compressed scan, exact answer quality)
    from opentelemetry_collector_contrib_spark.training import pq_rerank_topk

    emb = _emb(spark, sf_dir)
    cents = ivf_centroids(emb, n_list=16)
    books = pq_codebooks(emb, m=4, ks=16)
    short = pq_adc_topk(
        emb, emb.filter("vec_id < 20"), books, k=20, centroids=cents, n_probe=2
    )
    return pq_rerank_topk(emb, emb.filter("vec_id < 20"), short, k=5)


def _q_ann_recall(spark, sf_dir):
    # recall@5 of every ANN index vs exact brute force over the same
    # 20-query probe set, each index at its headline-query config — the
    # tuning metric (FAISS/ann-benchmarks posture) a pipeline runs
    # before trusting an index config at corpus scale; also pins the
    # refine contract: pq_rerank recall >= pq_adc recall by construction
    from opentelemetry_collector_contrib_spark.training import (
        ann_recall,
        pq_rerank_topk,
    )

    emb = _emb(spark, sf_dir)
    q = emb.filter("vec_id < 20")
    # the exact brute-force shortlist feeds ALL FOUR branches of the
    # union below — materialize it ONCE (localCheckpoint, the
    # ann_opq_topk rotation-matrix lesson, SURVEY §8.4) instead of
    # re-scanning the corpus 4x; it is probe-set-sized (20 queries x k).
    # cents/books are already driver-side plan literals (each fit is
    # one n_list/ks-row TakeOrdered job, run once here).
    exact = brute_force_topk(emb, q, k=5).localCheckpoint()
    cents = ivf_centroids(emb, n_list=16)
    books = pq_codebooks(emb, m=4, ks=16)
    # one ADC corpus scan, not two: the k=5 ADC branch is exactly the
    # rank<=5 prefix of the k=20 shortlist (same scores, same
    # smaller-id tiebreak), and the shortlist is probe-set-sized
    # (20 queries x 20), so materialize it once for both branches
    short = pq_adc_topk(
        emb, q, books, k=20, centroids=cents, n_probe=2
    ).localCheckpoint()
    adc = short.filter(F.col("rank") <= 5)
    methods = [
        ("lsh", lsh_topk(emb, q, k=5, n_planes=4)),
        ("ivf", ivf_topk(emb, q, cents, k=5, n_probe=2)),
        ("pq_adc", adc),
        ("pq_rerank", pq_rerank_topk(emb, q, short, k=5)),
    ]
    parts = [
        ann_recall(exact, approx).select(
            F.lit(name).alias("method"), "recall", "n_pairs"
        )
        for name, approx in methods
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def _q_line_dedup(spark, sf_dir):
    # corpus-level exact line dedup (RefinedWeb/CCNet posture): strike a
    # line from EVERY doc when its exact text recurs >=2 times across
    # the corpus. The sf tables' documents are single-line word soup, so
    # the query first derives a deterministic multi-line corpus (8-word
    # lines, zero-shuffle projection — the DuckDB twin rebuilds it with
    # the same list_slice fold); duplicated documents then share every
    # line, so the op demonstrably removes real cross-doc boilerplate.
    from opentelemetry_collector_contrib_spark.training import line_dedup

    docs = _docs(spark, sf_dir)
    toks = F.filter(F.split(F.col("text"), r"\s+"), lambda t: t != "")
    staged = docs.select("doc_id", toks.alias("__toks"))
    n = F.size(F.col("__toks"))
    nlines = F.ceil(n / F.lit(8.0)).cast("int")
    idx = F.when(nlines > 0, F.sequence(F.lit(0), nlines - 1)).otherwise(
        F.array().cast("array<int>")
    )
    multi = staged.select(
        "doc_id",
        F.array_join(
            F.transform(
                idx,
                lambda i: F.array_join(
                    F.slice(F.col("__toks"), i * 8 + 1, 8), " "
                ),
            ),
            "\n",
        ).alias("text"),
    )
    return line_dedup(multi, min_dup=2)


def _q_winnow(spark, sf_dir):
    # MOSS winnowing fingerprints (k=4-word shingles, window=4): the
    # guaranteed-coverage local-fingerprint table partial-copy
    # detection joins on; zero-shuffle map-only explode
    from opentelemetry_collector_contrib_spark.training import (
        winnow_fingerprints,
    )

    return winnow_fingerprints(_docs(spark, sf_dir), k=4, window=4)


def _q_cluster_hist(spark, sf_dir):
    # the one-glance dedup report: cluster-size distribution over the
    # VERIFIED fuzzy clusters (how much corpus sits in singletons vs
    # pairs vs viral clusters)
    from opentelemetry_collector_contrib_spark.training import (
        cluster_size_histogram,
    )
    from opentelemetry_collector_contrib_spark.training.dedup import (
        connected_components,
    )

    docs = _docs(spark, sf_dir)
    sigs = minhash_signatures(docs, n_hashes=_MINHASH_N)
    cand = lsh_candidate_pairs(
        sigs, bands=_BANDS, rows_per_band=_ROWS, max_bucket=_LSH_MAX_BUCKET
    )
    verified = jaccard_verify_pairs(docs, cand, threshold=0.8).select(
        "a_id", "b_id"
    )
    return cluster_size_histogram(connected_components(docs, verified))


def _q_sig_estimate(spark, sf_dir):
    # signature-space Jaccard estimate for the LSH candidates — the
    # triage stage between candidate generation and the exact verify
    # scan: ranks pairs WITHOUT touching document text
    from opentelemetry_collector_contrib_spark.training import (
        minhash_jaccard_estimate,
    )

    sigs = minhash_signatures(_docs(spark, sf_dir), n_hashes=_MINHASH_N)
    pairs = lsh_candidate_pairs(
        sigs, bands=_BANDS, rows_per_band=_ROWS, max_bucket=_LSH_MAX_BUCKET
    )
    return minhash_jaccard_estimate(sigs, pairs)


def _q_compression_ratio(spark, sf_dir):
    # zlib compressibility quality signal (Arrow-batched mapInPandas;
    # no DuckDB compression primitive exists, so this is one of the few
    # rows-only driver checks — exact values pinned by pytest goldens)
    from opentelemetry_collector_contrib_spark.training import (
        compression_ratio,
    )

    return compression_ratio(_docs(spark, sf_dir))


def _q_token_entropy(spark, sf_dir):
    # per-doc token-distribution Shannon entropy (gibberish signal):
    # one sorted-array fold, zero shuffles; 1e-6-quantized terms make
    # the grouped-count DuckDB twin bit-identical
    from opentelemetry_collector_contrib_spark.training import (
        token_entropy,
    )

    return token_entropy(_docs(spark, sf_dir))


def _q_ivf_balance(spark, sf_dir):
    # FAISS imbalance_factor over the headline 16-list assignment: the
    # n_list tuning diagnostic (p99 probe latency tracks the LARGEST
    # probed list) — one grouped count + one metadata-scale aggregate
    from opentelemetry_collector_contrib_spark.training import ivf_balance

    emb = _emb(spark, sf_dir)
    return ivf_balance(ivf_assign(emb, ivf_centroids(emb, n_list=16)), n_list=16)


def _q_dup_matrix(spark, sf_dir):
    # source×source duplicate-overlap matrix over the verified fuzzy
    # pairs: diagonal = intra-source boilerplate, off-diagonal =
    # cross-source mirroring — decides where the dedup budget goes
    from opentelemetry_collector_contrib_spark.training import (
        cross_source_dup_matrix,
    )

    docs = _docs(spark, sf_dir)
    sigs = minhash_signatures(docs, n_hashes=_MINHASH_N)
    pairs = lsh_candidate_pairs(
        sigs, bands=_BANDS, rows_per_band=_ROWS, max_bucket=_LSH_MAX_BUCKET
    )
    verified = jaccard_verify_pairs(docs, pairs, threshold=0.8)
    return cross_source_dup_matrix(docs, verified)


def _q_incremental_dedup(spark, sf_dir):
    # ingest-time dedup: every doc_id%10==7 doc plays the arriving
    # batch, the rest the already-ingested corpus; Bloom-pruned exact
    # anti-join + intra-batch collapse (output bit-identical to the
    # plain anti-join twin — the Bloom stage only prunes)
    from opentelemetry_collector_contrib_spark.training import (
        incremental_dedup,
    )

    docs = _docs(spark, sf_dir)
    batch = docs.filter(F.col("doc_id") % 10 == 7)
    seen = docs.filter(F.col("doc_id") % 10 != 7)
    return incremental_dedup(batch, seen)


def _q_corpus_health(spark, sf_dir):
    # the after-every-ingest monitoring table: volumes / token mass /
    # short-doc fraction / exact-dup rate at (source,lang), (source),
    # and overall grains — ONE scan via ROLLUP (count connector's
    # GROUPING SETS posture)
    from opentelemetry_collector_contrib_spark.training import (
        corpus_health,
    )

    return corpus_health(_docs(spark, sf_dir), short_tokens=20)


def _q_semantic_decontaminate(spark, sf_dir):
    # embedding-space decontamination: every 50th vector plays the
    # eval set; train vectors with cosine >= 0.4 to ANY eval vector
    # are flagged (broadcast eval row, zero-shuffle HOF probe; 0.4
    # sits in the synthetic tables' near-dup band so the gate checks
    # real rows) — the
    # semantic twin of the shingle-based `decontaminate` query
    from opentelemetry_collector_contrib_spark.training import (
        semantic_decontaminate,
    )

    emb = _emb(spark, sf_dir)
    # eval sets are FIXED-SIZE in reality (a benchmark suite does not
    # grow with the corpus): cap the eval side at vec_id < 2500 so the
    # |train|x|eval| work scales LINEARLY with the corpus — without the
    # cap the bench's 10x table made this query 12x slower (quadratic
    # by construction, not by plan)
    is_ev = (F.col("vec_id") % 50 == 0) & (F.col("vec_id") < 2500)
    ev = emb.filter(is_ev)
    tr = emb.filter(~is_ev)
    return semantic_decontaminate(tr, ev, threshold=0.4)


def _q_winnow_pairs(spark, sf_dir):
    # the MOSS match step composed over the fingerprint table:
    # partial-copy candidate pairs ranked by shared distinct fps; the
    # df cap bounds viral-boilerplate pair expansion (quadratic
    # otherwise — same class of guard as lsh max_bucket)
    from opentelemetry_collector_contrib_spark.training import (
        winnow_fingerprints,
        winnow_match_pairs,
    )

    fps = winnow_fingerprints(_docs(spark, sf_dir), k=4, window=4)
    return winnow_match_pairs(fps, min_shared=2, max_df=50)


def _q_lsh_tuning(spark, sf_dir):
    # the banding-choice S-curve table (MMDS §3.4.2) printed before a
    # corpus-scale dedup run — the FIRST config is the headline queries'
    # own (_BANDS=4, _ROWS=2) banding; pure closed-form math, zero scans
    from opentelemetry_collector_contrib_spark.training import (
        lsh_tuning_curve,
    )

    return lsh_tuning_curve(spark)


def _q_mixture_temperature(spark, sf_dir):
    # mT5 alpha-sampling weight table over the corpus's real sources —
    # the table that feeds mixture_sample's weights dict
    from opentelemetry_collector_contrib_spark.training import (
        mixture_temperature,
    )

    return mixture_temperature(_docs(spark, sf_dir), alpha=0.3)


def _q_opq_topk(spark, sf_dir):
    # OPQ-rotated IVF-PQ (Ge et al. 2013 rotation posture, structured
    # FJLT pick): the identical PQ composition over the rotated corpus.
    # The rotation is materialized ONCE (localCheckpoint — the local-mode
    # analog of writing the rotated column, which rotate_vectors's
    # docstring prescribes for index builds): inlined, CollapseProject
    # copies the dim^2-literal rotation tree into every codebook/centroid
    # reference and plan analysis + codegen dominate (~15 s flat across
    # SFs, measured; materialized it is ~3.5 s, same values bit-for-bit
    # because evaluation order is unchanged)
    emb = rotate_vectors(_emb(spark, sf_dir)).localCheckpoint()
    cents = ivf_centroids(emb, n_list=16)
    books = pq_codebooks(emb, m=4, ks=16)
    return pq_adc_topk(
        emb, emb.filter("vec_id < 20"), books, k=5, centroids=cents, n_probe=2
    )


def _q_semdedup(spark, sf_dir):
    # SemDeDup: IVF-cluster-bucketed semantic dedup; threshold 0.2 so
    # both verdicts appear at sf0.01 (0.95 removes nothing from 500
    # synthetic vectors -> a vacuous oracle, same reasoning as
    # dedup_cosine)
    # max_cluster=200: bounded-state guard for a degenerate cluster
    # (same posture as _LSH_MAX_BUCKET / the cosine bucket cap); never
    # binds at the test SFs (max cluster 152 at sf0.1), mirrored in the
    # oracle via count(*) OVER (PARTITION BY cluster_id)
    emb = _emb(spark, sf_dir)
    return semdedup(
        emb, ivf_centroids(emb, n_list=16), threshold=0.2, max_cluster=200
    )


def _q_cosine_bucketed(spark, sf_dir):
    return cosine_pairs_bucketed(
        _emb(spark, sf_dir), threshold=0.2, n_planes=4, max_bucket=200
    )


def _q_token_stats(spark, sf_dir):
    return token_stats(_docs(spark, sf_dir))


def _q_tfidf_topk(spark, sf_dir):
    # top-5 salient terms per doc; one corpus shuffle + broadcast DF join
    return tfidf_topk(_docs(spark, sf_dir), k=5)


def _c4_structured_docs(spark, sf_dir):
    """documents restructured into deterministic multi-line pages so the
    C4 rules are non-vacuous (the synthetic corpus has no newlines or
    punctuation): words are chunked into lines of ``3 + doc_id % 4``
    words; line ``i`` gains a trailing '.' unless ``(doc_id+i) % 4 == 0``
    (25% of lines lack terminal punctuation), the token 'javascript'
    when ``(doc_id+i) % 13 == 2``, and line 0 gains the page-killing
    markers ' lorem ipsum' (``doc_id % 97 == 0``) or ' {'
    (``doc_id % 89 == 3``). Pure projection, identically computable in
    DuckDB — every C4 rule fires on a non-trivial slice of the corpus."""
    toks = tokens(F.col("text"))
    span = F.col("doc_id") % 4 + 3
    n_lines = F.ceil(F.size(toks) / span)
    idx = F.when(
        F.size(toks) > 0, F.sequence(F.lit(0).cast("long"), n_lines - 1)
    ).otherwise(F.array().cast("array<long>"))

    def mk_line(i):
        base = F.concat_ws(
            " ", F.slice(toks, (i * span + 1).cast("int"), span.cast("int"))
        )
        js = F.when(
            (F.col("doc_id") + i) % 13 == 2, F.lit(" javascript")
        ).otherwise("")
        lorem = F.when(
            (i == 0) & (F.col("doc_id") % 97 == 0), F.lit(" lorem ipsum")
        ).otherwise("")
        brace = F.when(
            (i == 0) & (F.col("doc_id") % 89 == 3), F.lit(" {")
        ).otherwise("")
        punct = F.when((F.col("doc_id") + i) % 4 != 0, F.lit(".")).otherwise("")
        return F.concat(base, js, lorem, brace, punct)

    return _docs(spark, sf_dir).select(
        "doc_id", F.array_join(F.transform(idx, mk_line), "\n").alias("text")
    )


# mixture-sampling fixture shared by the Spark query and its oracle:
# weights cycle 1..4 across the 20 sources (normalized to sum 1), and
# the token budget is absolute so the sf0.001 test exercises the
# min(1, .) keep-everything cap while sf0.01 samples genuinely
MIX_WEIGHTS = {f"src{i}": (i % 4 + 1) / 50 for i in range(20)}
MIX_BUDGET_TOKENS = 10_000


def _q_mixture_sample(spark, sf_dir):
    # token-budget data mixing; one tiny per-source agg + broadcast
    # rates join + zero-shuffle hash-threshold keep
    from opentelemetry_collector_contrib_spark.training.sampling import (
        mixture_sample,
    )

    return mixture_sample(_docs(spark, sf_dir), MIX_WEIGHTS, MIX_BUDGET_TOKENS)


def _q_dsir_sample(spark, sf_dir):
    # DSIR importance resampling (Xie et al. 2023): hashed-unigram
    # importance weights vs the lang='en' target slice, Gumbel top-k
    # draw; scaled-int weights so every aggregate is order-proof
    from opentelemetry_collector_contrib_spark.training import dsir_sample

    return dsir_sample(
        _docs(spark, sf_dir), F.col("lang") == "en", k=100, n_buckets=256
    )


def _q_domain_quota(spark, sf_dir):
    # RefinedWeb-style domain curation: blocklist + per-domain quota of
    # the 5 best-quality docs, via the skew-safe salted two-phase top-k
    from opentelemetry_collector_contrib_spark.training import domain_quota

    return domain_quota(
        _docs(spark, sf_dir), max_per_domain=5, blocklist=("src0", "src13")
    )


def _q_curation_funnel(spark, sf_dir):
    """End-to-end curation funnel — the composition a training-data
    pipeline actually runs, as ONE plan: Gopher quality gate ∩ bigram-LM
    cross-entropy threshold ∩ token-budget mixture draw. Each stage is
    the same operator its standalone query verifies; the funnel proves
    they compose (shared scans, no materialization boundaries between
    stages)."""
    from opentelemetry_collector_contrib_spark.training import lm_score
    from opentelemetry_collector_contrib_spark.training.sampling import (
        mixture_sample,
    )
    from opentelemetry_collector_contrib_spark.training.textstats import (
        gopher_quality_filter,
    )

    docs = _docs(spark, sf_dir)
    # min_words=20 mirrors _q_gopher_gate (the oracle CTE is that
    # query's SQL verbatim; the paper's 50-word floor would reject most
    # of the short fixture docs)
    gated = gopher_quality_filter(docs, min_words=20).select("doc_id", "n_words")
    scored = lm_score(docs).filter("xent_q4 <= 34000")
    mixed = mixture_sample(docs, MIX_WEIGHTS, MIX_BUDGET_TOKENS)
    return (
        gated.join(scored, "doc_id")
        .join(mixed, "doc_id")
        .select(
            "doc_id", "source", "n_words", "n_bigrams", "xent_q4", "n_tokens"
        )
    )


def _q_lm_score(spark, sf_dir):
    # bigram-LM cross-entropy quality scores; corpus tokenized once,
    # model joins shuffle on the bigram key
    from opentelemetry_collector_contrib_spark.training import lm_score

    return lm_score(_docs(spark, sf_dir))


def _q_ccnet_buckets(spark, sf_dir):
    # the CCNet head/middle/tail split (Wenzek et al. 2020 §4.3): LM
    # perplexity tertiles assign each doc a quality bucket. Thresholds
    # come from the integer quantile SKETCH (never a full sort — the
    # p33/p66 of 100 TB of scores from <= 128 histogram rows); the
    # score table is localCheckpoint-ed once (doc-count-sized — the
    # write-then-label posture of a real pipeline), the 1-row threshold
    # frame broadcasts back, labeling is a zero-shuffle projection.
    from opentelemetry_collector_contrib_spark.training import lm_score
    from opentelemetry_collector_contrib_spark.training.sketches import (
        hist_quantile_sketch,
    )

    scored = lm_score(_docs(spark, sf_dir)).localCheckpoint()
    sk = hist_quantile_sketch(scored, "xent_q4", ps=(0.33, 0.66))
    thr = sk.agg(
        F.min(F.when(F.col("p") < 0.5, F.col("est"))).alias("t33"),
        F.min(F.when(F.col("p") >= 0.5, F.col("est"))).alias("t66"),
    )
    lab = (
        F.when(F.col("xent_q4").isNull(), F.lit("unscored"))
        .when(F.col("xent_q4") <= F.col("t33"), F.lit("head"))
        .when(F.col("xent_q4") <= F.col("t66"), F.lit("middle"))
        .otherwise(F.lit("tail"))
    )
    return scored.crossJoin(F.broadcast(thr)).select(
        "doc_id", "n_bigrams", "xent_q4", lab.alias("ppl_bucket")
    )


def _q_c4_line_filter(spark, sf_dir):
    # C4 line+page cleanup over the deterministically line-structured
    # corpus; zero-shuffle projection + filter
    from opentelemetry_collector_contrib_spark.training import c4_line_filter

    return c4_line_filter(_c4_structured_docs(spark, sf_dir))


def _q_quality(spark, sf_dir):
    return quality_score(_docs(spark, sf_dir))


def _q_quality_linear(spark, sf_dir):
    # model-based filtering (fastText/CCNet posture): hashed-BoW linear
    # classifier as ONE zero-shuffle projection; the weight table is a
    # plan literal both engines derive from the same three integers
    from opentelemetry_collector_contrib_spark.training.classify import (
        hashed_logit_score,
        pseudo_weights_q4,
    )

    return hashed_logit_score(_docs(spark, sf_dir), pseudo_weights_q4())


def _q_lang_id(spark, sf_dir):
    return lang_id(_docs(spark, sf_dir))


def _q_source_kl(spark, sf_dir):
    # mixture diagnostics: per-source hashed-unigram KL vs the corpus
    # blend (the monitoring twin of mixture_sample/dsir_sample) — one
    # corpus pass, everything after runs on a sources x 256 count table
    from opentelemetry_collector_contrib_spark.training.sampling import (
        source_kl_divergence,
    )

    return source_kl_divergence(_docs(spark, sf_dir))


def _q_fingerprint(spark, sf_dir):
    return fingerprint(_docs(spark, sf_dir))


def _q_chunk_documents(spark, sf_dir):
    from opentelemetry_collector_contrib_spark.training.chunking import (
        chunk_documents,
    )

    return chunk_documents(_docs(spark, sf_dir), window=16, overlap=4)


def _q_vocab_topk(spark, sf_dir):
    from opentelemetry_collector_contrib_spark.training.chunking import (
        vocab_topk,
    )

    return vocab_topk(_docs(spark, sf_dir), k=50)


def _q_repetition_stats(spark, sf_dir):
    from opentelemetry_collector_contrib_spark.training.textstats import (
        repetition_stats,
    )

    return repetition_stats(_docs(spark, sf_dir))


def _q_gopher_gate(spark, sf_dir):
    # min_words=20 keeps the gate non-vacuous on the short sf fixture
    # docs (the paper's 50-word floor would reject most of them)
    from opentelemetry_collector_contrib_spark.training.textstats import (
        gopher_quality_filter,
    )

    return gopher_quality_filter(_docs(spark, sf_dir), min_words=20)


def _q_multimodal(spark, sf_dir):
    return extract_features(binary_table(_docs(spark, sf_dir)))


def _q_sketch_bloom(spark, sf_dir):
    """Bloom membership: build over the even-doc_id half of the corpus
    ("already trained"), probe every doc — evens are guaranteed hits
    (no false negatives), odds surface only as (m,k,n)-rate false
    positives."""
    from opentelemetry_collector_contrib_spark.training import (
        bloom_build,
        bloom_probe,
    )

    docs = _docs(spark, sf_dir)
    bits = bloom_build(
        docs.filter(F.col("doc_id") % 2 == 0), n_hashes=_BLOOM_K, m_bits=_BLOOM_M
    )
    return bloom_probe(docs, bits, n_hashes=_BLOOM_K, m_bits=_BLOOM_M)


def _q_sketch_cms(spark, sf_dir):
    """Count-min frequency estimates for the 20 true-top tokens, next
    to the exact counts (CM guarantee: estimate >= truth, overshoot
    bounded by the d x w sizing)."""
    from opentelemetry_collector_contrib_spark.training import (
        cms_build,
        cms_estimate,
    )

    toks = _docs(spark, sf_dir).select(
        F.explode(tokens(F.col("text"))).alias("tok")
    )
    sketch = cms_build(toks, "tok", depth=_CMS_D, width=_CMS_W)
    cand = (
        toks.groupBy("tok")
        .agg(F.count(F.lit(1)).alias("true_count"))
        .orderBy(F.desc("true_count"), "tok")
        .limit(20)
    )
    est = cms_estimate(cand, sketch, "tok", depth=_CMS_D, width=_CMS_W)
    return cand.join(est, "tok").select("tok", "true_count", "cms_est")


def _q_sketch_hll(spark, sf_dir):
    """HyperLogLog distinct-3-shingle estimate (the sizing signal for
    shingle-based dedup) next to the exact count."""
    from opentelemetry_collector_contrib_spark.training import corpus_distinct_hll

    return corpus_distinct_hll(_docs(spark, sf_dir), m=_HLL_M, k_shingle=3)


def _q_pii_scrub(spark, sf_dir):
    """PII scrub over a deterministically PII-seeded corpus (the
    synthetic documents carry no natural identifiers, so both engines
    append the same email / IPv4 per doc_id residue — the in-query
    derivation pattern c4_line_filter uses): per-doc match counts +
    masked text."""
    from opentelemetry_collector_contrib_spark.training import pii_scrub

    d = F.col("doc_id")
    seeded = _docs(spark, sf_dir).withColumn(
        "text",
        F.when(
            d % 3 == 0,
            F.concat(
                F.col("text"),
                F.lit(" contact user"),
                d.cast("string"),
                F.lit("@example.com now"),
            ),
        )
        .when(
            d % 3 == 1,
            F.concat(
                F.col("text"),
                F.lit(" server at 10."),
                (d % 256).cast("string"),
                F.lit("."),
                (d % 200).cast("string"),
                F.lit("."),
                (d % 250).cast("string"),
                F.lit(" up"),
            ),
        )
        .otherwise(F.col("text")),
    )
    return pii_scrub(seeded).select("doc_id", "n_email", "n_ipv4", "scrubbed")


def _q_sketch_hist(spark, sf_dir):
    """Histogram-sketch quantiles of document length (p50/p90/p99 of
    n_chars from fixed 128-bucket state — the 'p99 doc length over
    100 TB' question without a full-column sort)."""
    from opentelemetry_collector_contrib_spark.training import hist_quantile_sketch

    return hist_quantile_sketch(
        _docs(spark, sf_dir), "n_chars", 128, (0.5, 0.9, 0.99)
    )


def _q_join_asof(spark, sf_dir):
    """As-of join: every purchase event gains the user's most recent
    at-or-before click (ref_*), or nulls when no click precedes it.
    The click timeline is pre-aggregated to one row per (user_id, ts)
    — max event_id wins — so "most recent" is total-ordered; the
    DuckDB twin is a native ASOF LEFT JOIN over the same deduped
    timeline."""
    from opentelemetry_collector_contrib_spark.operators import join_asof

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    left = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", "value"
    )
    timeline = (
        ev.filter(F.col("event_type") == "click")
        .groupBy("user_id", "ts")
        .agg(
            F.max("event_id").alias("event_id"),
            F.max_by("value", "event_id").alias("value"),
        )
    )
    return join_asof(left, timeline, "user_id", "ts", ["event_id", "value"])


def _q_join_range(spark, sf_dir):
    """Range join: purchases inside the half-open hour after a signup
    by the same user (a purchase inside k overlapping windows emits k
    rows). Bucketized equi-join on (user_id, hour-bucket) + exact
    containment — never the naive inequality join (quadratic per hot
    key); the DuckDB twin IS the naive inequality join."""
    from opentelemetry_collector_contrib_spark.operators import join_range

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    facts = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", "value"
    )
    ivs = ev.filter(F.col("event_type") == "signup").select(
        "user_id",
        F.col("ts").alias("start_ts"),
        (F.col("ts") + F.expr("INTERVAL 1 HOUR")).alias("end_ts"),
        F.col("event_id").alias("signup_event_id"),
    )
    return join_range(facts, ivs, "user_id", "ts", "start_ts", "end_ts", 3600)


def _q_hypertable_rollup(spark, sf_dir):
    """Continuous aggregate: hourly AND daily per-event-type counts +
    value sums from ONE scan (GROUPING SETS). sum(value) is scaled-int
    before the sum (value is 2-dp) so the aggregate is
    partition-order-proof; one float division at the end."""
    from opentelemetry_collector_contrib_spark.operators import hypertable_rollup

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    return hypertable_rollup(
        ev,
        "ts",
        [("1h", "hour"), ("1d", "day")],
        ["event_type"],
        [
            F.count(F.lit(1)).alias("n_events"),
            (F.sum(F.round(F.col("value") * 100).cast("bigint")) / F.lit(100.0)).alias(
                "sum_value"
            ),
        ],
    )


def _q_split_hash(spark, sf_dir):
    # deterministic train/val/test assignment over documents
    from opentelemetry_collector_contrib_spark.training.splits import hash_split

    return hash_split(_docs(spark, sf_dir), key_col="doc_id").select(
        "doc_id", "split"
    )


def _q_split_cluster_safe(spark, sf_dir):
    # leakage-safe split: the coin keys on a grouping label so co-grouped
    # docs co-assign (label frame here = a deterministic derived grouping;
    # production feeds dedup.duplicate_clusters labels)
    from opentelemetry_collector_contrib_spark.training.splits import (
        cluster_safe_split,
    )

    d = _docs(spark, sf_dir)
    labels = d.filter(F.col("doc_id") % 3 != 0).select(
        "doc_id", F.floor(F.col("doc_id") / 10).alias("cluster")
    )
    return cluster_safe_split(d, labels).select("doc_id", "split")


def _q_shuffle_order(spark, sf_dir):
    # epoch-stable global training order: (shard, pos) pure in (seed, id)
    from opentelemetry_collector_contrib_spark.training.splits import (
        deterministic_shuffle,
    )

    return deterministic_shuffle(_docs(spark, sf_dir), n_shards=16).select(
        "doc_id", "shard", "pos"
    )


def _q_token_budget_cut(spark, sf_dir):
    # global quality cut under a token budget (FineWeb "best B tokens"):
    # top-bins + boundary-bin rank, no global sort
    from opentelemetry_collector_contrib_spark.training.curation import (
        token_budget_cut,
    )

    d = _docs(spark, sf_dir).select(
        "doc_id",
        (F.col("n_chars") % 100).cast("double").alias("score"),
        (F.col("n_chars") % 50 + 1).cast("bigint").alias("toks"),
    )
    return token_budget_cut(d, "score", "toks", budget=6000).select(
        "doc_id", "score", "toks"
    )


def _q_pq_residual_topk(spark, sf_dir):
    # IVFADC, the canonical residual composition (Jegou et al. 2011
    # §IV): codes quantize x - q1(x), and each probed list scores the
    # query in THAT list's residual space — the lower-quantization-
    # error variant of ann_pq_topk (which quantizes raw vectors).
    # Codebooks train on the ks md5-order samples AFTER the coarse
    # sample (a vector's residual against its own centroid is zero).
    emb = _emb(spark, sf_dir)
    cents = ivf_centroids(emb, n_list=16)
    books = pq_residual_codebooks(emb, cents, m=4, ks=16)
    return pq_adc_topk(
        emb,
        emb.filter("vec_id < 20"),
        books,
        k=5,
        centroids=cents,
        n_probe=2,
        residual=True,
    )


def _q_transform_datapoint(spark, sf_dir):
    # OTTL datapoint context e2e (r05): ordered transform statements +
    # datapoint filter over a one-row-per-datapoint metric frame —
    # metric.* struct reads/writes, attributes writes, value_double /
    # count paths, where guards, then the filterprocessor
    # metrics.datapoint drop branch
    # (processor/transformprocessor/internal/metrics/processor.go,
    # pkg/ottl/contexts/ottldatapoint/datapoint.go:185-260)
    from opentelemetry_collector_contrib_spark.envelope import try_element_at
    from opentelemetry_collector_contrib_spark.processors.datapoints import (
        DataPointFilter,
        DataPointTransform,
    )

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    m3 = F.col("event_id") % 3
    frame = ev.select(
        "event_id",
        F.when(m3 == 0, "req").when(m3 == 1, "cpu").otherwise("lat").alias(
            "metric_name"
        ),
        F.when(m3 == 0, "sum").when(m3 == 1, "gauge").otherwise(
            "histogram"
        ).alias("metric_type"),
        F.when(m3 == 0, "cumulative").when(m3 == 2, "delta").alias(
            "temporality"
        ),
        F.when(m3 == 0, F.lit(True)).alias("is_monotonic"),
        F.when(m3 == 0, "1").when(m3 == 1, "%").otherwise("ms").alias("unit"),
        F.lit(None).cast("string").alias("description"),
        F.when(m3 <= 1, F.col("value")).alias("value"),
        F.when(m3 == 2, (F.col("event_id") % 100).cast("long")).alias("count"),
        F.map_from_arrays(
            F.array(F.lit("src")), F.array(F.col("event_type"))
        ).alias("attributes"),
        "ts",
    )
    xform = DataPointTransform(
        [
            'set(metric.unit, "1/s") where metric.name == "cpu"',
            'set(attributes["vband"], String(Int(value_double * 10.0))) '
            'where metric.name == "cpu"',
            'set(attributes["big"], "true") where count >= 50',
            'set(metric.description, Concat([metric.name, metric.type], ":"))',
        ]
    )
    filt = DataPointFilter(['metric.name == "lat" and count < 10'])
    out = filt(xform(frame))
    return out.select(
        "event_id",
        "metric_name",
        "metric_type",
        "unit",
        "description",
        try_element_at(F.col("attributes"), F.lit("src")).alias("src"),
        try_element_at(F.col("attributes"), F.lit("vband")).alias("vband"),
        try_element_at(F.col("attributes"), F.lit("big")).alias("big"),
        F.coalesce("value", F.lit(-1.0)).alias("value"),
        F.coalesce("count", F.lit(-1)).alias("count"),
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    q = {
        # Order matters: the driver verifies the FIRST 50 entries against
        # their DuckDB oracles. Rotated each round so every query earns a
        # driver CORRECTNESS row (r04 window: the 18 never-checked + the
        # ANSI-fixed expo query + the 20 last green in r02 + 11 core ops).
        # r05 rotation plan: front-load the entries past this window that
        # have never had a driver row — ann_recall through pack_stats,
        # the four added late in r04 (split_train_val_test,
        # split_cluster_safe, shuffle_order, token_budget_cut) — and
        # rotate the r04-green ones behind.
        "flagship": _q_flagship,
        "filter_metrics": _q_filter_metrics,
        "metrics_combine_captures": _q_metrics_combine_captures,
        "sumologic_shape": _q_sumologic_shape,
        "schema_translate": _q_schema_translate,
        "k8sattributes": _q_k8sattributes,
        "span_rename": _q_span_rename,
        "tail_sampling_invert": _q_tail_invert,
        "tail_sampling_span_count": _q_tail_span_count,
        "dedup_clusters": _q_dedup_clusters,
        "curation_select": _q_curation,
        "ann_ivf_assign": _q_ann_ivf_assign,
        "ann_ivf_topk": _q_ann_ivf_topk,
        "ann_ivf_kmeans": _q_ann_ivf_kmeans,
        "text_repetition_stats": _q_repetition_stats,
        "quality_gate_gopher": _q_gopher_gate,
        "chunk_documents": _q_chunk_documents,
        "vocab_topk": _q_vocab_topk,
        "delta_to_cumulative_expo": _q_expo_cumulative,
        "text_lm_score": _q_lm_score,
        # new in r04 (late): temporal custom operators the brief names
        # (as-of join, hypertable rollup); sampler_equalizing and
        # metrics_transform (both pass-r3) rotate out to make room
        "join_asof": _q_join_asof,
        "join_range": _q_join_range,
        "hypertable_rollup": _q_hypertable_rollup,
        "mixture_sample": _q_mixture_sample,
        "ann_opq_topk": _q_opq_topk,
        "dedup_exact": _q_dedup_exact,
        "dedup_minhash_lsh": _q_dedup_lsh,
        # new in this session, never driver-checked: the LSH->exact-
        # Jaccard verify composition (doc_fingerprint, r02+r03 green,
        # operator untouched this round, rotates out to make room)
        "dedup_lsh_verified": _q_lsh_verified,
        # new in r04 (this session), never driver-checked: the COMPLETE
        # verified fuzzy-dedup funnel (dedup_embedding_cosine, r02-green
        # on an untouched operator, rotates out to make room)
        "fuzzy_dedup_funnel": _q_fuzzy_dedup_funnel,
        "dedup_passage": _q_passage_dedup,
        "curation_funnel": _q_curation_funnel,
        # new in this session, never driver-checked: DSIR importance
        # resampling and the per-domain quota (skew-safe salted top-k);
        # dedup_ngram_jaccard and multimodal_features (both r02-green,
        # operators untouched since) rotate out to make room
        "dsir_sample": _q_dsir_sample,
        "domain_quota": _q_domain_quota,
        # new in r04 (this session), never driver-checked: per-source
        # KL mixture diagnostics (text_lang_id, r02-green on an
        # untouched operator, rotates out to make room)
        "source_kl_divergence": _q_source_kl,
        "c4_line_filter": _q_c4_line_filter,
        # text_token_stats (pass-r3) rotates out for the PII scrub
        "pii_scrub": _q_pii_scrub,
        # new in this session, never driver-checked: BPE merge learning
        # (ann_lsh_buckets, r02-green, operator untouched, rotates out)
        "bpe_merges": _q_bpe_merges,
        # the encode path of the same op (grafanacloud_hosts —
        # judge-r3-verified MATCH, operator untouched since — rotates
        # out to keep both BPE ends inside the window)
        "bpe_tokenize": _q_bpe_tokenize,
        # new in r04 (this session), never driver-checked: the CCNet
        # perplexity-tertile split (ann_lsh_topk, r02-green on an
        # untouched operator, rotates out to make room)
        "ccnet_ppl_buckets": _q_ccnet_buckets,
        "dedup_cosine_bucketed": _q_cosine_bucketed,
        # new in r04 (this session), never driver-checked: the hashed
        # linear classifier — model-based filtering joins the heuristic /
        # rule / LM-perplexity filter families (text_quality_score and
        # text_lang_id, both r02-green on untouched operators, rotate
        # out to make room)
        "quality_linear_logit": _q_quality_linear,
        # new in r04 (late): the probabilistic-sketch family — fixed-size
        # summaries of corpus-sized questions (membership / frequency /
        # cardinality); transcripts_derive, transform_ottl and recombine
        # (all pass-r3) rotate out to keep these inside the window
        "sketch_bloom": _q_sketch_bloom,
        "sketch_cms_topk": _q_sketch_cms,
        "sketch_hll_shingles": _q_sketch_hll,
        # tail_sampling (pass-r3) rotates out for the quantile sketch
        "sketch_hist_quantiles": _q_sketch_hist,
        # new in r04, never driver-checked: the spanevent OTTL context,
        # SemDeDup, the IVF-PQ ANN pair, and TF-IDF keywords all sit
        # inside the window (parse_csv / parse_regex / parse_syslog /
        # parse_uri, long-green since r02/r03, rotated out to make room)
        "transform_spanevent": _q_transform_spanevent,
        "dedup_semantic_semdedup": _q_semdedup,
        "ann_pq_encode": _q_pq_encode,
        "ann_pq_topk": _q_pq_topk,
        # new in r04 (this session), never driver-checked: the FAISS
        # refine stage (text_tfidf_topk — judge-audited green this
        # round via the sweep; its operator is untouched — rotates out)
        "ann_pq_rerank": _q_pq_rerank,
        # --- end of the driver's 50-query window ---
        # (text_quality_score / text_lang_id / dedup_embedding_cosine,
        # all r02-green on untouched operators, rotated out for the
        # three new r04 ops: quality_linear_logit, fuzzy_dedup_funnel,
        # source_kl_divergence)
        # new in r04 but past the window (sweep-verified ANSI-on; the
        # window is full of never-driver-checked entries — rotates in
        # next round): the ANN recall@k tuning metric
        "ann_recall": _q_ann_recall,
        "split_train_val_test": _q_split_hash,
        "split_cluster_safe": _q_split_cluster_safe,
        "shuffle_order": _q_shuffle_order,
        "token_budget_cut": _q_token_budget_cut,
        "dedup_lines_corpus": _q_line_dedup,
        "lsh_tuning_curve": _q_lsh_tuning,
        "mixture_temperature": _q_mixture_temperature,
        "winnow_fingerprints": _q_winnow,
        "winnow_match_pairs": _q_winnow_pairs,
        "decontaminate_semantic": _q_semantic_decontaminate,
        "corpus_health": _q_corpus_health,
        "dedup_incremental": _q_incremental_dedup,
        "dedup_source_matrix": _q_dup_matrix,
        "ann_ivf_balance": _q_ivf_balance,
        "text_token_entropy": _q_token_entropy,
        "text_compression_ratio": _q_compression_ratio,
        "dedup_sig_estimate": _q_sig_estimate,
        "dedup_cluster_hist": _q_cluster_hist,
        "pack_stats": _q_pack_stats,
        "text_tfidf_topk": _q_tfidf_topk,
        "text_quality_score": _q_quality,
        # rotated out for the temporal / quantile-sketch / pii-scrub
        # queries (all pass-r3 green), plus dedup_ngram_jaccard and
        # multimodal_features (r02-green, untouched) for the DSIR and
        # domain-quota queries:
        "text_lang_id": _q_lang_id,
        "dedup_embedding_cosine": _q_dedup_cosine,
        "ann_lsh_topk": _q_ann_lsh_topk,
        "dedup_ngram_jaccard": _q_dedup_jaccard,
        "multimodal_features": _q_multimodal,
        "doc_fingerprint": _q_fingerprint,
        "ann_lsh_buckets": _q_ann_lsh,
        "grafanacloud_hosts": _q_grafanacloud_hosts,
        "text_token_stats": _q_token_stats,
        "tail_sampling": _q_tail_sampling,
        "count_connector": _q_counts,
        "sampler_equalizing": _q_sampler_equalizing,
        "metrics_transform": _q_metrics_transform,
        # rotated out for the three sketch queries (all pass-r3 green):
        "transcripts_derive": _q_transcripts,
        "transform_ottl": _q_ottl,
        "recombine": _q_recombine,
        # rotated out for the four new r04 queries (c4_line_filter,
        # text_lm_score, mixture_sample, ann_opq_topk):
        # ann_bruteforce_topk, sampler_proportional, metrics_generation
        # and groupbytrace — all r02-green and untouched since; the ANN
        # family keeps 6 in-window rows (ivf x3 + pq x2 + opq), the
        # sampler family keeps sampler_equalizing + the two hash
        # samplers, metrics keep metrics_transform + transform_metric_ctx
        # + the state trio, traces keep tail_sampling + its two policies
        "ann_bruteforce_topk": _q_ann_topk,
        "sampler_proportional": _q_sampler_proportional,
        "metrics_generation": _q_metrics_generation,
        "groupbytrace": _q_groupbytrace,
        "dedup_simhash": _q_dedup_simhash,
        "parse_csv": _q_parse_csv,
        "parse_regex": _q_parse_regex,
        "parse_syslog": _q_parse_syslog,
        "parse_uri": _q_parse_uri,
        "parse_json": _q_parse_json,
        "attributes_processor": _q_attributes,
        "parse_time_severity": _q_parse_time_severity,
        "enrich_lookup": _q_enrich,
        "enrich_geoip": _q_enrich_geoip,
        "route_match_once": _q_route_once,
        "route_multi_match": _q_route_multi,
        "recombine_sessions": _q_recombine_sessions,
        "filter_processor": _q_filter,
        "filter_spans": _q_filter_spans,
        "parse_kv": _q_parse_kv,
        "parse_kv_reference": _q_parse_kv_reference,
        "redaction": _q_redaction,
        "groupbyattrs": _q_groupbyattrs,
        "spanmetrics_hist": _q_spanmetrics,
        "spanmetrics_calls": _q_spanmetrics_calls,
        "delta_to_cumulative": _q_delta_to_cumulative,
        "cumulative_to_delta": _q_cumulative_to_delta,
        "cumulative_to_delta_mono": _q_cumulative_to_delta_mono,
        "expo_widen_zero": _q_expo_widen_zero,
        "delta_to_rate_ref": _q_delta_to_rate_ref,
        "transform_metric_ctx": _q_transform_metric_ctx,
        "sample_stratified": _q_sample_stratified,
        "quantize_int8": _q_quantize_int8,
        "decontaminate": _q_decontaminate,
        "delta_to_cumulative_guarded": _q_delta_to_cumulative_guarded,
        "pack_sequences": _q_pack_sequences,
        "pack_nosplit": _q_pack_nosplit,
        "bpe_token_count": _q_bpe_token_count,
        "delta_to_rate": _q_delta_to_rate,
        "interval_last": _q_interval_last,
        "servicegraph_spanpair": _q_servicegraph_spanpair,
        "count_spans_signal": _q_count_spans_signal,
        "servicegraph_edges": _q_servicegraph,
        "servicegraph_hist": _q_servicegraph_hist,
        "exceptions_metrics": _q_exceptions_metrics,
        "exceptions_logs": _q_exceptions_logs,
        "parse_container": _q_parse_container,
        "sampler_deterministic": _q_sampler,
        "sampler_fnv": _q_sampler_fnv,
        # new in r05: the OTTL datapoint context (the 7th and last
        # reference OTTL context namespace) and the IVFADC residual
        # composition (the canonical Jegou et al. variant)
        "transform_datapoint": _q_transform_datapoint,
        "ann_pq_residual_topk": _q_pq_residual_topk,
    }
    # r05 driver-window rotation: the driver verifies the FIRST 50
    # entries, so front-load (a) the 22 entries that have never had a
    # driver CORRECTNESS row (all verified MATCH against their DuckDB
    # oracles in the r04 full-registry sweep), (b) the operators touched
    # this round (tail_sampling composite vectorization, spanmetrics
    # dimension validation, token_budget_cut boundary-bin fix — the last
    # already in (a)), then (c) the oldest driver-green entries (r02/r03,
    # rotated out in r04) so every registry entry keeps a recent row.
    window = [
        # (a) never driver-checked
        "ann_recall",
        "split_train_val_test",
        "split_cluster_safe",
        "shuffle_order",
        "token_budget_cut",
        "dedup_lines_corpus",
        "lsh_tuning_curve",
        "mixture_temperature",
        "winnow_fingerprints",
        "winnow_match_pairs",
        "decontaminate_semantic",
        "corpus_health",
        "dedup_incremental",
        "dedup_source_matrix",
        "ann_ivf_balance",
        "text_token_entropy",
        "text_compression_ratio",
        "dedup_sig_estimate",
        "dedup_cluster_hist",
        "pack_stats",
        "text_tfidf_topk",
        "grafanacloud_hosts",
        # (b) operators new/touched in r05
        "transform_datapoint",
        "ann_pq_residual_topk",
        "tail_sampling",
        "tail_sampling_invert",
        "tail_sampling_span_count",
        "spanmetrics_hist",
        "spanmetrics_calls",
        # (c) oldest driver rows first (r02-green, rotated out in r04)
        "text_quality_score",
        "text_lang_id",
        "dedup_embedding_cosine",
        "ann_bruteforce_topk",
        "sampler_proportional",
        "metrics_generation",
        "groupbytrace",
        "dedup_ngram_jaccard",
        "multimodal_features",
        "doc_fingerprint",
        "ann_lsh_buckets",
        "ann_lsh_topk",
        "dedup_simhash",
        # pass-r3, rotated out in r04
        "text_token_stats",
        "transcripts_derive",
        "transform_ottl",
        "recombine",
        "sampler_equalizing",
        "metrics_transform",
        "count_connector",
        "parse_csv",
    ]
    ordered = {k: q[k] for k in window}
    ordered.update((k, v) for k, v in q.items() if k not in ordered)
    return ordered


def oracle_sql() -> dict[str, str]:
    counts_sql = f"""{_BASE_CTES}
SELECT 'log.record.count' AS metric_name, route, role, count(*)::BIGINT AS count
FROM routed GROUP BY route, role
UNION ALL
SELECT 'log.error.count' AS metric_name, route, NULL AS role,
       sum(CASE WHEN severity_number >= 17 THEN 1 ELSE 0 END)::BIGINT AS count
FROM routed GROUP BY route
HAVING sum(CASE WHEN severity_number >= 17 THEN 1 ELSE 0 END) > 0"""
    sqls = {
        "flagship": counts_sql,
        "count_connector": counts_sql,
        "transcripts_derive": f"WITH {TRANSCRIPTS_ORACLE_CTE.strip()} SELECT * FROM transcripts",
        "parse_regex": f"""{_BASE_CTES}
SELECT conv_id, turn_idx, {', '.join(_GROUPS)} FROM parsed""",
        "parse_time_severity": f"""{_BASE_CTES}
SELECT conv_id, turn_idx,
  try_strptime(at, '%Y-%m-%dT%H:%M:%S') AS event_ts,
  {_SEV_NUM} AS severity_number,
  upper(level) AS severity_text
FROM parsed""",
        "enrich_lookup": f"""{_BASE_CTES}
SELECT conv_id, turn_idx, tool, tool_category, risk_level, role_group FROM enriched""",
        "enrich_geoip": """WITH fact AS (
  SELECT event_id,
         '10.' || (event_id % 40) || '.' || ((event_id * 7) % 256)
              || '.' || ((event_id * 13) % 256) AS ip
  FROM events),
ipint AS (
  SELECT event_id, ip,
         string_split(ip, '.')[1]::BIGINT * 16777216
       + string_split(ip, '.')[2]::BIGINT * 65536
       + string_split(ip, '.')[3]::BIGINT * 256
       + string_split(ip, '.')[4]::BIGINT AS ip_int
  FROM fact),
dim AS (
  SELECT n_name AS geo_name, n_regionkey,
         10::BIGINT * 16777216 + n_nationkey::BIGINT * 65536 AS net_start,
         10::BIGINT * 16777216 + n_nationkey::BIGINT * 65536 + 65535 AS net_end
  FROM nation)
SELECT f.event_id, f.ip, d.geo_name,
       coalesce(d.n_regionkey, -1) AS geo_regionkey
FROM ipint f LEFT JOIN dim d ON f.ip_int BETWEEN d.net_start AND d.net_end""",
        "route_match_once": f"""{_BASE_CTES}
SELECT conv_id, turn_idx, route FROM routed""",
        "route_multi_match": f"""{_BASE_CTES}
SELECT conv_id, turn_idx, 'sink_errors' AS route FROM enriched WHERE level IN ('ERROR','FATAL')
UNION ALL
SELECT conv_id, turn_idx, 'sink_exec' AS route FROM enriched WHERE tool_category = 'exec'
UNION ALL
SELECT conv_id, turn_idx, 'sink_default' AS route FROM enriched
WHERE NOT (coalesce(level IN ('ERROR','FATAL'), false)
           OR coalesce(tool_category = 'exec', false))""",
        "recombine": f"""WITH {TRANSCRIPTS_ORACLE_CTE.strip()}
SELECT conv_id, min(turn_idx) AS turn_idx, arg_min(role, turn_idx) AS role,
       string_agg(text, chr(10) ORDER BY turn_idx) AS text,
       arg_min(tool, turn_idx) AS tool, arg_min(ts, turn_idx) AS ts
FROM transcripts GROUP BY conv_id""",
        "recombine_sessions": f"""WITH {TRANSCRIPTS_ORACLE_CTE.strip()},
g AS (SELECT *, sum(CASE WHEN turn_idx % 5 = 0 THEN 1 ELSE 0 END)
               OVER (PARTITION BY conv_id ORDER BY turn_idx) AS grp
      FROM transcripts)
SELECT conv_id, min(turn_idx) AS turn_idx,
       string_agg(text, chr(10) ORDER BY turn_idx) AS text
FROM g GROUP BY conv_id, grp""",
        "filter_spans": f"""WITH {TRANSCRIPTS_ORACLE_CTE.strip()}
SELECT conv_id AS trace_id,
       conv_id || '#' || CAST(turn_idx AS VARCHAR) AS span_id,
       'turn-' || role AS span_name,
       CASE WHEN role = 'user' THEN 'SPAN_KIND_CLIENT'
            WHEN role = 'tool' THEN 'SPAN_KIND_SERVER'
            ELSE 'SPAN_KIND_INTERNAL' END AS span_kind,
       CASE WHEN turn_idx % 5 = 0 THEN 'STATUS_CODE_ERROR'
            ELSE 'STATUS_CODE_OK' END AS status_code
FROM transcripts
WHERE turn_idx <> 3 AND role <> 'user'""",
        "filter_processor": f"""WITH {TRANSCRIPTS_ORACLE_CTE.strip()}
SELECT conv_id, turn_idx, role, tool FROM transcripts
WHERE NOT (coalesce(role = 'system', false) OR coalesce(tool = 'none', false))""",
        "attributes_processor": f"""{_BASE_CTES}
SELECT conv_id, turn_idx, 'prod' AS env,
       CASE WHEN k IS NULL THEN '0' ELSE k END AS k,
       CAST(dur_ms AS BIGINT) AS dur_ms,
       CASE WHEN regexp_matches(at, '(\\d{{4}}-\\d{{2}}-\\d{{2}})')
            THEN regexp_extract(at, '(\\d{{4}}-\\d{{2}}-\\d{{2}})', 1) END AS day_part
FROM parsed""",
        "transform_ottl": f"""WITH {TRANSCRIPTS_ORACLE_CTE.strip()}
SELECT conv_id, turn_idx, upper(role) AS role,
       CASE WHEN len(text) > 80 THEN 'hot' END AS flag,
       regexp_replace(text, 'code=\\d+', 'code=*', 'g') AS text
FROM transcripts""",
        "parse_json": """SELECT event_id, json_extract_string(props, '$.k') AS k_prop FROM events""",
        "parse_kv_reference": f"""WITH {TRANSCRIPTS_ORACLE_CTE.strip()}
SELECT conv_id, turn_idx,
  role || ' turn' AS kv_role,
  tool AS kv_tool,
  CAST(turn_idx AS VARCHAR) AS kv_idx
FROM transcripts""",
        "parse_kv": f"""WITH {TRANSCRIPTS_ORACLE_CTE.strip()}
SELECT conv_id, turn_idx,
  CASE WHEN regexp_matches(text, '(^| )evt=') THEN regexp_extract(text, '(^| )evt=(\\S+)', 2) END AS evt,
  CASE WHEN regexp_matches(text, '(^| )code=') THEN regexp_extract(text, '(^| )code=(\\S+)', 2) END AS code,
  CASE WHEN regexp_matches(text, '(^| )dur_ms=') THEN regexp_extract(text, '(^| )dur_ms=(\\S+)', 2) END AS dur_ms,
  CASE WHEN regexp_matches(text, '(^| )k=') THEN regexp_extract(text, '(^| )k=(\\S+)', 2) END AS k
FROM transcripts""",
        "parse_csv": f"""WITH {TRANSCRIPTS_ORACLE_CTE.strip()}
SELECT conv_id, turn_idx,
  string_split(role || ',' || tool || ',' || conv_id, ',')[1] AS role2,
  string_split(role || ',' || tool || ',' || conv_id, ',')[2] AS tool2,
  string_split(role || ',' || tool || ',' || conv_id, ',')[3] AS conv2
FROM transcripts""",
        "parse_uri": f"""WITH {TRANSCRIPTS_ORACLE_CTE.strip()}
SELECT conv_id, turn_idx,
  'https' AS scheme,
  tool || '.example.com' AS host,
  '/' || role AS path,
  'turn=' || CAST(turn_idx AS VARCHAR) AS query
FROM transcripts""",
        "redaction": f"""WITH {TRANSCRIPTS_ORACLE_CTE.strip()}
SELECT conv_id, turn_idx,
  role AS role_attr,
  CASE WHEN tool IN ('bash','http') THEN '****' ELSE tool END AS tool_attr,
  'secret' AS redacted_keys,
  CASE WHEN tool IN ('bash','http') THEN '1' END AS masked_count
FROM transcripts""",
        "groupbyattrs": f"""WITH {TRANSCRIPTS_ORACLE_CTE.strip()}
SELECT role, tool, count(*)::BIGINT AS records FROM transcripts GROUP BY role, tool""",
        "parse_syslog": f"""WITH {TRANSCRIPTS_ORACLE_CTE.strip()}
SELECT conv_id, turn_idx,
  (8 + turn_idx % 8) AS priority,
  1 AS facility,
  CASE turn_idx % 8 WHEN 0 THEN 23 WHEN 1 THEN 22 WHEN 2 THEN 21 WHEN 3 THEN 17
                    WHEN 4 THEN 13 WHEN 5 THEN 10 WHEN 6 THEN 9 ELSE 5 END AS severity_number,
  1 AS version,
  try_strptime(strftime(ts, '%Y-%m-%dT%H:%M:%S'), '%Y-%m-%dT%H:%M:%S') AS event_ts,
  'h-' || conv_id AS hostname,
  tool AS appname,
  CAST(turn_idx AS VARCHAR) AS proc_id,
  '-' AS msg_id,
  '-' AS structured_data,
  text AS message
FROM transcripts""",
        "spanmetrics_calls": f"""{_BASE_CTES}
SELECT tool_category, 'none' AS missing_dim, count(*)::BIGINT AS calls,
       'traces.span.metrics.calls' AS metric_name
FROM enriched GROUP BY tool_category""",
        "spanmetrics_hist": f"""{_BASE_CTES}
SELECT tool_category,
  CASE WHEN CAST(dur_ms AS BIGINT) <= 100 THEN '100'
       WHEN CAST(dur_ms AS BIGINT) <= 500 THEN '500'
       WHEN CAST(dur_ms AS BIGINT) <= 1000 THEN '1000'
       WHEN CAST(dur_ms AS BIGINT) <= 2500 THEN '2500'
       ELSE '+Inf' END AS le,
  count(*)::BIGINT AS bucket_count,
  sum(CAST(dur_ms AS DOUBLE)) AS duration_sum
FROM enriched
WHERE dur_ms IS NOT NULL
GROUP BY 1, 2""",
        "delta_to_cumulative": """SELECT user_id, event_id,
  round(sum(value) OVER (PARTITION BY user_id ORDER BY event_id
        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 6) AS cumulative
FROM events""",
        "cumulative_to_delta": """SELECT user_id, event_id, round(delta, 6) AS delta FROM (
  SELECT user_id, event_id,
    value - lag(value) OVER (PARTITION BY user_id ORDER BY event_id) AS delta
  FROM events) WHERE delta IS NOT NULL""",
        "delta_to_cumulative_guarded": """WITH synth AS (
  SELECT user_id, event_id, value,
         event_id - (CASE WHEN event_id % 7 = 0 THEN 1 ELSE 0 END) AS ts_syn,
         CASE WHEN event_id % 11 = 0 THEN -1 ELSE 0 END AS start_syn
  FROM events),
started AS (
  SELECT *, first_value(start_syn) OVER (PARTITION BY user_id
             ORDER BY ts_syn, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS series_start
  FROM synth),
ok AS (SELECT * FROM started WHERE start_syn >= series_start),
dedup AS (
  SELECT * FROM (
    SELECT *, row_number() OVER (PARTITION BY user_id, ts_syn
                                 ORDER BY event_id) AS dup_rk
    FROM ok) WHERE dup_rk = 1)
SELECT user_id, event_id,
       round(sum(value) OVER (PARTITION BY user_id ORDER BY ts_syn
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 6) AS cumulative
FROM dedup""",
        "decontaminate": f"""WITH ev AS (
  SELECT DISTINCT unnest(list_distinct({_SH3})) AS s
  FROM documents WHERE doc_id % 50 = 0),
tr AS (
  SELECT doc_id, unnest(list_distinct({_SH3})) AS s
  FROM documents WHERE doc_id % 50 <> 0)
SELECT doc_id, count(*)::BIGINT AS n_shared
FROM tr JOIN ev USING (s) GROUP BY doc_id""",
        "quantize_int8": """WITH q AS (
  SELECT vec_id,
         list_max(list_transform(embedding::DOUBLE[], x -> abs(x))) / 127.0 AS scale,
         embedding::DOUBLE[] AS v
  FROM embeddings)
SELECT vec_id,
       floor(scale * 1e9)::BIGINT AS scale_q9,
       array_to_string(
         list_transform(v, x -> CASE WHEN scale = 0 THEN 0
           ELSE least(greatest(floor(x / scale + 0.5), -127), 127)::INT END),
         '|') AS qvec_str
FROM q""",
        "sample_stratified": """SELECT user_id, event_id FROM (
  SELECT user_id, event_id,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY md5('0:' || event_id::VARCHAR), event_id) AS rk
  FROM events) WHERE rk <= 5""",
        "bpe_token_count": f"""SELECT doc_id,
       len({_TOKS}) AS n_ws,
       len(regexp_extract_all(text,'''(?:s|t|re|ve|m|ll|d)| ?[a-zA-Z]+| ?[0-9]+| ?[^a-zA-Z0-9 '']+''', 0)) AS n_bpe
FROM documents""",
        "pack_nosplit": """WITH RECURSIVE t0 AS (
  SELECT doc_id,
         len(list_filter(string_split(text, ' '), t -> t != ''))::BIGINT AS n_tokens,
         md5('0:' || doc_id::VARCHAR) AS k
  FROM documents),
t AS (SELECT *, (((ascii(substring(k,1,1)) - CASE WHEN ascii(substring(k,1,1)) >= 97 THEN 87 ELSE 48 END)::BIGINT * 268435456+(ascii(substring(k,2,1)) - CASE WHEN ascii(substring(k,2,1)) >= 97 THEN 87 ELSE 48 END)::BIGINT * 16777216+(ascii(substring(k,3,1)) - CASE WHEN ascii(substring(k,3,1)) >= 97 THEN 87 ELSE 48 END)::BIGINT * 1048576+(ascii(substring(k,4,1)) - CASE WHEN ascii(substring(k,4,1)) >= 97 THEN 87 ELSE 48 END)::BIGINT * 65536+(ascii(substring(k,5,1)) - CASE WHEN ascii(substring(k,5,1)) >= 97 THEN 87 ELSE 48 END)::BIGINT * 4096+(ascii(substring(k,6,1)) - CASE WHEN ascii(substring(k,6,1)) >= 97 THEN 87 ELSE 48 END)::BIGINT * 256+(ascii(substring(k,7,1)) - CASE WHEN ascii(substring(k,7,1)) >= 97 THEN 87 ELSE 48 END)::BIGINT * 16+(ascii(substring(k,8,1)) - CASE WHEN ascii(substring(k,8,1)) >= 97 THEN 87 ELSE 48 END)::BIGINT * 1) % 4)::INT AS shard,
             row_number() OVER (PARTITION BY (((ascii(substring(k,1,1)) - CASE WHEN ascii(substring(k,1,1)) >= 97 THEN 87 ELSE 48 END)::BIGINT * 268435456+(ascii(substring(k,2,1)) - CASE WHEN ascii(substring(k,2,1)) >= 97 THEN 87 ELSE 48 END)::BIGINT * 16777216+(ascii(substring(k,3,1)) - CASE WHEN ascii(substring(k,3,1)) >= 97 THEN 87 ELSE 48 END)::BIGINT * 1048576+(ascii(substring(k,4,1)) - CASE WHEN ascii(substring(k,4,1)) >= 97 THEN 87 ELSE 48 END)::BIGINT * 65536+(ascii(substring(k,5,1)) - CASE WHEN ascii(substring(k,5,1)) >= 97 THEN 87 ELSE 48 END)::BIGINT * 4096+(ascii(substring(k,6,1)) - CASE WHEN ascii(substring(k,6,1)) >= 97 THEN 87 ELSE 48 END)::BIGINT * 256+(ascii(substring(k,7,1)) - CASE WHEN ascii(substring(k,7,1)) >= 97 THEN 87 ELSE 48 END)::BIGINT * 16+(ascii(substring(k,8,1)) - CASE WHEN ascii(substring(k,8,1)) >= 97 THEN 87 ELSE 48 END)::BIGINT * 1) % 4) ORDER BY k, doc_id) AS rn
      FROM t0),
walk(shard, rn, doc_id, n_tokens, pack_id, used) AS (
  SELECT shard, rn, doc_id, n_tokens, 0::BIGINT, n_tokens FROM t WHERE rn = 1
  UNION ALL
  SELECT t.shard, t.rn, t.doc_id, t.n_tokens,
         CASE WHEN w.used > 0 AND w.used + t.n_tokens > 256
              THEN w.pack_id + 1 ELSE w.pack_id END,
         CASE WHEN w.used > 0 AND w.used + t.n_tokens > 256
              THEN t.n_tokens ELSE w.used + t.n_tokens END
  FROM walk w JOIN t ON t.shard = w.shard AND t.rn = w.rn + 1)
SELECT doc_id, n_tokens, shard, pack_id FROM walk""",
        "pack_sequences": """WITH t AS (
  SELECT doc_id,
         len(list_filter(string_split(text, ' '), t -> t != ''))::BIGINT AS n_tokens,
         md5('0:' || doc_id::VARCHAR) AS k
  FROM documents),
s AS (SELECT *, (((ascii(substring(k,1,1)) - CASE WHEN ascii(substring(k,1,1)) >= 97 THEN 87 ELSE 48 END)::BIGINT * 268435456+(ascii(substring(k,2,1)) - CASE WHEN ascii(substring(k,2,1)) >= 97 THEN 87 ELSE 48 END)::BIGINT * 16777216+(ascii(substring(k,3,1)) - CASE WHEN ascii(substring(k,3,1)) >= 97 THEN 87 ELSE 48 END)::BIGINT * 1048576+(ascii(substring(k,4,1)) - CASE WHEN ascii(substring(k,4,1)) >= 97 THEN 87 ELSE 48 END)::BIGINT * 65536+(ascii(substring(k,5,1)) - CASE WHEN ascii(substring(k,5,1)) >= 97 THEN 87 ELSE 48 END)::BIGINT * 4096+(ascii(substring(k,6,1)) - CASE WHEN ascii(substring(k,6,1)) >= 97 THEN 87 ELSE 48 END)::BIGINT * 256+(ascii(substring(k,7,1)) - CASE WHEN ascii(substring(k,7,1)) >= 97 THEN 87 ELSE 48 END)::BIGINT * 16+(ascii(substring(k,8,1)) - CASE WHEN ascii(substring(k,8,1)) >= 97 THEN 87 ELSE 48 END)::BIGINT * 1) % 4)::INT AS shard FROM t),
laid AS (
  SELECT *, coalesce(sum(n_tokens) OVER (PARTITION BY shard ORDER BY k, doc_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS start
  FROM s)
SELECT doc_id, n_tokens, shard,
       (start // 256)::BIGINT AS pack_id,
       (start % 256)::BIGINT AS pack_offset,
       ((start + greatest(n_tokens, 1) - 1) // 256 - start // 256 + 1)::BIGINT AS n_packs
FROM laid""",
        "transform_datapoint": """WITH frame AS (
  SELECT event_id,
    CASE event_id % 3 WHEN 0 THEN 'req' WHEN 1 THEN 'cpu' ELSE 'lat' END AS metric_name,
    CASE event_id % 3 WHEN 0 THEN 'sum' WHEN 1 THEN 'gauge' ELSE 'histogram' END AS metric_type,
    CASE event_id % 3 WHEN 0 THEN '1' WHEN 1 THEN '%' ELSE 'ms' END AS unit,
    CASE WHEN event_id % 3 <= 1 THEN value END AS value,
    CASE WHEN event_id % 3 = 2 THEN (event_id % 100)::BIGINT END AS "count",
    event_type AS src
  FROM events),
xf AS (
  SELECT event_id, metric_name, metric_type,
    CASE WHEN metric_name = 'cpu' THEN '1/s' ELSE unit END AS unit,
    metric_name || ':' || metric_type AS description,
    src,
    CASE WHEN metric_name = 'cpu' THEN trunc(value * 10)::BIGINT::VARCHAR END AS vband,
    CASE WHEN "count" >= 50 THEN 'true' END AS big,
    value, "count"
  FROM frame)
SELECT event_id, metric_name, metric_type, unit, description, src, vband, big,
       coalesce(value, -1.0) AS value, coalesce("count", -1) AS "count"
FROM xf
WHERE NOT (metric_name = 'lat' AND "count" < 10)""",
        "transform_metric_ctx": """WITH frame AS (
  SELECT event_id,
    CASE event_id % 3 WHEN 0 THEN 'req' WHEN 1 THEN 'cpu' ELSE 'lat' END AS metric_name,
    CASE event_id % 3 WHEN 0 THEN 'sum' WHEN 1 THEN 'gauge' ELSE 'histogram' END AS metric_type,
    CASE event_id % 3 WHEN 0 THEN 'cumulative' WHEN 2 THEN 'delta' END AS temporality,
    CASE WHEN event_id % 3 = 0 THEN TRUE END AS is_monotonic,
    CASE event_id % 3 WHEN 0 THEN '1' WHEN 1 THEN '%' ELSE 'ms' END AS unit,
    CASE WHEN event_id % 3 <= 1 THEN floor(value * 1e6) END AS value,
    CASE WHEN event_id % 3 = 2 THEN (event_id % 100)::BIGINT END AS "count",
    CASE WHEN event_id % 3 = 2 AND event_id % 5 != 0 THEN floor(value * 1e6) END AS hsum
  FROM events),
conv AS (
  SELECT event_id, metric_name,
    CASE WHEN metric_type = 'gauge' THEN 'sum' ELSE metric_type END AS metric_type,
    CASE WHEN metric_type = 'gauge' THEN 'delta' ELSE temporality END AS temporality,
    CASE WHEN metric_type = 'gauge' THEN TRUE ELSE is_monotonic END AS is_monotonic,
    unit, value, "count", hsum
  FROM frame),
unioned AS (
  SELECT * FROM conv
  UNION ALL
  SELECT event_id, metric_name || '_count', 'sum', temporality, FALSE, '1',
         "count"::DOUBLE, NULL::BIGINT, NULL::DOUBLE
  FROM conv WHERE metric_type = 'histogram'
  UNION ALL
  SELECT event_id, metric_name || '_sum', 'sum', temporality, TRUE, unit,
         hsum, NULL::BIGINT, NULL::DOUBLE
  FROM conv WHERE metric_type = 'histogram' AND hsum IS NOT NULL)
SELECT event_id, metric_name, metric_type, temporality,
       coalesce(is_monotonic::VARCHAR, 'null') AS is_monotonic, unit,
       coalesce(value, -1.0) AS value,
       coalesce("count", -1) AS "count",
       coalesce(hsum, -1.0) AS hsum
FROM unioned""",
        "delta_to_cumulative_expo": """WITH dp AS (
  SELECT user_id, event_id,
         (2 + user_id % 2)::INT AS scale,
         ((event_id % 37) - 18)::INT AS off,
         list_transform(range(1, (event_id % 4)::INT + 1),
                        i -> ((event_id + (i-1)*7) % 10 + 1)::BIGINT) AS counts,
         (event_id % 3)::BIGINT AS zero_count
  FROM events),
base AS (
  SELECT *, min(scale) OVER (PARTITION BY user_id) AS min_scale,
         sum(zero_count) OVER (PARTITION BY user_id ORDER BY event_id
                               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS zero_cum
  FROM dp),
ex AS (
  SELECT user_id, event_id,
         floor((off + generate_subscripts(counts, 1) - 1) / pow(2, scale - min_scale))::INT AS idx,
         unnest(counts) AS cnt
  FROM base),
idx_cnt AS (SELECT user_id, event_id, idx, sum(cnt) AS cnt FROM ex GROUP BY 1, 2, 3),
idx_first AS (SELECT user_id, idx, min(event_id) AS first_ts FROM idx_cnt GROUP BY 1, 2),
points AS (SELECT user_id, event_id, min_scale, zero_cum FROM base),
grid AS (SELECT p.user_id, p.event_id, f.idx
         FROM points p JOIN idx_first f ON p.user_id = f.user_id AND p.event_id >= f.first_ts),
filled AS (SELECT g.*, coalesce(c.cnt, 0) AS cnt0
           FROM grid g LEFT JOIN idx_cnt c
             ON c.user_id = g.user_id AND c.event_id = g.event_id AND c.idx = g.idx),
cum AS (SELECT *, sum(cnt0) OVER (PARTITION BY user_id, idx ORDER BY event_id
                                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        FROM filled),
bounds AS (SELECT user_id, event_id, min(idx) AS lo, max(idx) AS hi FROM cum GROUP BY 1, 2),
spine AS (SELECT b.user_id, b.event_id, b.lo, unnest(range(b.lo, b.hi + 1)) AS idx FROM bounds b),
dense AS (SELECT s.user_id, s.event_id, s.lo, s.idx, coalesce(c.cum, 0) AS v
          FROM spine s LEFT JOIN cum c
            ON c.user_id = s.user_id AND c.event_id = s.event_id AND c.idx = s.idx),
arr AS (SELECT user_id, event_id, lo, string_agg(v::VARCHAR, '|' ORDER BY idx) AS counts_str
        FROM dense GROUP BY 1, 2, 3)
SELECT p.user_id, p.event_id, p.min_scale AS scale_out, p.zero_cum::BIGINT AS zero_cum,
       coalesce(a.lo, 0)::INT AS offset_out,
       coalesce(a.counts_str, '') AS counts_str
FROM points p LEFT JOIN arr a ON a.user_id = p.user_id AND a.event_id = p.event_id""",
        "delta_to_rate_ref": """WITH synth AS (
  SELECT 'm' || CAST(user_id % 3 AS VARCHAR) AS metric, event_id,
         round(value, 6) AS value,
         (event_id % 5) AS dur,
         CASE WHEN event_id % 2 = 0 THEN 'delta' ELSE 'cumulative' END AS temporality
  FROM events)
SELECT metric, event_id,
       round(CASE WHEN metric IN ('m0', 'm1') AND temporality = 'delta'
                  THEN CASE WHEN dur > 0 THEN value / dur ELSE 0 END
                  ELSE value END, 6) AS rate
FROM synth""",
        "expo_widen_zero": """WITH dp AS (
  SELECT event_id,
         ((event_id % 9) - 4)::INT AS off,
         list_transform(range(1, (event_id % 5)::INT + 1),
                        i -> ((event_id + (i-1)*3) % 6 + 1)::BIGINT) AS counts,
         (event_id % 3)::BIGINT AS zero_count
  FROM events),
calc AS (
  SELECT *, len(counts) AS n,
         least(greatest(1 - off, 0), len(counts)) AS upto,
         least(greatest(1, off), off + len(counts)) AS lo
  FROM dp)
SELECT event_id,
       (zero_count + CASE WHEN upto > 0 THEN list_reduce(list_slice(counts, 1, upto), (a, b) -> a + b) ELSE 0 END)::BIGINT AS zero_cnt,
       CAST(2.0 AS DOUBLE) AS zero_threshold,
       lo::INT AS off_out,
       coalesce(array_to_string(list_slice(counts, lo - off + 1, n), '|'), '') AS counts_str
FROM calc""",
        "cumulative_to_delta_mono": """SELECT user_id, event_id, round(value - prev, 6) AS delta FROM (
  SELECT user_id, event_id, value,
    lag(value) OVER (PARTITION BY user_id ORDER BY event_id) AS prev
  FROM events) WHERE prev IS NOT NULL AND value >= prev""",
        "delta_to_rate": """SELECT user_id, event_id, round(rate, 6) AS rate FROM (
  SELECT user_id, event_id,
    value / (epoch(ts) - epoch(lag(ts) OVER (PARTITION BY user_id ORDER BY ts))) AS rate,
    epoch(ts) - epoch(lag(ts) OVER (PARTITION BY user_id ORDER BY ts)) AS el
  FROM events) WHERE el > 0 AND rate IS NOT NULL""",
        "interval_last": """SELECT user_id, date_trunc('hour', ts) AS interval_start,
       event_id, round(value, 6) AS value
FROM events
QUALIFY row_number() OVER (PARTITION BY user_id, date_trunc('hour', ts)
                           ORDER BY ts DESC, event_id DESC) = 1""",
        "parse_container": f"""WITH {TRANSCRIPTS_ORACLE_CTE.strip()}
SELECT conv_id, turn_idx,
  CASE WHEN turn_idx % 2 = 0 THEN text ELSE text END AS log,
  CASE WHEN turn_idx % 2 = 0 THEN 'stdout' ELSE 'stderr' END AS stream,
  try_strptime(strftime(ts, '%Y-%m-%dT%H:%M:%S'), '%Y-%m-%dT%H:%M:%S') AS event_ts,
  CASE WHEN turn_idx % 2 = 0 THEN false ELSE turn_idx % 3 = 0 END AS partial
FROM transcripts""",
        "transform_spanevent": f"""WITH {TRANSCRIPTS_ORACLE_CTE.strip()},
spans AS (
  SELECT conv_id AS trace_id,
         conv_id || '#' || CAST(turn_idx AS VARCHAR) AS span_id,
         'turn-' || role AS span_name,
         turn_idx
  FROM transcripts)
SELECT trace_id, span_id, 0 AS pos,
       'exception.renamed' AS event_name, span_name AS parent_span
FROM spans WHERE turn_idx % 7 = 3
UNION ALL
SELECT trace_id, span_id,
       CASE WHEN turn_idx % 7 = 3 THEN 1 ELSE 0 END AS pos,
       'checkpoint' AS event_name, span_name AS parent_span
FROM spans WHERE turn_idx % 13 = 5""",
        "count_spans_signal": f"""WITH {TRANSCRIPTS_ORACLE_CTE.strip()},
spans AS (
  SELECT CASE WHEN tool <> 'none' THEN 'svc-' || tool END AS service_name,
         turn_idx
  FROM transcripts)
SELECT 'trace.span.count' AS metric_name,
       coalesce(service_name, 'unknown') AS dim,
       count(*)::BIGINT AS "count"
FROM spans GROUP BY 2
UNION ALL
SELECT 'trace.span.event.count', 'exception', count(*)::BIGINT
FROM spans WHERE turn_idx % 7 = 3
UNION ALL
SELECT 'trace.span.event.count', 'checkpoint', count(*)::BIGINT
FROM spans WHERE turn_idx % 13 = 5""",
        "servicegraph_spanpair": f"""WITH {TRANSCRIPTS_ORACLE_CTE.strip()},
clients AS (
  SELECT conv_id, turn_idx,
         'svc-' || CAST(turn_idx % 5 AS VARCHAR) AS client,
         (turn_idx % 9 + 1) * 1000 AS lat_us,
         turn_idx % 5 = 0 AS cerr,
         CASE WHEN turn_idx % 3 <> 0 THEN 'peer-' || CAST(turn_idx % 3 AS VARCHAR) END AS peer
  FROM transcripts WHERE turn_idx % 2 = 0),
servers AS (
  SELECT conv_id, turn_idx - 1 AS client_turn,
         'svc-' || CAST(turn_idx % 5 AS VARCHAR) AS server,
         (turn_idx % 9 + 1) * 1000 AS lat_us,
         turn_idx % 5 = 0 AS serr
  FROM transcripts WHERE turn_idx % 2 = 1 AND turn_idx % 10 <> 7),
edges AS (
  SELECT c.client,
         coalesce(s.server, coalesce(c.peer, 'unknown')) AS server,
         CASE WHEN s.server IS NULL THEN 'virtual_node' ELSE '' END AS connection_type,
         c.cerr OR coalesce(s.serr, false) AS failed,
         c.lat_us AS client_lat_us,
         coalesce(s.lat_us, 0) AS server_lat_us
  FROM clients c LEFT JOIN servers s
    ON c.conv_id = s.conv_id AND c.turn_idx = s.client_turn)
SELECT client, server, connection_type,
       count(*) AS request_count,
       sum(CASE WHEN failed THEN 1 ELSE 0 END)::BIGINT AS failed_count,
       sum(client_lat_us)::BIGINT AS client_lat_us,
       sum(server_lat_us)::BIGINT AS server_lat_us
FROM edges GROUP BY client, server, connection_type""",
        "servicegraph_edges": f"""WITH {TRANSCRIPTS_ORACLE_CTE.strip()},
paired AS (
  SELECT role AS client, ts,
    lead(role) OVER (PARTITION BY conv_id ORDER BY turn_idx) AS next_role,
    lead(tool) OVER (PARTITION BY conv_id ORDER BY turn_idx) AS server,
    lead(ts) OVER (PARTITION BY conv_id ORDER BY turn_idx) AS server_ts
  FROM transcripts)
SELECT client, server, count(*)::BIGINT AS request_count,
       round(sum(epoch_us(server_ts) - epoch_us(ts)) / 1000000.0, 6) AS latency_sum_s
FROM paired
WHERE client = 'user' AND next_role = 'tool'
GROUP BY client, server""",
        "filter_metrics": """SELECT 'req.count' AS metric_name,
  CAST(user_id AS VARCHAR) AS uid,
  floor(value * 1000000) AS value,
  'prod' AS env
FROM events WHERE event_id % 2 = 0 AND user_id % 3 = 0""",
        "metrics_transform": """WITH mf AS (
  SELECT CASE WHEN event_id % 2 = 0 THEN 'req.count' ELSE 'err.count' END AS metric_name,
         floor(value * 1000000) AS v, CAST(user_id AS VARCHAR) AS uid
  FROM events)
SELECT 'all.count' AS metric_name, uid, sum(v)::DOUBLE AS value
FROM mf GROUP BY uid""",
        "schema_translate": """SELECT event_id,
  'https://opentelemetry.io/schemas/1.2.0' AS schema_url,
  CASE WHEN event_id % 3 = 0 THEN 'c' || CAST(user_id % 5 AS VARCHAR) END AS cluster_new,
  CASE WHEN event_id % 3 <> 0 THEN 'c' || CAST(user_id % 5 AS VARCHAR) END AS cluster_old,
  CASE WHEN event_id % 3 <> 2 THEN '/p' || CAST(event_id % 7 AS VARCHAR) END AS path_new,
  CASE WHEN event_id % 3 = 2 THEN '/p' || CAST(event_id % 7 AS VARCHAR) END AS path_old
FROM events""",
        "sumologic_shape": """SELECT event_id,
  CASE event_id % 4 WHEN 0 THEN 'aws_ec2' WHEN 1 THEN 'aws_ecs'
       WHEN 2 THEN 'aws_elastic_beanstalk' ELSE 'gcp_compute_engine' END AS aws_service,
  CASE event_id % 4 WHEN 0 THEN 'aws/ec2' WHEN 1 THEN 'ecs'
       WHEN 2 THEN 'ElasticBeanstalk' ELSE NULL END AS namespace,
  'h' || CAST(user_id % 20 AS VARCHAR) AS host,
  '{"peer":"p' || CAST(event_id % 7 AS VARCHAR) || '"}' AS net_json
FROM events""",
        "grafanacloud_hosts": """SELECT DISTINCT 'traces_host_info' AS metric_name,
  date_trunc('hour', ts) AS flush_start,
  CASE WHEN event_id % 3 <> 0 THEN 'h' || CAST(user_id % 37 AS VARCHAR)
       ELSE 'n' || CAST(user_id % 11 AS VARCHAR) END AS host_id,
  CAST(1 AS BIGINT) AS value
FROM events""",
        "metrics_combine_captures": """WITH mf AS (
  SELECT CASE WHEN event_id % 2 = 0 THEN 'p50' ELSE 'p99' END AS q,
         floor(value * 1000) AS v, CAST(user_id % 10 AS VARCHAR) AS uid
  FROM events),
agg AS (SELECT q, uid, sum(v) AS sv FROM mf GROUP BY q, uid)
SELECT 'lat.ms' AS metric_name, q, uid,
       CASE WHEN q = 'p99' THEN CAST(sv * 2.0 AS BIGINT)::DOUBLE ELSE sv::DOUBLE END AS value,
       'int' AS value_type
FROM agg""",
        "metrics_generation": """WITH mf AS (
  SELECT CASE WHEN event_id % 2 = 0 THEN 'req.count' ELSE 'err.count' END AS metric_name,
         floor(value * 1000000) AS v, CAST(user_id AS VARCHAR) AS uid
  FROM events),
agg AS (SELECT metric_name, uid, sum(v)::DOUBLE AS value FROM mf GROUP BY metric_name, uid)
SELECT 'err.ratio' AS metric_name, e.uid AS uid, round(e.value / r.value * 100.0, 6) AS value
FROM agg e JOIN agg r ON e.uid = r.uid
WHERE e.metric_name = 'err.count' AND r.metric_name = 'req.count' AND r.value != 0""",
        "tail_sampling": f"""WITH {TRANSCRIPTS_ORACLE_CTE.strip()},
dec AS (
  SELECT conv_id,
    (max(epoch_us(ts)) - min(epoch_us(ts))) / 1000.0 >= 2570000000 AS p_slow,
    max(CASE WHEN tool = 'editor' AND turn_idx >= 95 THEN 1 ELSE 0 END) = 1 AS p_late,
    {_md5_bucket_sql('conv_id')} < 1000 AS p_prob
  FROM transcripts GROUP BY conv_id)
SELECT t.conv_id, t.turn_idx
FROM transcripts t JOIN dec d ON t.conv_id = d.conv_id
WHERE coalesce(p_slow OR p_late OR p_prob, false)""",
        "k8sattributes": """SELECT e.event_id,
  '10.' || CAST(e.event_id % 30 AS VARCHAR) || '.0.1' AS ip,
  CASE WHEN e.event_id % 5 = 0 THEN 'preset' ELSE n.n_name END AS nation_attr,
  CAST(n.n_regionkey AS VARCHAR) AS region_attr,
  '10.' || CAST(e.event_id % 30 AS VARCHAR) || '.0.1' AS pod_ip_attr
FROM events e LEFT JOIN nation n ON n.n_nationkey = e.event_id % 30""",
        "span_rename": f"""WITH {TRANSCRIPTS_ORACLE_CTE.strip()}
SELECT conv_id, turn_idx,
  CASE WHEN turn_idx % 7 = 0 THEN 'noop-' || CAST(turn_idx AS VARCHAR)
       ELSE '/api/{{rolePart}}/op/{{toolPart}}/run' END AS span_name,
  CASE WHEN turn_idx % 7 = 0 THEN NULL ELSE role END AS role_part,
  CASE WHEN turn_idx % 7 = 0 THEN NULL ELSE tool END AS tool_part,
  CASE WHEN turn_idx % 7 != 0 AND tool = 'bash' THEN 'ERROR' ELSE 'UNSET' END AS status_code,
  CASE WHEN turn_idx % 7 != 0 AND tool = 'bash' THEN 'exec span' END AS status_description
FROM transcripts""",
        "tail_sampling_invert": f"""WITH {TRANSCRIPTS_ORACLE_CTE.strip()},
dec AS (
  SELECT conv_id,
    max(CASE WHEN regexp_matches(text, 'FATAL') THEN 1 ELSE 0 END) = 1 AS has_fatal
  FROM transcripts GROUP BY conv_id)
SELECT t.conv_id, t.turn_idx
FROM transcripts t JOIN dec d ON t.conv_id = d.conv_id
WHERE NOT d.has_fatal""",
        "tail_sampling_span_count": f"""WITH {TRANSCRIPTS_ORACLE_CTE.strip()},
dec AS (
  SELECT conv_id,
    count(*) BETWEEN 60 AND 70 AS p_mid,
    max(CASE WHEN text LIKE '%FATAL%' THEN 1 ELSE 0 END) = 1 AS p_fatal
  FROM transcripts GROUP BY conv_id)
SELECT t.conv_id, t.turn_idx
FROM transcripts t JOIN dec d ON t.conv_id = d.conv_id
WHERE d.p_mid OR d.p_fatal""",
        "groupbytrace": f"""WITH {TRANSCRIPTS_ORACLE_CTE.strip()}
SELECT conv_id, count(*)::BIGINT AS span_count,
       md5(string_agg(text, chr(31) ORDER BY turn_idx)) AS digest
FROM transcripts GROUP BY conv_id""",
        "sampler_deterministic": f"""WITH {TRANSCRIPTS_ORACLE_CTE.strip()}
SELECT conv_id, turn_idx FROM transcripts
WHERE {_md5_bucket_sql('conv_id')} < 2500""",
        "sampler_fnv": f"""WITH {TRANSCRIPTS_ORACLE_CTE.strip()}
SELECT conv_id, turn_idx FROM transcripts
WHERE {_fnv_bucket_sql('conv_id')} < 4096""",
        "sampler_proportional": f"""WITH {TRANSCRIPTS_ORACLE_CTE.strip()}
SELECT conv_id, turn_idx, 0.5 * 0.3 AS sampling_probability FROM transcripts
WHERE {_md5_bucket_sql('conv_id')} < 3000""",
        "sampler_equalizing": f"""WITH {TRANSCRIPTS_ORACLE_CTE.strip()},
pri AS (SELECT conv_id, turn_idx,
               CASE WHEN role = 'user' THEN 0.2 ELSE 1.0 END AS prior
        FROM transcripts)
SELECT conv_id, turn_idx, least(prior, 0.5) AS sampling_probability FROM pri
WHERE {_md5_bucket_sql('conv_id')} < least(1.0, 0.5 / prior) * 10000""",
        "servicegraph_hist": f"""WITH {TRANSCRIPTS_ORACLE_CTE.strip()},
paired AS (
  SELECT role AS client, ts,
    lead(role) OVER (PARTITION BY conv_id ORDER BY turn_idx) AS next_role,
    lead(tool) OVER (PARTITION BY conv_id ORDER BY turn_idx) AS server,
    lead(ts) OVER (PARTITION BY conv_id ORDER BY turn_idx) AS server_ts
  FROM transcripts),
edges AS (
  SELECT client, server, epoch_us(server_ts) - epoch_us(ts) AS lat_us
  FROM paired WHERE client = 'user' AND next_role = 'tool')
SELECT client, server,
  CASE WHEN lat_us <= 600000000 THEN '600'
       WHEN lat_us <= 7200000000 THEN '7200'
       WHEN lat_us <= 86400000000 THEN '86400'
       ELSE '+Inf' END AS le,
  count(*)::BIGINT AS request_count
FROM edges GROUP BY 1, 2, 3""",
        "exceptions_metrics": f"""WITH {TRANSCRIPTS_ORACLE_CTE.strip()},
spans AS (
  SELECT CASE WHEN tool <> 'none' THEN 'svc-' || tool END AS service_name,
         'turn-' || role AS span_name,
         CASE WHEN role = 'user' THEN 'SPAN_KIND_CLIENT'
              WHEN role = 'tool' THEN 'SPAN_KIND_SERVER'
              ELSE 'SPAN_KIND_INTERNAL' END AS span_kind,
         CASE WHEN turn_idx % 5 = 0 THEN 'STATUS_CODE_ERROR'
              ELSE 'STATUS_CODE_OK' END AS status_code,
         turn_idx, role
  FROM transcripts)
SELECT service_name, span_name, span_kind, status_code,
       'E' || CAST(turn_idx % 3 AS VARCHAR) AS exception_type,
       'boom ' || role AS exception_message,
       count(*)::BIGINT AS count
FROM spans WHERE turn_idx % 7 = 3 AND service_name IS NOT NULL
GROUP BY 1, 2, 3, 4, 5, 6""",
        "exceptions_logs": f"""WITH {TRANSCRIPTS_ORACLE_CTE.strip()},
spans AS (
  SELECT conv_id AS trace_id,
         conv_id || '#' || CAST(turn_idx AS VARCHAR) AS span_id,
         CASE WHEN tool <> 'none' THEN 'svc-' || tool END AS service_name,
         'turn-' || role AS span_name,
         CASE WHEN role = 'user' THEN 'SPAN_KIND_CLIENT'
              WHEN role = 'tool' THEN 'SPAN_KIND_SERVER'
              ELSE 'SPAN_KIND_INTERNAL' END AS span_kind,
         CASE WHEN turn_idx % 5 = 0 THEN 'STATUS_CODE_ERROR'
              ELSE 'STATUS_CODE_OK' END AS status_code,
         conv_id, turn_idx, role, ts
  FROM transcripts)
SELECT ts, 'ERROR' AS severity_text, 17 AS severity_number, trace_id, span_id,
       service_name, span_name, span_kind, status_code,
       'E' || CAST(turn_idx % 3 AS VARCHAR) AS exception_type,
       'boom ' || role AS exception_message,
       'st:' || conv_id AS exception_stacktrace
FROM spans WHERE turn_idx % 7 = 3 AND service_name IS NOT NULL""",
        "dedup_exact": """WITH h AS (
  SELECT doc_id, row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
  FROM documents)
SELECT doc_id FROM h WHERE rn = 1""",
        "dedup_minhash_lsh": f"""WITH sigs AS (SELECT doc_id, {_SIG} AS sig FROM documents),
bands AS (SELECT doc_id, band,
                 md5(array_to_string(list_transform(list_slice(sig, band*{_ROWS}+1, band*{_ROWS}+{_ROWS}), x -> CAST(x AS VARCHAR)), '|')) AS bh
          FROM sigs CROSS JOIN (SELECT unnest(generate_series(0, {_BANDS - 1})) AS band)
          QUALIFY count(*) OVER (PARTITION BY band, bh) <= {_LSH_MAX_BUCKET})
SELECT DISTINCT x.doc_id AS a_id, y.doc_id AS b_id
FROM bands x JOIN bands y ON x.band = y.band AND x.bh = y.bh AND x.doc_id < y.doc_id""",
        "dedup_passage": f"""WITH toks AS (SELECT doc_id, {_TOKS} AS t FROM documents),
pass AS (
  SELECT doc_id,
         md5(array_to_string(list_slice(t, i*10+1, i*10+10), ' ')) AS h
  FROM toks, unnest(range(0, CAST(ceil(len(t) / 10.0) AS BIGINT))) AS u(i)
),
freq AS (SELECT h, count(DISTINCT doc_id) AS docs_with FROM pass GROUP BY h),
agg AS (SELECT p.doc_id, count(*) AS n_passages,
               sum(CASE WHEN f.docs_with > 1 THEN 1 ELSE 0 END) AS dup_passages
        FROM pass p JOIN freq f USING (h) GROUP BY p.doc_id)
SELECT d.doc_id,
       CAST(coalesce(a.n_passages, 0) AS BIGINT) AS n_passages,
       CAST(coalesce(a.dup_passages, 0) AS BIGINT) AS dup_passages,
       round(CAST(a.dup_passages AS DOUBLE) / a.n_passages, 4) AS dup_passage_frac
FROM documents d LEFT JOIN agg a USING (doc_id)""",
        "dedup_clusters": f"""WITH RECURSIVE sigs AS (SELECT doc_id, {_SIG} AS sig FROM documents),
bands AS (SELECT doc_id, band,
                 md5(array_to_string(list_transform(list_slice(sig, band*{_ROWS}+1, band*{_ROWS}+{_ROWS}), x -> CAST(x AS VARCHAR)), '|')) AS bh
          FROM sigs CROSS JOIN (SELECT unnest(generate_series(0, {_BANDS - 1})) AS band)
          QUALIFY count(*) OVER (PARTITION BY band, bh) <= {_LSH_MAX_BUCKET}),
prs AS (SELECT DISTINCT x.doc_id AS a_id, y.doc_id AS b_id
        FROM bands x JOIN bands y ON x.band = y.band AND x.bh = y.bh AND x.doc_id < y.doc_id),
edges AS (SELECT a_id AS src, b_id AS dst FROM prs
          UNION SELECT b_id AS src, a_id AS dst FROM prs),
reach(a, b) AS (
  SELECT src, dst FROM edges
  UNION
  SELECT r.a, e.dst FROM reach r JOIN edges e ON r.b = e.src)
SELECT d.doc_id, least(d.doc_id, coalesce(min(r.b), d.doc_id)) AS cluster_id
FROM documents d LEFT JOIN reach r ON r.a = d.doc_id
GROUP BY d.doc_id""",
        "curation_select": f"""WITH RECURSIVE sigs AS (SELECT doc_id, {_SIG} AS sig FROM documents),
bands AS (SELECT doc_id, band,
                 md5(array_to_string(list_transform(list_slice(sig, band*{_ROWS}+1, band*{_ROWS}+{_ROWS}), x -> CAST(x AS VARCHAR)), '|')) AS bh
          FROM sigs CROSS JOIN (SELECT unnest(generate_series(0, {_BANDS - 1})) AS band)
          QUALIFY count(*) OVER (PARTITION BY band, bh) <= {_LSH_MAX_BUCKET}),
prs AS (SELECT DISTINCT x.doc_id AS a_id, y.doc_id AS b_id
        FROM bands x JOIN bands y ON x.band = y.band AND x.bh = y.bh AND x.doc_id < y.doc_id),
edges AS (SELECT a_id AS src, b_id AS dst FROM prs
          UNION SELECT b_id AS src, a_id AS dst FROM prs),
reach(a, b) AS (
  SELECT src, dst FROM edges
  UNION
  SELECT r.a, e.dst FROM reach r JOIN edges e ON r.b = e.src),
cl AS (SELECT d.doc_id, least(d.doc_id, coalesce(min(r.b), d.doc_id)) AS cluster_id
       FROM documents d LEFT JOIN reach r ON r.a = d.doc_id
       GROUP BY d.doc_id),
met AS (SELECT doc_id,
  CASE WHEN len({_TOKS}) > 0 THEN
  floor((0.3 * least(len(text)::DOUBLE / 500.0, 1.0)
      + 0.4 * (len(list_distinct({_TOKS}))::DOUBLE / len({_TOKS}))
      + 0.3 * least(4.0 * len(list_filter({_TOKS}, t -> list_contains({_STOP}, t)))::DOUBLE
                    / len({_TOKS}), 1.0)) * 10000 + 0.5)::BIGINT
  ELSE 0 END AS quality_q4,
  CASE WHEN len({_TOKS}) > 0 AND
            len(list_filter({_TOKS}, t -> list_contains({_STOP}, t)))::DOUBLE
            / len({_TOKS}) > 0.02 THEN 'en' ELSE 'unknown' END AS pred_lang
  FROM documents),
elig AS (SELECT m.doc_id, c.cluster_id, m.quality_q4
         FROM met m JOIN cl c ON c.doc_id = m.doc_id
         WHERE m.pred_lang = 'en' AND m.quality_q4 >= 4000)
SELECT doc_id, cluster_id, quality_q4, n_members FROM (
  SELECT *, row_number() OVER (PARTITION BY cluster_id ORDER BY quality_q4 DESC, doc_id) AS rn,
         count(*) OVER (PARTITION BY cluster_id) AS n_members
  FROM elig) WHERE rn = 1""",
        "dedup_simhash": f"""WITH toks AS (SELECT doc_id, unnest({_TOKS}) AS tok FROM documents),
hv AS (SELECT doc_id, {_HEXVAL} AS hv FROM toks),
sums AS (SELECT doc_id, {_BITSUMS} FROM hv GROUP BY doc_id)
SELECT doc_id, ({_SIMH})::BIGINT AS simhash FROM sums""",
        "dedup_ngram_jaccard": f"""WITH sh AS (SELECT doc_id, list_distinct({_SH3}) AS sh FROM documents),
inv AS (SELECT doc_id, unnest(sh) AS s FROM sh),
sizes AS (SELECT doc_id, len(sh) AS n FROM sh),
pairs AS (SELECT x.doc_id AS a_id, y.doc_id AS b_id, count(*) AS inter
          FROM inv x JOIN inv y ON x.s = y.s AND x.doc_id < y.doc_id GROUP BY 1, 2)
SELECT a_id, b_id, round(inter::DOUBLE / (na.n + nb.n - inter), 4) AS jaccard
FROM pairs JOIN sizes na ON na.doc_id = a_id JOIN sizes nb ON nb.doc_id = b_id
WHERE round(inter::DOUBLE / (na.n + nb.n - inter), 4) >= 0.2""",
        "dedup_embedding_cosine": f"""SELECT a.vec_id AS a_id, b.vec_id AS b_id,
       round({_DOT_AB} / ({_nrm('a')} * {_nrm('b')}), 4) AS cos
FROM embeddings a CROSS JOIN embeddings b
WHERE a.vec_id < b.vec_id
  AND round({_DOT_AB} / ({_nrm('a')} * {_nrm('b')}), 4) >= 0.2""",
        "ann_bruteforce_topk": f"""WITH scored AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         round({_dot_sql('q.embedding', 'c.embedding')}
               / ({_nrm('q')} * {_nrm('c')}), 4) AS cos
  FROM embeddings c CROSS JOIN (SELECT * FROM embeddings WHERE vec_id < 5) q
  WHERE q.vec_id != c.vec_id)
SELECT query_id, neighbor_id, rank, cos FROM (
  SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rank
  FROM scored) WHERE rank <= 5""",
        "ann_lsh_buckets": "SELECT vec_id, "
        + " || ".join(
            f"(CASE WHEN {_plane_dot(p)} >= 0 THEN '1' ELSE '0' END)" for p in range(8)
        )
        + " AS bucket FROM embeddings",
        "ann_lsh_topk": f"""WITH b AS (SELECT vec_id, embedding, {_BUCKET4} AS bucket FROM embeddings),
scored AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         round({_dot_sql('q.embedding', 'c.embedding')}
               / ({_nrm('q')} * {_nrm('c')}), 4) AS cos
  FROM b c JOIN (SELECT * FROM b WHERE vec_id < 20) q ON c.bucket = q.bucket
  WHERE q.vec_id != c.vec_id)
SELECT query_id, neighbor_id, rank, cos FROM (
  SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rank
  FROM scored) WHERE rank <= 5""",
        "ann_ivf_assign": f"""WITH {_IVF_CENT}
SELECT e.vec_id, c.centroid_id AS list_id
FROM embeddings e CROSS JOIN cent c
QUALIFY row_number() OVER (PARTITION BY e.vec_id
                           ORDER BY {_IVF_COS_EC} DESC, c.centroid_id) = 1""",
        "ann_ivf_topk": f"""WITH {_IVF_CENT},
assign AS (SELECT e.vec_id, e.embedding, c.centroid_id
           FROM embeddings e CROSS JOIN cent c
           QUALIFY row_number() OVER (PARTITION BY e.vec_id
                                      ORDER BY {_IVF_COS_EC} DESC, c.centroid_id) = 1),
probe AS (SELECT e.vec_id AS query_id, e.embedding AS qemb, c.centroid_id AS list_id
          FROM (SELECT * FROM embeddings WHERE vec_id < 20) e CROSS JOIN cent c
          QUALIFY row_number() OVER (PARTITION BY e.vec_id
                                     ORDER BY {_IVF_COS_EC} DESC, c.centroid_id) <= 2),
scored AS (SELECT p.query_id, a.vec_id AS neighbor_id,
                  round({_dot_sql('p.qemb', 'a.embedding')}
                        / ({_nrm_sql('p.qemb')} * {_nrm_sql('a.embedding')}), 4) AS cos
           FROM assign a JOIN probe p
             ON a.centroid_id = p.list_id AND p.query_id != a.vec_id)
SELECT query_id, neighbor_id, rank, cos FROM (
  SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rank
  FROM scored) WHERE rank <= 5""",
        "ann_pq_encode": f"""WITH {_IVF_CENT},
sub AS (SELECT unnest(range(4)) AS j)
SELECT e.vec_id, s.j AS subspace, c.centroid_id AS code
FROM embeddings e CROSS JOIN sub s CROSS JOIN cent c
QUALIFY row_number() OVER (PARTITION BY e.vec_id, s.j
  ORDER BY {_l2_sql('list_slice(e.embedding, s.j*16+1, s.j*16+16)', 'list_slice(c.cemb, s.j*16+1, s.j*16+16)')}, c.centroid_id) = 1""",
        "ann_pq_residual_topk": f"""WITH {_IVF_CENT},
sub AS (SELECT unnest(range(4)) AS j),
cbs AS (SELECT row_number() OVER (ORDER BY md5(vec_id::VARCHAR), vec_id) AS rn, embedding
        FROM embeddings QUALIFY rn > 16 AND rn <= 32),
cb AS (SELECT s.rn - 16 AS code,
              list_transform(list_zip(s.embedding::DOUBLE[], c.cemb::DOUBLE[]), z -> z[1]-z[2]) AS remb
       FROM cbs s CROSS JOIN cent c
       QUALIFY row_number() OVER (PARTITION BY s.rn
         ORDER BY ({_dot_sql('s.embedding', 'c.cemb')} / {_nrm_sql('c.cemb')}) DESC, c.centroid_id) = 1),
assign AS (SELECT e.vec_id, c.centroid_id AS list_id,
                  list_transform(list_zip(e.embedding::DOUBLE[], c.cemb::DOUBLE[]), z -> z[1]-z[2]) AS remb
           FROM embeddings e CROSS JOIN cent c
           QUALIFY row_number() OVER (PARTITION BY e.vec_id
                                      ORDER BY {_IVF_COS_EC} DESC, c.centroid_id) = 1),
enc AS (SELECT a.vec_id, a.list_id, s.j, b.code
        FROM assign a CROSS JOIN sub s CROSS JOIN cb b
        QUALIFY row_number() OVER (PARTITION BY a.vec_id, s.j
          ORDER BY {_l2_sql('list_slice(a.remb, s.j*16+1, s.j*16+16)', 'list_slice(b.remb, s.j*16+1, s.j*16+16)')}, b.code) = 1),
probe AS (SELECT e.vec_id AS query_id, c.centroid_id AS list_id,
                 list_transform(list_zip(e.embedding::DOUBLE[], c.cemb::DOUBLE[]), z -> z[1]-z[2]) AS qres
          FROM (SELECT * FROM embeddings WHERE vec_id < 20) e CROSS JOIN cent c
          QUALIFY row_number() OVER (PARTITION BY e.vec_id
                                     ORDER BY {_IVF_COS_EC} DESC, c.centroid_id) <= 2),
terms AS (SELECT p.query_id, en.vec_id AS neighbor_id, en.j,
                 {_l2_sql('list_slice(p.qres, en.j*16+1, en.j*16+16)', 'list_slice(b.remb, en.j*16+1, en.j*16+16)')} AS dterm
          FROM enc en
          JOIN probe p ON p.list_id = en.list_id AND p.query_id != en.vec_id
          JOIN cb b ON b.code = en.code),
adcs AS (SELECT query_id, neighbor_id,
                round((((max(dterm) FILTER (WHERE j = 0)
                         + max(dterm) FILTER (WHERE j = 1))
                        + max(dterm) FILTER (WHERE j = 2))
                       + max(dterm) FILTER (WHERE j = 3)), 4) AS adc
         FROM terms GROUP BY query_id, neighbor_id)
SELECT query_id, neighbor_id, rank, adc FROM (
  SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY adc ASC, neighbor_id) AS rank
  FROM adcs) WHERE rank <= 5""",
        "ann_pq_topk": f"""WITH {_IVF_CENT},
sub AS (SELECT unnest(range(4)) AS j),
enc AS (SELECT e.vec_id, s.j, c.centroid_id AS code
        FROM embeddings e CROSS JOIN sub s CROSS JOIN cent c
        QUALIFY row_number() OVER (PARTITION BY e.vec_id, s.j
          ORDER BY {_l2_sql('list_slice(e.embedding, s.j*16+1, s.j*16+16)', 'list_slice(c.cemb, s.j*16+1, s.j*16+16)')}, c.centroid_id) = 1),
assign AS (SELECT e.vec_id, c.centroid_id AS list_id
           FROM embeddings e CROSS JOIN cent c
           QUALIFY row_number() OVER (PARTITION BY e.vec_id
                                      ORDER BY {_IVF_COS_EC} DESC, c.centroid_id) = 1),
probe AS (SELECT e.vec_id AS query_id, e.embedding AS qemb, c.centroid_id AS list_id
          FROM (SELECT * FROM embeddings WHERE vec_id < 20) e CROSS JOIN cent c
          QUALIFY row_number() OVER (PARTITION BY e.vec_id
                                     ORDER BY {_IVF_COS_EC} DESC, c.centroid_id) <= 2),
terms AS (SELECT p.query_id, en.vec_id AS neighbor_id, en.j,
                 {_l2_sql('list_slice(p.qemb, en.j*16+1, en.j*16+16)', 'list_slice(c.cemb, en.j*16+1, en.j*16+16)')} AS dterm
          FROM enc en
          JOIN assign a ON a.vec_id = en.vec_id
          JOIN probe p ON p.list_id = a.list_id AND p.query_id != en.vec_id
          JOIN cent c ON c.centroid_id = en.code),
adcs AS (SELECT query_id, neighbor_id,
                round((((max(dterm) FILTER (WHERE j = 0)
                         + max(dterm) FILTER (WHERE j = 1))
                        + max(dterm) FILTER (WHERE j = 2))
                       + max(dterm) FILTER (WHERE j = 3)), 4) AS adc
         FROM terms GROUP BY query_id, neighbor_id)
SELECT query_id, neighbor_id, rank, adc FROM (
  SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY adc ASC, neighbor_id) AS rank
  FROM adcs) WHERE rank <= 5""",
        "dedup_semantic_semdedup": f"""WITH {_IVF_CENT},
assign AS (SELECT e.vec_id, e.embedding, c.centroid_id AS cluster_id,
                  ({_IVF_COS_EC} / {_nrm_sql('e.embedding')}) AS cc
           FROM embeddings e CROSS JOIN cent c
           QUALIFY row_number() OVER (PARTITION BY e.vec_id
                                      ORDER BY {_IVF_COS_EC} DESC, c.centroid_id) = 1)
SELECT a.vec_id, a.cluster_id, round(a.cc, 4) AS cent_cos,
       CASE WHEN count(*) OVER (PARTITION BY a.cluster_id) > 200 THEN TRUE
       ELSE NOT EXISTS (
         SELECT 1 FROM assign b
         WHERE b.cluster_id = a.cluster_id AND b.vec_id <> a.vec_id
           AND round({_dot_sql('a.embedding', 'b.embedding')}
                     / ({_nrm_sql('a.embedding')} * {_nrm_sql('b.embedding')}), 4) >= 0.2
           AND (b.cc < a.cc OR (b.cc = a.cc AND b.vec_id < a.vec_id))
       ) END AS keep
FROM assign a""",
        "ann_ivf_kmeans": f"""WITH {_IVF_CENT},
a0 AS (SELECT e.vec_id, e.embedding, c.centroid_id AS list_id
       FROM embeddings e CROSS JOIN cent c
       QUALIFY row_number() OVER (PARTITION BY e.vec_id
                                  ORDER BY {_IVF_COS_EC} DESC, c.centroid_id) = 1),
ex AS (SELECT list_id, generate_subscripts(embedding, 1) - 1 AS pos,
              unnest(embedding) AS val FROM a0),
sums AS (SELECT list_id, pos,
                sum(CAST(floor(CAST(val AS DOUBLE) * 1000000000.0) AS DECIMAL(38,0))) AS s,
                count(*) AS n
         FROM ex GROUP BY list_id, pos),
cent1 AS (SELECT c0.centroid_id,
                 coalesce(m.v, c0.cemb::DOUBLE[]) AS cemb
          FROM cent c0 LEFT JOIN
               (SELECT list_id, list((CAST(s AS DOUBLE) / n) / 1000000000.0 ORDER BY pos) AS v
                FROM sums GROUP BY list_id) m
            ON c0.centroid_id = m.list_id)
SELECT e.vec_id, c.centroid_id AS list_id
FROM embeddings e CROSS JOIN cent1 c
QUALIFY row_number() OVER (PARTITION BY e.vec_id
                           ORDER BY {_IVF_COS_EC} DESC, c.centroid_id) = 1""",
        "dedup_cosine_bucketed": f"""WITH b0 AS (SELECT vec_id, embedding, {_BUCKET4} AS bucket FROM embeddings),
b AS (SELECT * FROM b0 QUALIFY count(*) OVER (PARTITION BY bucket) <= 200)
SELECT a.vec_id AS a_id, c.vec_id AS b_id,
       round({_dot_sql('a.embedding', 'c.embedding')} / ({_nrm('a')} * {_nrm('c')}), 4) AS cos
FROM b a JOIN b c ON a.bucket = c.bucket AND a.vec_id < c.vec_id
WHERE round({_dot_sql('a.embedding', 'c.embedding')} / ({_nrm('a')} * {_nrm('c')}), 4) >= 0.2""",
        # training.sampling.dsir_sample: hashed-unigram importance
        # weights vs the lang='en' target, add-one smoothing over 256
        # buckets, per-bucket log-ratio and per-doc Gumbel quantized to
        # 1e-4 units BEFORE any sum (pure-integer aggregates both sides)
        "dsir_sample": f"""WITH feats AS (
  SELECT doc_id, tgt, ({_hex15_of('tok')}) % 256 AS b
  FROM (SELECT doc_id, (lang = 'en') AS tgt, unnest({_TOKS}) AS tok FROM documents)),
counts AS (SELECT b, count(*) AS raw_c,
                  sum(CASE WHEN tgt THEN 1 ELSE 0 END) AS tgt_c
           FROM feats GROUP BY b),
tot AS (SELECT sum(raw_c) AS raw_t, sum(tgt_c) AS tgt_t FROM counts),
model AS (SELECT b,
  CAST(floor((ln((tgt_c + 1.0) / (tgt_t + 256)) - ln((raw_c + 1.0) / (raw_t + 256)))
             * 10000 + 0.5) AS BIGINT) AS lr_q4
  FROM counts, tot),
w AS (SELECT doc_id, CAST(sum(lr_q4) AS BIGINT) AS dsir_w_q4
      FROM feats JOIN model USING (b) GROUP BY doc_id),
g AS (SELECT doc_id, dsir_w_q4,
  CAST(floor(-ln(-ln((({_md5_bucket_sql('doc_id::VARCHAR', 29)}) + 0.5) / 10000.0))
             * 10000 + 0.5) AS BIGINT) AS gumbel_q4 FROM w)
SELECT doc_id, dsir_w_q4, gumbel_q4, dsir_w_q4 + gumbel_q4 AS score_q4
FROM g ORDER BY score_q4 DESC, doc_id LIMIT 100""",
        # training.sampling.source_kl_divergence: per-source hashed-
        # unigram KL vs the corpus, add-one smoothed over ALL 256
        # buckets; each term ln-then-quantized to 1e-8 units before the
        # per-source integer sum (the DSIR discipline)
        "source_kl_divergence": f"""WITH feats AS (
  SELECT source, ({_hex15_of('tok')}) % 256 AS b
  FROM (SELECT source, unnest({_TOKS}) AS tok FROM documents)),
counts AS (SELECT source, b, count(*) AS c FROM feats GROUP BY source, b),
ns AS (SELECT source, sum(c) AS n_s FROM counts GROUP BY source),
cb AS (SELECT b, sum(c) AS c_b FROM counts GROUP BY b),
tot AS (SELECT sum(c) AS n FROM counts),
grid AS (SELECT ns.source, ns.n_s, g.b FROM ns
         CROSS JOIN (SELECT unnest(range(0, 256)) AS b) g),
terms AS (SELECT grid.source, grid.n_s,
  CAST(floor(
    ((coalesce(c.c, 0) + 1.0) / (grid.n_s + 256))
    * (ln((coalesce(c.c, 0) + 1.0) / (grid.n_s + 256))
       - ln((coalesce(cb.c_b, 0) + 1.0) / (tot.n + 256)))
    * 100000000 + 0.5) AS BIGINT) AS tq
  FROM grid
  LEFT JOIN counts c ON c.source = grid.source AND c.b = grid.b
  LEFT JOIN cb ON cb.b = grid.b
  CROSS JOIN tot)
SELECT source, CAST(n_s AS BIGINT) AS n_tokens, CAST(sum(tq) AS BIGINT) AS kl_q8
FROM terms GROUP BY source, n_s""",
        # training.curation.domain_quota: blocklist + per-domain quota of
        # the 5 best-quality docs; the oracle is the PLAIN one-window
        # rank — the salted two-phase plan is provably equal under the
        # (quality DESC, doc_id) total order, which is the point
        "domain_quota": f"""SELECT doc_id, source, quality_q4, rank FROM (
  SELECT doc_id, source, quality_q4,
         row_number() OVER (PARTITION BY source
           ORDER BY quality_q4 DESC, doc_id) AS rank
  FROM (SELECT doc_id, source,
    CASE WHEN len({_TOKS}) > 0 THEN
    floor((0.3 * least(len(text)::DOUBLE / 500.0, 1.0)
        + 0.4 * (len(list_distinct({_TOKS}))::DOUBLE / len({_TOKS}))
        + 0.3 * least(4.0 * len(list_filter({_TOKS}, t -> list_contains({_STOP}, t)))::DOUBLE
                      / len({_TOKS}), 1.0)) * 10000 + 0.5)::BIGINT
    ELSE 0 END AS quality_q4
  FROM documents WHERE source NOT IN ('src0', 'src13')))
WHERE rank <= 5""",
        "text_token_stats": f"""SELECT doc_id, len({_TOKS}) AS n_tokens,
       len(list_distinct({_TOKS})) AS n_distinct,
       CASE WHEN len({_TOKS}) > 0 THEN
         round(len(list_distinct({_TOKS}))::DOUBLE / len({_TOKS}), 4) END AS distinct_ratio,
       CASE WHEN len({_TOKS}) > 0 THEN
         round(list_reduce(list_transform({_TOKS}, t -> len(t)), (a,b) -> a+b)::DOUBLE
               / len({_TOKS}), 4) END AS avg_token_len
FROM documents""",
        "text_tfidf_topk": f"""WITH tf AS (
  SELECT doc_id, term, count(*) AS tf
  FROM (SELECT doc_id, unnest({_TOKS}) AS term FROM documents)
  GROUP BY doc_id, term),
dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
n AS (SELECT count(*) AS n_docs FROM documents)
SELECT doc_id, term, tf, df, rank, tfidf FROM (
  SELECT tf.doc_id, tf.term, tf.tf, d.df,
         round(tf.tf * ln(n.n_docs::DOUBLE / d.df), 4) AS tfidf,
         row_number() OVER (PARTITION BY tf.doc_id
           ORDER BY round(tf.tf * ln(n.n_docs::DOUBLE / d.df), 4) DESC, tf.term) AS rank
  FROM tf JOIN dfreq d USING (term) CROSS JOIN n)
WHERE rank <= 5""",
        # token-budget mixture sampling: per-source rates from the shared
        # MIX_WEIGHTS fixture, md5-bucket threshold keep (parenthesization
        # of the rate expression mirrors the Spark side exactly so the
        # floor() boundary is bit-identical)
        "mixture_sample": f"""WITH toks AS (
  SELECT doc_id, source, len({_TOKS}) AS n_tokens FROM documents),
wts(source, w) AS (VALUES {", ".join(f"('{s}', {w!r})" for s, w in MIX_WEIGHTS.items())}),
tot AS (SELECT source, sum(n_tokens) AS tot FROM toks GROUP BY 1),
rates AS (
  SELECT t.source,
         CAST(CASE WHEN t.tot > 0
              THEN least(10000, floor(10000.0 * (w.w * {float(MIX_BUDGET_TOKENS)!r}) / t.tot))
              ELSE 0 END AS BIGINT) AS cut
  FROM tot t JOIN wts w USING (source))
SELECT k.doc_id, k.source, CAST(k.n_tokens AS INT) AS n_tokens
FROM toks k JOIN rates r USING (source)
WHERE {_md5_bucket_sql('CAST(k.doc_id AS VARCHAR)', seed=7)} < r.cut""",
        # bigram-LM cross-entropy: add-one-smoothed corpus bigram model,
        # per-occurrence nlp rounded to a scaled int BEFORE the per-doc
        # sum (integer math is float-summation-order-proof), integer
        # round-half-up mean
        "text_lm_score": f"""WITH toks AS (SELECT doc_id, {_TOKS} AS t FROM documents),
pairs AS (
  SELECT doc_id, t[i + 1] AS w1, t[i + 2] AS w2
  FROM toks, unnest(range(0, len(t) - 1)) AS u(i)
  WHERE len(t) >= 2),
occ AS (SELECT doc_id, w1, w2, count(*) AS occ FROM pairs GROUP BY 1, 2, 3),
c2 AS (SELECT w1, w2, sum(occ) AS c2 FROM occ GROUP BY 1, 2),
c1 AS (SELECT w1, sum(c2) AS c1 FROM c2 GROUP BY 1),
v AS (SELECT count(DISTINCT tok) AS v FROM toks, unnest(t) AS s(tok)),
scored AS (
  SELECT o.doc_id, o.occ,
         CAST(floor(-ln((c2.c2 + 1.0) / (c1.c1 + v.v)) * 10000 + 0.5)
              AS BIGINT) AS nlp_q4
  FROM occ o JOIN c2 USING (w1, w2) JOIN c1 USING (w1) CROSS JOIN v),
agg AS (SELECT doc_id, sum(occ) AS n, sum(occ * nlp_q4) AS s
        FROM scored GROUP BY 1)
SELECT d.doc_id, CAST(coalesce(a.n, 0) AS BIGINT) AS n_bigrams,
       CAST((2 * a.s + a.n) // (2 * a.n) AS DOUBLE) AS xent_q4
FROM documents d LEFT JOIN agg a USING (doc_id)""",
        # C4 line+page cleanup over the deterministically line-structured
        # corpus (pages CTE mirrors _c4_structured_docs exactly)
        "c4_line_filter": f"""WITH toks AS (SELECT doc_id, {_TOKS} AS t FROM documents),
pages AS (
  SELECT doc_id,
    array_to_string(
      list_transform(
        CASE WHEN len(t) > 0
             THEN range(0, CAST(ceil(1.0 * len(t) / (doc_id % 4 + 3)) AS BIGINT))
             ELSE CAST([] AS BIGINT[]) END,
        i -> array_to_string(list_slice(t, i * (doc_id % 4 + 3) + 1,
                                        (i + 1) * (doc_id % 4 + 3)), ' ')
             || CASE WHEN (doc_id + i) % 13 = 2 THEN ' javascript' ELSE '' END
             || CASE WHEN i = 0 AND doc_id % 97 = 0 THEN ' lorem ipsum' ELSE '' END
             || CASE WHEN i = 0 AND doc_id % 89 = 3 THEN ' {{' ELSE '' END
             || CASE WHEN (doc_id + i) % 4 != 0 THEN '.' ELSE '' END),
      chr(10)) AS text
  FROM toks),
lined AS (SELECT doc_id, text, string_split(text, chr(10)) AS lines FROM pages),
kept AS (
  SELECT doc_id, text, lines,
         list_filter(lines, l ->
           (ends_with(l, '.') OR ends_with(l, '!') OR ends_with(l, '?')
              OR ends_with(l, '"'))
           AND len(list_filter(string_split(l, ' '), w -> w != '')) >= 5
           AND NOT contains(lower(l), 'javascript')) AS kl
  FROM lined)
SELECT doc_id, CAST(len(lines) AS INT) AS n_lines, CAST(len(kl) AS INT) AS n_kept,
       array_to_string(kl, chr(10)) AS clean_text
FROM kept
WHERE NOT contains(lower(text), 'lorem ipsum')
  AND NOT contains(text, '{{')
  AND len(kl) >= 3""",
        "pii_scrub": r"""WITH seeded AS (
  SELECT doc_id,
         CASE WHEN doc_id % 3 = 0 THEN
                text || ' contact user' || doc_id::VARCHAR || '@example.com now'
              WHEN doc_id % 3 = 1 THEN
                text || ' server at 10.' || (doc_id % 256)::VARCHAR || '.'
                     || (doc_id % 200)::VARCHAR || '.'
                     || (doc_id % 250)::VARCHAR || ' up'
              ELSE text END AS text
  FROM documents)
SELECT doc_id,
  (CASE WHEN text IS NULL THEN 0 ELSE
     len(regexp_extract_all(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}'))
   END)::BIGINT AS n_email,
  (CASE WHEN text IS NULL THEN 0 ELSE
     len(regexp_extract_all(text, '\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b'))
   END)::BIGINT AS n_ipv4,
  regexp_replace(
    regexp_replace(text,
      '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
    '\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b', '<IPV4>', 'g') AS scrubbed
FROM seeded""",
        "sketch_hist_quantiles": """WITH vals AS (
  SELECT n_chars::BIGINT AS v FROM documents WHERE n_chars IS NOT NULL),
stats AS (
  SELECT min(v) AS vmin, max(v) AS vmax, count(*) AS n,
         ((max(v) - min(v)) // 128) + 1 AS width
  FROM vals HAVING count(*) > 0),
counts AS (
  SELECT (v - vmin) // width AS bucket, count(*) AS c
  FROM vals CROSS JOIN stats GROUP BY 1),
cum AS (
  SELECT bucket, sum(c) OVER (ORDER BY bucket ROWS UNBOUNDED PRECEDING) AS cum
  FROM counts),
hit AS (
  SELECT p_pct, n, vmin, width, bucket
  FROM cum CROSS JOIN stats
       CROSS JOIN (SELECT unnest([50, 90, 99]) AS p_pct) ps
  WHERE cum * 100 >= p_pct * n)
SELECT (p_pct / 100.0)::DOUBLE AS p, n::BIGINT AS n,
       min(bucket)::BIGINT AS bucket,
       (vmin + (min(bucket) + 1) * width - 1)::BIGINT AS est
FROM hit GROUP BY p_pct, n, vmin, width""",
        "join_asof": """WITH l AS (
  SELECT event_id, user_id, ts, value FROM events WHERE event_type = 'purchase'),
t AS (
  SELECT user_id, ts, max(event_id) AS event_id, max_by(value, event_id) AS value
  FROM events WHERE event_type = 'click' GROUP BY user_id, ts)
SELECT l.event_id, l.user_id, l.ts, l.value,
       t.ts AS ref_ts, t.event_id AS ref_event_id, t.value AS ref_value
FROM l ASOF LEFT JOIN t ON l.user_id = t.user_id AND l.ts >= t.ts""",
        "join_range": """WITH f AS (
  SELECT event_id, user_id, ts, value FROM events WHERE event_type = 'purchase'),
s AS (
  SELECT user_id, ts AS start_ts, ts + INTERVAL 1 HOUR AS end_ts,
         event_id AS signup_event_id
  FROM events WHERE event_type = 'signup')
SELECT f.event_id, f.user_id, f.ts, f.value,
       s.start_ts, s.end_ts, s.signup_event_id
FROM f JOIN s ON f.user_id = s.user_id
             AND f.ts >= s.start_ts AND f.ts < s.end_ts""",
        "hypertable_rollup": """WITH b AS (
  SELECT event_type, value, date_trunc('hour', ts) AS b1h, date_trunc('day', ts) AS b1d
  FROM events)
SELECT '1h' AS grain, b1h AS bucket, event_type,
       count(*)::BIGINT AS n_events,
       (sum(CAST(round(value * 100, 0) AS BIGINT)) / 100.0)::DOUBLE AS sum_value
FROM b GROUP BY b1h, event_type
UNION ALL
SELECT '1d', b1d, event_type, count(*)::BIGINT,
       (sum(CAST(round(value * 100, 0) AS BIGINT)) / 100.0)::DOUBLE
FROM b GROUP BY b1d, event_type""",
        "sketch_bloom": f"""WITH bits AS (
  SELECT DISTINCT unnest([{", ".join(f"({_hex15_of(_bloom_arg(j))} % {_BLOOM_M})" for j in range(_BLOOM_K))}]) AS bit
  FROM documents WHERE doc_id % 2 = 0),
probe AS (
  SELECT doc_id,
         unnest([{", ".join(f"({_hex15_of(_bloom_arg(j))} % {_BLOOM_M})" for j in range(_BLOOM_K))}]) AS bit
  FROM documents),
hits AS (
  SELECT p.doc_id, count(*) AS n_hits
  FROM probe p JOIN bits b ON p.bit = b.bit GROUP BY p.doc_id)
SELECT d.doc_id, coalesce(h.n_hits, 0)::BIGINT AS n_hits,
       coalesce(h.n_hits, 0) = {_BLOOM_K} AS maybe_member
FROM documents d LEFT JOIN hits h ON h.doc_id = d.doc_id""",
        "sketch_cms_topk": f"""WITH toks AS (SELECT unnest({_TOKS}) AS tok FROM documents),
cells AS (
  {" UNION ALL ".join(f"SELECT {j} AS d, ({_hex15_of(_cms_arg(j))} % {_CMS_W}) AS pos FROM toks" for j in range(_CMS_D))}),
sketch AS (SELECT d, pos, count(*) AS c FROM cells GROUP BY d, pos),
cand AS (SELECT tok, count(*) AS true_count FROM toks GROUP BY tok
         ORDER BY true_count DESC, tok LIMIT 20),
cprobe AS (
  {" UNION ALL ".join(f"SELECT tok, true_count, {j} AS d, ({_hex15_of(_cms_arg(j))} % {_CMS_W}) AS pos FROM cand" for j in range(_CMS_D))})
SELECT p.tok, p.true_count, min(s.c) AS cms_est
FROM cprobe p JOIN sketch s ON p.d = s.d AND p.pos = s.pos
GROUP BY p.tok, p.true_count""",
        "sketch_hll_shingles": f"""WITH sh AS (SELECT unnest({_SH3}) AS s FROM documents),
hr AS (SELECT (h % {_HLL_M}) AS bucket,
              ({_HLL_REST_BITS} - length(ltrim(bin(h // {_HLL_M}), '0')) + 1) AS rank
       FROM (SELECT {_hex15_of("s")} AS h FROM sh)),
regs AS (SELECT bucket, max(rank) AS reg FROM hr GROUP BY bucket),
agg AS (SELECT count(*) AS nz,
               coalesce(sum((1::BIGINT << (60 - reg))::HUGEINT), 0::HUGEINT) AS sum_nz
        FROM regs)
SELECT {_HLL_M} AS m,
       (SELECT count(DISTINCT s) FROM sh) AS true_distinct,
       nz::BIGINT AS nonzero_registers,
       round({_HLL_NUMER!r} /
             (sum_nz + (({_HLL_M} - nz)::HUGEINT * ((1::BIGINT << 60)::HUGEINT)))::DOUBLE,
             4) AS hll_estimate
FROM agg""",
        # training.classify.hashed_logit_score: fastText-posture hashed
        # bag-of-words linear classifier. Weights derive arithmetically
        # from the bucket id on BOTH sides (pseudo_weights_q4's three
        # integers), so no 256-row VALUES table; integer sum, round-
        # half-away mean via the floor((2|s|+n)/(2n)) identity
        "quality_linear_logit": f"""WITH bw AS (
  SELECT doc_id, list_transform({_TOKS},
    t -> ((({_hex15_of('t')}) % 256) * 2654435761) % 20001 - 10000) AS bs
  FROM documents),
s AS (SELECT doc_id, len(bs) AS n_tokens, list_sum(bs)::BIGINT AS sum_w_q4 FROM bw),
l AS (SELECT doc_id, n_tokens, CASE WHEN n_tokens > 0 THEN sum_w_q4 END AS sum_w_q4,
  CASE WHEN n_tokens > 0 THEN
    (CASE WHEN sum_w_q4 >= 0 THEN floor((2*sum_w_q4 + n_tokens)::DOUBLE/(2*n_tokens))
          ELSE -floor((2*(-sum_w_q4) + n_tokens)::DOUBLE/(2*n_tokens)) END)::BIGINT
  END AS logit_q4 FROM s)
SELECT doc_id, n_tokens, sum_w_q4, logit_q4,
       coalesce(logit_q4 >= 0, false) AS keep FROM l""",
        "text_quality_score": f"""SELECT doc_id,
  CASE WHEN len({_TOKS}) > 0 THEN
  floor((0.3 * least(len(text)::DOUBLE / 500.0, 1.0)
      + 0.4 * (len(list_distinct({_TOKS}))::DOUBLE / len({_TOKS}))
      + 0.3 * least(4.0 * len(list_filter({_TOKS}, t -> list_contains({_STOP}, t)))::DOUBLE
                    / len({_TOKS}), 1.0)) * 10000 + 0.5)::BIGINT
  ELSE 0 END AS quality_q4
FROM documents""",
        "text_lang_id": f"""SELECT doc_id,
  CASE WHEN len({_TOKS}) > 0 AND
            len(list_filter({_TOKS}, t -> list_contains({_STOP}, t)))::DOUBLE
            / len({_TOKS}) > 0.02 THEN 'en' ELSE 'unknown' END AS pred_lang
FROM documents""",
        "doc_fingerprint": f"""SELECT doc_id,
  list_min(list_transform({_SH3}, s -> md5(s))) AS fp
FROM documents""",
        "chunk_documents": f"""WITH base AS (
  SELECT doc_id, {_WTOKS} AS toks, len({_WTOKS}) AS n FROM documents
), idx AS (
  SELECT doc_id, toks,
         unnest(range(0, CASE WHEN n > 0
           THEN 1 + CAST(ceil(greatest(n - 16, 0) / 12.0) AS INT)
           ELSE 0 END)) AS chunk_idx
  FROM base)
SELECT doc_id, chunk_idx::INT AS chunk_idx,
  array_to_string(list_slice(toks, chunk_idx*12 + 1, chunk_idx*12 + 16), ' ') AS chunk_text,
  len(list_slice(toks, chunk_idx*12 + 1, chunk_idx*12 + 16))::INT AS n_tokens
FROM idx""",
        "vocab_topk": f"""SELECT token, count(*)::BIGINT AS n
FROM (SELECT unnest({_WTOKS}) AS token FROM documents)
GROUP BY token ORDER BY n DESC, token LIMIT 50""",
        "text_repetition_stats": _REPSTATS_SQL,
        "quality_gate_gopher": f"""SELECT * FROM ({_REPSTATS_SQL})
WHERE n_words >= 20 AND n_words <= 100000
  AND mean_word_len_q4 BETWEEN 30000 AND 100000
  AND symbol_word_ratio_q4 <= 1000
  AND bullet_line_frac_q4 <= 9000 AND ellipsis_line_frac_q4 <= 3000
  AND alpha_word_frac_q4 >= 8000
  AND dup_line_frac_q4 <= 3000 AND dup_line_char_frac_q4 <= 2000
  AND top2gram_frac_q4 <= 2000 AND dup5gram_frac_q4 <= 1500""",
        # text payloads take the deterministic RAW fallback of the real
        # codec path (training/multimodal.py:_raw_features — PNG/BMP/WAV
        # decode real media; the round-trip pytest covers those), so the
        # full mapInPandas path is oracle-checkable: same polynomial
        # checksum folded in DuckDB (documents are ASCII -> char ops ==
        # byte ops)
        "multimodal_features": """WITH c AS (
  SELECT doc_id,
         length(text)::INT AS n_bytes,
         list_reduce(
           [0::BIGINT] || list_transform(
             range(1, least(length(text), 4096) + 1),
             i -> ascii(substring(text, i, 1))::BIGINT),
           (a, b) -> (a * 131 + b) % 4294967296) AS checksum,
         lower(hex(substring(text, 1, 8))) AS head
  FROM documents)
SELECT doc_id, 'raw' AS format, n_bytes, checksum,
       head,
       (checksum % 640 + 1)::INT AS width,
       ((checksum // 640) % 480 + 1)::INT AS height,
       0::INT AS channels, 0::INT AS sample_rate, 0::INT AS n_frames,
       0::BIGINT AS mean_q3
FROM c""",
    }
    # OPQ-rotated IVF-PQ: the exact ann_pq_topk pipeline run over the
    # rotated corpus — prepend the rotation CTEs (sign masks shared with
    # training.similarity.rotation_masks; list_reduce replays the Spark
    # left-fold addition order bit-exactly, and the trailing + 0.0
    # mirrors the fold's 0.0 init so an all-zero row's -0.0 normalizes
    # the same way) and point every embeddings reference at remb.
    # MATERIALIZED: remb is referenced by three CTEs; inlined, DuckDB
    # would recompute the 4k-flop rotation inside the 16-way centroid
    # cross joins.
    import re as _re

    masks = ", ".join(str(m) for m in _rotation_masks(64))
    rot = (
        "rmat AS (SELECT list_transform([" + masks + "], "
        "m -> list_transform(range(0, 64), j -> CASE WHEN (m >> CAST(j AS INT)) & 1 = 1 "
        "THEN CAST(-0.125 AS DOUBLE) ELSE CAST(0.125 AS DOUBLE) END)) AS rws), "
        "remb AS MATERIALIZED (SELECT e.vec_id, list_transform(range(0, 64), "
        "i -> list_reduce(list_transform(list_zip(r.rws[CAST(i AS INT) + 1], e.embedding), "
        "s -> s[1] * s[2]), (a, x) -> a + x) + CAST(0.0 AS DOUBLE)) AS embedding "
        "FROM embeddings e CROSS JOIN rmat r)"
    )
    pq = sqls["ann_pq_topk"]
    assert pq.startswith("WITH ")
    sqls["ann_opq_topk"] = "WITH " + rot + ", " + _re.sub(
        r"\bembeddings\b", "remb", pq[len("WITH "):]
    )
    # FAISS refine stage (IndexRefineFlat): the shortlist CTE is the
    # literal ann_pq_topk oracle widened to k'=20 (nested-CTE-wrapped,
    # same pattern as dedup_lsh_verified); the rescore is the exact
    # brute-force cosine over just those (query, neighbor) pairs, ranked
    # with brute_force_topk's conventions (cos desc, neighbor_id asc)
    shortk = pq.replace("WHERE rank <= 5", "WHERE rank <= 20")
    sqls["ann_pq_rerank"] = f"""WITH short AS ({shortk}),
ex AS (SELECT s.query_id, s.neighbor_id,
              round({_dot_sql('q.embedding', 'n.embedding')}
                    / ({_nrm_sql('q.embedding')} * {_nrm_sql('n.embedding')}), 4) AS cos
       FROM short s
       JOIN embeddings q ON q.vec_id = s.query_id
       JOIN embeddings n ON n.vec_id = s.neighbor_id)
SELECT query_id, neighbor_id, rank, cos FROM (
  SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rank
  FROM ex) WHERE rank <= 5"""
    # ANN recall@5: exact top-5 over the SAME 20-query probe set (the
    # bruteforce oracle widened from vec_id<5), each index's oracle CTE
    # reused verbatim (nested-CTE-wrapped), hit-counted per method via a
    # left join — count(a.*) / count(*) is recall over exact pairs
    exact5 = sqls["ann_bruteforce_topk"].replace("vec_id < 5", "vec_id < 20")

    def _rec(name: str, cte: str) -> str:
        return (
            f"SELECT '{name}' AS method, "
            "round(count(a.neighbor_id)::DOUBLE / count(*), 4) AS recall, "
            "count(*)::BIGINT AS n_pairs "
            f"FROM ex e LEFT JOIN (SELECT query_id, neighbor_id FROM {cte}) a "
            "ON a.query_id = e.query_id AND a.neighbor_id = e.neighbor_id"
        )

    sqls["ann_recall"] = (
        f"WITH ex AS ({exact5}),\n"
        f"lshm AS ({sqls['ann_lsh_topk']}),\n"
        f"ivfm AS ({sqls['ann_ivf_topk']}),\n"
        f"adcm AS ({sqls['ann_pq_topk']}),\n"
        f"rrm AS ({sqls['ann_pq_rerank']})\n"
        + " UNION ALL ".join(
            [
                _rec("lsh", "lshm"),
                _rec("ivf", "ivfm"),
                _rec("pq_adc", "adcm"),
                _rec("pq_rerank", "rrm"),
            ]
        )
    )
    # corpus-level line dedup: derive the same 8-word-line corpus (the
    # identical list_slice fold as chunk_documents' twin), count lines
    # corpus-wide, strike >=2-copy lines, reassemble in order
    sqls["dedup_lines_corpus"] = f"""WITH multi AS (
  SELECT doc_id, array_to_string(
    list_transform(range(0, CAST(ceil(len(toks)/8.0) AS INT)),
                   i -> array_to_string(list_slice(toks, i*8+1, i*8+8), ' ')),
    chr(10)) AS text
  FROM (SELECT doc_id, {_WTOKS} AS toks FROM documents)
), lines AS (
  SELECT doc_id, arr[i] AS line, i AS pos, len(arr) AS total
  FROM (SELECT doc_id, string_split(text, chr(10)) AS arr FROM multi),
       UNNEST(generate_series(1, len(arr))) AS t(i)
), dup AS (
  SELECT line FROM lines GROUP BY line HAVING count(*) >= 2
)
SELECT l.doc_id,
       string_agg(l.line, chr(10) ORDER BY l.pos) AS text_clean,
       count(*)::INT AS kept_lines,
       (any_value(l.total) - count(*))::INT AS removed_lines
FROM lines l LEFT JOIN dup d ON l.line = d.line
WHERE d.line IS NULL
GROUP BY l.doc_id"""
    # winnowing: same k=4 shingle md5s, same rightmost-min-per-window
    # pick via list_reverse/list_position, DISTINCT = array_distinct
    sqls["winnow_fingerprints"] = f"""WITH sh AS (
  SELECT doc_id,
    list_transform(range(0, greatest(len({_TOKS})-3, 0)),
      i -> md5(array_to_string(list_slice({_TOKS}, i+1, i+4), ' '))) AS h
  FROM documents
), win AS (
  SELECT doc_id, h,
    CASE WHEN len(h) >= 1
      THEN range(0, greatest(len(h)-4, 0) + 1) ELSE [] END AS starts
  FROM sh
), sel AS (
  SELECT doc_id,
    unnest(list_transform(starts, i -> {{
      'pos': i + len(list_slice(h, i+1, i+4))
             - list_position(list_reverse(list_slice(h, i+1, i+4)),
                             list_min(list_slice(h, i+1, i+4))),
      'fp': list_min(list_slice(h, i+1, i+4)) }})) AS s
  FROM win)
SELECT DISTINCT doc_id, CAST(s.pos AS INT) AS pos, s.fp AS fp FROM sel""";
    # signature-space Jaccard estimate over the capped LSH candidates
    sqls["dedup_sig_estimate"] = f"""WITH cand AS ({sqls['dedup_minhash_lsh']}),
sigs AS (SELECT doc_id, {_SIG} AS sig FROM documents),
j AS (SELECT c.a_id, c.b_id, sa.sig AS s1, sb.sig AS s2
      FROM (SELECT a_id, b_id FROM cand) c
      JOIN sigs sa ON c.a_id = sa.doc_id
      JOIN sigs sb ON c.b_id = sb.doc_id),
z AS (SELECT a_id, b_id,
  list_transform(list_zip(s1, s2),
    p -> CASE WHEN p[1] IS NOT NULL AND p[2] IS NOT NULL
              THEN (CASE WHEN p[1] = p[2] THEN 2 ELSE 1 END)
              ELSE 0 END) AS zz
  FROM j)
SELECT a_id, b_id,
  round(len(list_filter(zz, v -> v = 2))::DOUBLE
        / nullif(len(list_filter(zz, v -> v >= 1)), 0), 4) AS est_jaccard,
  len(list_filter(zz, v -> v = 2))::BIGINT AS n_agree,
  len(list_filter(zz, v -> v >= 1))::BIGINT AS n_valid
FROM z""";
    # packing-efficiency report over the pack_sequences CTE
    sqls["pack_stats"] = f"""WITH p AS ({sqls['pack_sequences']}),
s AS (SELECT shard, count(*)::BIGINT AS n_docs,
        sum(n_tokens)::BIGINT AS n_tokens,
        coalesce(max(CASE WHEN n_tokens > 0
                     THEN pack_id + n_packs - 1 END) + 1, 0)::BIGINT
          AS packs_used,
        sum(CASE WHEN n_packs > 1 THEN 1 ELSE 0 END) AS straddlers
      FROM p GROUP BY shard)
SELECT shard, n_docs, n_tokens, packs_used,
  floor(10000.0 * n_tokens / nullif(packs_used * 256, 0) + 0.5)::BIGINT
    AS fill_rate_q4,
  floor(10000.0 * straddlers / n_docs + 0.5)::BIGINT AS straddle_frac_q4
FROM s"""
    # token entropy: grouped counts + exact integer sum of the same
    # 1e-6-quantized c*log2(c) terms the Spark fold accumulates
    sqls["text_token_entropy"] = f"""WITH t AS (
  SELECT doc_id, unnest({_TOKS}) AS tok FROM documents
), c AS (
  SELECT doc_id, tok, count(*)::BIGINT AS c FROM t GROUP BY doc_id, tok
), s AS (
  SELECT doc_id,
         sum(CAST(floor(c * log2(c) * 1e6 + 0.5) AS BIGINT)) AS sq,
         sum(c)::BIGINT AS n
  FROM c GROUP BY doc_id)
SELECT doc_id, n AS n_tokens,
  CAST(floor((log2(n) - (sq / 1e6) / n) * 10000 + 0.5) AS BIGINT)
    AS entropy_q4,
  CAST(floor(((log2(n) - (sq / 1e6) / n) / nullif(log2(n), 0)) * 10000
             + 0.5) AS BIGINT) AS entropy_ratio_q4
FROM s WHERE n >= 1""";
    # IVF balance: sizes over the assign CTE, FAISS imbalance formula
    sqls["ann_ivf_balance"] = f"""WITH asg AS ({sqls['ann_ivf_assign']}),
sizes AS (SELECT list_id, count(*)::BIGINT AS n FROM asg GROUP BY list_id)
SELECT count(*)::INT AS n_lists_used,
  min(n)::BIGINT AS min_size, max(n)::BIGINT AS max_size,
  floor(10000.0 * sum(n) / 16)::BIGINT AS mean_size_q4,
  floor(10000.0 * 16 * sum(n*n) / (sum(n) * sum(n)))::BIGINT AS imbalance_q4
FROM sizes"""
    # incremental dedup: the Bloom stage is prune-only, so the twin is
    # the plain anti-join + lowest-id intra-batch collapse
    sqls["dedup_incremental"] = """WITH seen AS (
  SELECT * FROM documents WHERE doc_id % 10 != 7
), batch AS (
  SELECT * FROM documents WHERE doc_id % 10 = 7
), newb AS (
  SELECT b.* FROM batch b
  LEFT JOIN (SELECT DISTINCT md5(text) AS h FROM seen) s
    ON md5(b.text) = s.h
  WHERE s.h IS NULL
), w AS (
  SELECT md5(text) AS h, min(doc_id) AS keep FROM newb GROUP BY md5(text)
)
SELECT n.* FROM newb n
JOIN w ON md5(n.text) = w.h AND n.doc_id = w.keep""";
    # corpus health ROLLUP: GROUPING(source, lang) is the same bitmask
    # as Spark's grouping_id(); q4 fixed-point floors keep every
    # fraction integer-exact
    sqls["corpus_health"] = f"""SELECT source, lang,
  GROUPING(source, lang)::INT AS lvl,
  count(*)::BIGINT AS n_docs,
  sum(len({_TOKS}))::BIGINT AS n_tokens,
  floor(10000.0 * sum(len({_TOKS})) / count(*))::BIGINT AS avg_tokens_q4,
  floor(10000.0 * sum(CASE WHEN len({_TOKS}) < 20 THEN 1 ELSE 0 END)
        / count(*))::BIGINT AS short_frac_q4,
  count(DISTINCT md5(text))::BIGINT AS distinct_docs,
  floor(10000.0 * (count(*) - count(DISTINCT md5(text)))
        / count(*))::BIGINT AS dup_frac_q4
FROM documents GROUP BY ROLLUP (source, lang)""";
    # semantic decontamination: pairwise cross join + grouped max in
    # SQL == the Spark HOF probe, because rounding happens per pair
    # BEFORE max/threshold in both
    sqls["decontaminate_semantic"] = f"""WITH scored AS (
  SELECT t.vec_id,
         round({_dot_sql('t.embedding', 'e.embedding')}
               / ({_nrm('t')} * {_nrm('e')}), 4) AS cos
  FROM (SELECT * FROM embeddings
        WHERE NOT (vec_id % 50 = 0 AND vec_id < 2500)) t
  CROSS JOIN (SELECT * FROM embeddings
              WHERE vec_id % 50 = 0 AND vec_id < 2500) e)
SELECT vec_id, max(cos) AS max_cos,
       count(*) FILTER (cos >= 0.4)::INT AS n_hits
FROM scored GROUP BY vec_id HAVING count(*) FILTER (cos >= 0.4) >= 1""";
    # MOSS match step over the winnowing CTE: df-capped fp self-join,
    # distinct shared-fp count per ordered pair
    sqls["winnow_match_pairs"] = f"""WITH fps AS (
{sqls['winnow_fingerprints']}
), docfp AS (SELECT DISTINCT doc_id, fp FROM fps),
keep AS (SELECT fp FROM docfp GROUP BY fp HAVING count(*) <= 50),
bounded AS (SELECT d.doc_id, d.fp FROM docfp d JOIN keep k ON d.fp = k.fp)
SELECT a.doc_id AS a_id, b.doc_id AS b_id, count(*)::BIGINT AS shared_fps
FROM bounded a JOIN bounded b ON a.fp = b.fp AND a.doc_id < b.doc_id
GROUP BY a.doc_id, b.doc_id HAVING count(*) >= 2""";
    # LSH banding S-curve: identical closed form, same 4-decimal
    # rounding soaking libm-pow ulp differences
    sqls["lsh_tuning_curve"] = """WITH cfg(bands, rows_per_band) AS (
  VALUES (4, 2), (8, 4), (16, 2), (4, 8)
), g AS (SELECT i/20.0 AS s FROM UNNEST(generate_series(1, 19)) AS t(i))
SELECT bands, rows_per_band, round(s, 4) AS s,
  round(1 - pow(1 - pow(s, rows_per_band), bands), 4) AS p_candidate,
  round(pow(1.0/bands, 1.0/rows_per_band), 4) AS s_threshold
FROM cfg, g"""
    # temperature mixing: the same 1e9 fixed-point quantization BEFORE
    # the normalizing sum makes the result accumulation-order-free
    sqls["mixture_temperature"] = f"""WITH per AS (
  SELECT source, count(*)::BIGINT AS n_docs,
         sum(len({_TOKS}))::BIGINT AS n_tokens
  FROM documents GROUP BY source
), q AS (
  SELECT *, n_tokens::DOUBLE / sum(n_tokens) OVER () AS p_raw,
         CAST(round(pow(n_tokens::DOUBLE / sum(n_tokens) OVER (), 0.3) * 1e9)
              AS BIGINT) AS pow_q
  FROM per)
SELECT source, n_docs, n_tokens, round(p_raw, 6) AS p_raw,
  round(pow_q::DOUBLE / sum(pow_q) OVER (), 6) AS p_temp,
  round((pow_q::DOUBLE / sum(pow_q) OVER ()) / p_raw, 4) AS boost
FROM q"""
    # curation funnel: literal composition of the three stage oracles
    # (each a full statement, nested-CTE-wrapped) joined on doc_id — the
    # SQL twin of the one-plan Spark funnel
    sqls["curation_funnel"] = f"""WITH gate AS ({sqls['quality_gate_gopher']}),
lm AS ({sqls['text_lm_score']}),
mixed AS ({sqls['mixture_sample']})
SELECT g.doc_id, m.source, g.n_words, l.n_bigrams, l.xent_q4, m.n_tokens
FROM gate g JOIN lm l USING (doc_id) JOIN mixed m USING (doc_id)
WHERE l.xent_q4 <= 34000"""
    # LSH -> exact-Jaccard verify: the candidate CTE is the literal
    # dedup_minhash_lsh oracle (nested-CTE-wrapped); the verify is a
    # per-pair list_intersect over per-doc distinct shingle sets —
    # identical set math to Spark's array_intersect (order-free: only
    # set SIZES enter the score)
    sqls["dedup_lsh_verified"] = f"""WITH cand AS ({sqls['dedup_minhash_lsh']}),
sh AS (SELECT doc_id, list_distinct({_SH3}) AS sh FROM documents)
SELECT a_id, b_id, jaccard FROM (
  SELECT c.a_id, c.b_id,
         round(len(list_intersect(a.sh, b.sh))::DOUBLE /
               (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))),
               4) AS jaccard
  FROM cand c
  JOIN sh a ON a.doc_id = c.a_id
  JOIN sh b ON b.doc_id = c.b_id)
WHERE jaccard >= 0.8"""
    # end-to-end verified fuzzy dedup: the closure runs over VERIFIED
    # edges only (the dedup_clusters closure runs over raw LSH
    # candidates — the difference IS the verify stage, so a band-
    # collision false positive must not merge two clusters here)
    sqls["fuzzy_dedup_funnel"] = f"""WITH RECURSIVE verified AS ({sqls['dedup_lsh_verified']}),
edges AS (SELECT a_id AS src, b_id AS dst FROM verified
          UNION SELECT b_id AS src, a_id AS dst FROM verified),
reach(a, b) AS (
  SELECT src, dst FROM edges
  UNION
  SELECT r.a, e.dst FROM reach r JOIN edges e ON r.b = e.src),
cl AS (SELECT d.doc_id, least(d.doc_id, coalesce(min(r.b), d.doc_id)) AS cluster_id
       FROM documents d LEFT JOIN reach r ON r.a = d.doc_id
       GROUP BY d.doc_id),
cnt AS (SELECT cluster_id, count(*) AS n_members FROM cl GROUP BY cluster_id)
SELECT c.doc_id, c.cluster_id, n.n_members, (c.doc_id = c.cluster_id) AS keep
FROM cl c JOIN cnt n USING (cluster_id)"""
    # cluster-size histogram over the verified funnel's clustering
    sqls["dedup_cluster_hist"] = f"""WITH f AS ({sqls['fuzzy_dedup_funnel']})
SELECT n_members, count(DISTINCT cluster_id)::BIGINT AS n_clusters,
       count(*)::BIGINT AS n_docs
FROM f GROUP BY n_members"""
    # source×source overlap matrix over the verified pairs CTE
    sqls["dedup_source_matrix"] = f"""WITH vp AS ({sqls['dedup_lsh_verified']})
SELECT least(coalesce(da.source, 'unknown'), coalesce(db.source, 'unknown')) AS source_a,
       greatest(coalesce(da.source, 'unknown'), coalesce(db.source, 'unknown')) AS source_b,
       count(*)::BIGINT AS n_pairs
FROM vp JOIN documents da ON vp.a_id = da.doc_id
        JOIN documents db ON vp.b_id = db.doc_id
GROUP BY 1, 2"""
    # CCNet head/middle/tail perplexity tertiles: the scores CTE is the
    # literal text_lm_score oracle; thresholds replay the integer
    # quantile-sketch CTE chain (sketch_hist_quantiles) over the score
    # column; labeling is CASE over the two pivoted thresholds
    sqls["ccnet_ppl_buckets"] = f"""WITH scores AS ({sqls['text_lm_score']}),
vals AS (SELECT xent_q4::BIGINT AS v FROM scores WHERE xent_q4 IS NOT NULL),
stats AS (
  SELECT min(v) AS vmin, max(v) AS vmax, count(*) AS n,
         ((max(v) - min(v)) // 128) + 1 AS width
  FROM vals HAVING count(*) > 0),
counts AS (
  SELECT (v - vmin) // width AS bucket, count(*) AS c
  FROM vals CROSS JOIN stats GROUP BY 1),
cum AS (
  SELECT bucket, sum(c) OVER (ORDER BY bucket ROWS UNBOUNDED PRECEDING) AS cum
  FROM counts),
hit AS (
  SELECT p_pct, vmin, width, min(bucket) AS bucket
  FROM cum CROSS JOIN stats
       CROSS JOIN (SELECT unnest([33, 66]) AS p_pct) ps
  WHERE cum * 100 >= p_pct * n
  GROUP BY p_pct, vmin, width),
est AS (SELECT p_pct, vmin + (bucket + 1) * width - 1 AS est FROM hit),
thr AS (SELECT min(CASE WHEN p_pct = 33 THEN est END) AS t33,
               min(CASE WHEN p_pct = 66 THEN est END) AS t66 FROM est)
SELECT s.doc_id, s.n_bigrams, s.xent_q4,
       CASE WHEN s.xent_q4 IS NULL THEN 'unscored'
            WHEN s.xent_q4 <= t33 THEN 'head'
            WHEN s.xent_q4 <= t66 THEN 'middle'
            ELSE 'tail' END AS ppl_bucket
FROM scores s CROSS JOIN thr"""
    # BPE merge learning: a generated n-round CTE chain — round r counts
    # weighted adjacent symbol pairs over the vocab state w{r-1}, takes
    # the (count desc, a, b) argmax, and applies the merge via the same
    # wrapped-string literal replace() Spark uses (left-to-right
    # non-overlapping in BOTH engines, so every round is bit-identical)
    sqls["bpe_merges"] = _bpe_oracle_sql(8)
    # encode path: the same chain read out at the merged-vocab end
    sqls["bpe_tokenize"] = _bpe_oracle_sql(8, tokenize=True)
    # --- deterministic splits + shuffle -------------------------------
    _split_case = (
        "CASE WHEN " + _md5_bucket_sql("{k}", 17) + " < 9800 THEN 'train' "
        "WHEN " + _md5_bucket_sql("{k}", 17) + " < 9900 THEN 'val' "
        "ELSE 'test' END"
    )
    sqls["split_train_val_test"] = f"""
SELECT doc_id, {_split_case.format(k="doc_id::VARCHAR")} AS split
FROM documents"""
    _cs_key = (
        "COALESCE(CASE WHEN doc_id % 3 != 0 THEN "
        "CAST(FLOOR(doc_id / 10.0) AS BIGINT)::VARCHAR END, doc_id::VARCHAR)"
    )
    sqls["split_cluster_safe"] = f"""
SELECT doc_id, {_split_case.format(k=_cs_key)} AS split
FROM documents"""
    sqls["shuffle_order"] = f"""
WITH keyed AS (
  SELECT doc_id,
         ({_md5_bucket_sql("doc_id::VARCHAR", 17)}) % 16 AS shard,
         {_md5_hash60_sql("'17:pos:' || doc_id::VARCHAR")} AS ok
  FROM documents
)
SELECT doc_id, CAST(shard AS INTEGER) AS shard,
       CAST(row_number() OVER (PARTITION BY shard ORDER BY ok, doc_id) AS INTEGER) AS pos
FROM keyed"""
    sqls["token_budget_cut"] = """
WITH scored AS (
  SELECT doc_id,
         CAST(n_chars % 100 AS DOUBLE) AS score,
         CAST(n_chars % 50 + 1 AS BIGINT) AS toks
  FROM documents
)
SELECT doc_id, score, toks FROM (
  SELECT doc_id, score, toks,
         SUM(toks) OVER (ORDER BY score DESC, doc_id
                         ROWS UNBOUNDED PRECEDING) AS cum
  FROM scored
) WHERE cum <= 6000"""
    return sqls


def _bpe_oracle_sql(n_merges: int, tokenize: bool = False) -> str:
    """n-round BPE chain; ``tokenize=False`` emits the merge table,
    ``tokenize=True`` emits the ENCODE result — per distinct word, its
    frequency and subword count after all n merges (the final ``w{n}``
    vocab state IS the encoded lexicon, so the tokenize oracle is the
    same chain read out at the other end)."""
    sep, dsep = "chr(31)", "chr(31)||chr(31)"
    ctes = [
        f"ws AS (SELECT w, count(*) AS freq FROM (SELECT unnest({_TOKS}) AS w"
        f" FROM documents) WHERE NOT contains(w, chr(31)) GROUP BY w)",
        f"w0 AS (SELECT w, substr(x, 1, length(x)-1) AS s, freq FROM ("
        f"SELECT w, {sep}||regexp_replace(w, '(?s)(.)', '\\1'||{dsep}, 'g') AS x,"
        f" freq FROM ws))",
    ]
    for r in range(1, n_merges + 1):
        ctes.append(
            f"p{r} AS (SELECT syms[i+1] AS a, syms[i+2] AS b, freq FROM ("
            f"SELECT string_split(regexp_replace(s, '^'||{sep}||'|'||{sep}||'$',"
            f" '', 'g'), {dsep}) AS syms, freq FROM w{r - 1}) t,"
            f" unnest(range(0, greatest(len(syms)-1, 0))) AS u(i))"
        )
        ctes.append(
            f"t{r} AS (SELECT a, b, cnt FROM (SELECT a, b, sum(freq) AS cnt"
            f" FROM p{r} GROUP BY a, b) ORDER BY cnt DESC, a, b LIMIT 1)"
        )
        ctes.append(
            # LEFT JOIN ON TRUE, not a cross join: if a round finds NO
            # adjacent pairs (merge exhaustion), t{r} is empty and a
            # cross join would annihilate the vocab — and with it every
            # later round and the tokenize readout — while bpe_learn
            # early-stops and keeps the vocab untouched. The NULL-pat
            # CASE reproduces that early-stop exactly.
            f"w{r} AS (SELECT w, CASE WHEN a IS NULL THEN s ELSE"
            f" replace(s, {sep}||a||{dsep}||b||{sep},"
            f" {sep}||a||b||{sep}) END AS s, freq"
            f" FROM w{r - 1} LEFT JOIN t{r} ON TRUE)"
        )
    if tokenize:
        finals = (
            f"SELECT w AS word, CAST(freq AS BIGINT) AS freq,"
            f" CAST(len(string_split(regexp_replace(s,"
            f" '^'||{sep}||'|'||{sep}||'$', '', 'g'), {dsep})) AS BIGINT)"
            f" AS n_subwords FROM w{n_merges}"
        )
    else:
        finals = " UNION ALL ".join(
            f"SELECT {r} AS merge_rank, a AS left_sym, b AS right_sym,"
            f" CAST(cnt AS BIGINT) AS pair_count FROM t{r}"
            for r in range(1, n_merges + 1)
        )
    return "WITH " + ",\n".join(ctes) + "\n" + finals
