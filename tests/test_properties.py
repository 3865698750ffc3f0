"""Property-based tests (hypothesis) for the operators with real
algorithmic surface: the recombine size-cap fold, salted group
assignment, and sampler mode consistency. Each example drives Spark, so
example counts are kept small; deadlines off (JVM jitter)."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from opentelemetry_collector_contrib_spark.operators import Recombine
from opentelemetry_collector_contrib_spark.processors import ProbabilisticSampler

SET = settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


def _ref_size_cap(texts: list[str], cap: int) -> list[str]:
    """Pure-Python transcription of the reference's addToBatch rule
    (transformer.go:173-189): append with separator counted, flush when
    the combined length EXCEEDS the cap — overflowing entry included."""
    batches, cur, size = [], [], 0
    for t in texts:
        size += (1 if cur else 0) + len(t.encode())  # '\n' separator
        cur.append(t)
        if size > cap:
            batches.append(cur)
            cur, size = [], 0
    if cur:
        batches.append(cur)
    return ["\n".join(b) for b in batches]


@given(
    texts=st.lists(st.text(alphabet="abXY", min_size=0, max_size=6), min_size=1, max_size=12),
    cap=st.integers(min_value=1, max_value=14),
)
@SET
def test_recombine_size_cap_matches_reference_fold(spark, texts, cap):
    rows = [("c", i, t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(rows, "conv_id string, turn_idx int, text string")
    got = [
        r["text"]
        for r in Recombine(max_log_size=cap)(df).orderBy("turn_idx").collect()
    ]
    assert got == _ref_size_cap(texts, cap)


@given(
    starts=st.lists(st.booleans(), min_size=1, max_size=30),
    chunk=st.integers(min_value=1, max_value=7),
)
@SET
def test_recombine_salted_equals_unsalted(spark, starts, chunk):
    rows = [
        ("c", i, ("START " if s else "") + f"t{i}") for i, s in enumerate(starts)
    ]
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, text string"
    ).repartition(4)
    plain = Recombine(is_first_entry="text like 'START%'")(df)
    salted = Recombine(is_first_entry="text like 'START%'", salt_chunk=chunk)(df)
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


@given(pct=st.floats(min_value=1.0, max_value=99.0))
@SET
def test_sampler_modes_agree_at_unit_prior(spark, pct):
    """With prior = 1.0, hash_seed and proportional keep the SAME rows,
    and proportional's output probability equals pct/100."""
    df = (
        spark.range(300)
        .withColumn("key", F.col("id").cast("string"))
        .withColumn("prior", F.lit(1.0))
    )
    base = {
        r.id
        for r in ProbabilisticSampler(pct, attribute_source="key")(df).collect()
    }
    prop = ProbabilisticSampler(
        pct, attribute_source="key", mode="proportional", prior_col="prior"
    )(df).collect()
    assert {r.id for r in prop} == base
    assert all(abs(r.sampling_probability - pct / 100.0) < 1e-12 for r in prop)
