"""Tail sampling + trace grouping: whole-trace decisions after the fact.

Reference:
- processor/tailsamplingprocessor: buffer spans per trace until the
  decision wait elapses, then evaluate POLICIES over the complete trace
  and keep/drop the whole trace. Policy types (config.go): latency,
  status_code / attribute conditions, probabilistic, always_sample;
  multiple policies OR together (any "sample" vote keeps the trace).
- processor/groupbytraceprocessor: buffer and release all spans of a
  trace as one batch.

Batch restatement (trace ≅ conversation): the decision wait is the
batch boundary itself — every trace is already complete. Policies are
per-trace aggregates; the KEEP path evaluates them as WINDOW aggregates
over the trace key and filters in place:

    max/min(...) OVER (PARTITION BY trace_key) -> policy bools -> filter

ONE scan and ONE shuffle total (the round-2 plan audit showed the
groupBy+semi-join formulation scanning the input twice — at 100 TB that
doubles the job, so the window form is the execution path;
``decisions()`` keeps the per-trace aggregate frame for
inspection/telemetry). The probabilistic policy uses the same md5
bucket as :class:`ProbabilisticSampler` so it is DuckDB-lockstep
verifiable, and is a pure function of the key (no window needed).

``GroupByTrace`` is the groupbytrace analog: one output row per trace
with the trace's rows collected in order — the "release the batch
together" semantic, as a columnar array.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .sampler import _bucket


@dataclass
class TailPolicy:
    """One sampling policy (tailsamplingprocessor config.go policy types).

    type:
    - ``latency``: sample if trace duration >= threshold_ms
    - ``condition``: sample if ANY row satisfies the SQL predicate
      (covers status_code / numeric_attribute / string_attribute)
    - ``probabilistic``: consistent hash of the trace key vs percentage
    - ``always``: sample every trace
    """

    name: str
    type: str
    threshold_ms: int = 0
    condition: str | None = None
    percentage: float = 100.0

    def __post_init__(self):
        if self.type not in ("latency", "condition", "probabilistic", "always"):
            raise ValueError(f"unknown policy type {self.type!r}")
        if self.type == "condition" and not self.condition:
            raise ValueError("condition policy needs a SQL predicate")


@dataclass
class TailSampling:
    policies: list[TailPolicy]
    trace_key: str = "conv_id"
    ts_col: str = "ts"
    hash_seed: int = 22

    def decisions(self, df: DataFrame) -> DataFrame:
        """Per-trace policy votes: (trace_key, sampled, <policy bools>)."""
        key = self.trace_key
        aggs = []
        for p in self.policies:
            if p.type == "latency":
                dur_ms = (
                    F.max(F.unix_micros(F.col(self.ts_col).cast("timestamp")))
                    - F.min(F.unix_micros(F.col(self.ts_col).cast("timestamp")))
                ) / 1000.0
                vote = dur_ms >= p.threshold_ms
            elif p.type == "condition":
                vote = F.max(F.expr(p.condition).cast("int")) == 1
            elif p.type == "probabilistic":
                vote = _bucket(
                    F.first(F.col(key)).cast("string"), self.hash_seed, "md5"
                ) < int(p.percentage * 100)
            else:  # always
                vote = F.lit(True)
            aggs.append(vote.alias(f"policy_{p.name}"))
        dec = df.groupBy(key).agg(*aggs)
        sampled = None
        for p in self.policies:
            c = F.col(f"policy_{p.name}")
            sampled = c if sampled is None else (sampled | c)
        return dec.withColumn(
            "sampled", F.coalesce(sampled, F.lit(False))
        )

    def __call__(self, df: DataFrame) -> DataFrame:
        key = self.trace_key
        w = Window.partitionBy(key)
        micros = F.unix_micros(F.col(self.ts_col).cast("timestamp"))
        sampled: Column | None = None
        for p in self.policies:
            if p.type == "latency":
                vote = (F.max(micros).over(w) - F.min(micros).over(w)) / 1000.0 >= p.threshold_ms
            elif p.type == "condition":
                vote = F.max(F.expr(p.condition).cast("int")).over(w) == 1
            elif p.type == "probabilistic":
                vote = _bucket(
                    F.col(key).cast("string"), self.hash_seed, "md5"
                ) < int(p.percentage * 100)
            else:  # always
                vote = F.lit(True)
            sampled = vote if sampled is None else (sampled | vote)
        # window expressions cannot appear in a WHERE clause directly
        return (
            df.withColumn("__sampled__", F.coalesce(sampled, F.lit(False)))
            .filter(F.col("__sampled__"))
            .drop("__sampled__")
        )


@dataclass
class GroupByTrace:
    """groupbytrace: one row per trace carrying its ordered rows
    (processor/groupbytraceprocessor — buffer, then release together).

    ``max_trace_size`` bounds the per-trace aggregation buffer the way
    the reference bounds its in-memory buffering (groupbytraceprocessor
    ``num_traces`` ring + per-trace event buffers): a trace with more
    rows keeps only its first ``max_trace_size`` in ``order_by`` order
    and is flagged ``truncated``. ``span_count`` still reports the FULL
    size. Unbounded (None) keeps the "release everything together"
    semantic; the bound matters at 100 TB where one degenerate trace
    (a conv_id that never rotates) would otherwise concentrate into a
    single executor's aggregation buffer.

    Single scan either way: the cap ranks rows with a window over the
    same key the aggregation groups by, so the exchange is shared —
    collect_list skips nulls, so the conditional ``when(rn <= cap)``
    bounds the buffer without a second pass for the full count.
    """

    trace_key: str = "conv_id"
    order_by: str = "turn_idx"
    collect: list[str] = field(default_factory=lambda: ["turn_idx", "role", "text"])
    max_trace_size: int | None = None

    def __call__(self, df: DataFrame) -> DataFrame:
        entry = F.struct(
            F.col(self.order_by).alias("__o__"),
            *[F.col(c).alias(c) for c in self.collect if c != self.order_by],
        )
        if self.max_trace_size is None:
            return df.groupBy(self.trace_key).agg(
                F.count(F.lit(1)).alias("span_count"),
                F.sort_array(F.collect_list(entry)).alias("spans"),
            )
        if self.max_trace_size < 1:
            raise ValueError("max_trace_size must be >= 1")
        w = Window.partitionBy(self.trace_key).orderBy(
            self.order_by, *[c for c in self.collect if c != self.order_by]
        )
        ranked = df.withColumn("__rn__", F.row_number().over(w))
        return (
            ranked.groupBy(self.trace_key)
            .agg(
                F.count(F.lit(1)).alias("span_count"),
                F.sort_array(
                    F.collect_list(
                        F.when(F.col("__rn__") <= self.max_trace_size, entry)
                    )
                ).alias("spans"),
                (F.max("__rn__") > self.max_trace_size).alias("truncated"),
            )
        )
