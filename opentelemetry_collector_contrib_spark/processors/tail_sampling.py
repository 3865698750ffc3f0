"""Tail sampling + trace grouping: whole-trace decisions after the fact.

Reference:
- processor/tailsamplingprocessor: buffer spans per trace until the
  decision wait elapses, then evaluate POLICIES over the complete trace
  and combine their decisions (processor.go:287-326):
  InvertNotSampled vetoes; else any Sampled keeps; else InvertSampled
  keeps unless some policy said NotSampled.
- policy evaluators (internal/sampling/*.go): always_sample, latency,
  probabilistic, span_count, status_code, string_attribute (exact or
  regex, invert), numeric_attribute (range, invert), boolean_attribute,
  trace_state, ottl_condition, and (all sub-policies), rate_limiting
  (spans/second budget), composite (ordered sub-policies with
  per-policy spans/second allocations).
- processor/groupbytraceprocessor: buffer and release all spans of a
  trace as one batch.

Batch restatement (trace ≅ conversation): the decision wait is the
batch boundary itself — every trace is already complete. Predicate
policies are per-trace aggregates; the KEEP path evaluates them as
WINDOW aggregates over the trace key and filters in place:

    max/min(...) OVER (PARTITION BY trace_key) -> decision codes -> filter

ONE scan and ONE shuffle total (the round-2 plan audit showed the
groupBy+semi-join formulation scanning the input twice — at 100 TB that
doubles the job, so the window form is the execution path;
``decisions()`` keeps the per-trace aggregate frame for
inspection/telemetry). The probabilistic policy uses the same md5
bucket as :class:`ProbabilisticSampler` so it is DuckDB-lockstep
verifiable, and is a pure function of the key (no window needed).

Rate-bearing policies (``rate_limiting``, ``composite``) are the one
exception: the reference meters a per-SECOND span budget with a
sequential counter (rate_limiting.go:29-44, composite.go:84-131), which
is state, not a predicate. The batch analog keys the budget to EVENT
time: traces are bucketed by the second of their first span and the
reference's greedy accounting runs inside each second-bucket via
``applyInPandas`` — sequential within a second exactly like the
reference's single counter, parallel ACROSS seconds, which is the right
100 TB decomposition (state never leaves a 1-second bucket). These
policies force the groupBy+join path: the per-trace decision frame is
aggregated first (tiny: one row per trace) and the keep-set joins back
on the trace key.

Decision codes: 0 NotSampled, 1 Sampled, 2 InvertSampled,
3 InvertNotSampled — the pdata enum, so golden tables from the
reference's policy tests transcribe directly.

``GroupByTrace`` is the groupbytrace analog: one output row per trace
with the trace's rows collected in order — the "release the batch
together" semantic, as a columnar array.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..envelope import try_element_at

from .sampler import _bucket

NOT_SAMPLED, SAMPLED, INVERT_SAMPLED, INVERT_NOT_SAMPLED = 0, 1, 2, 3


def _greedy_admit(spans, cap, strict: bool):
    """Sequential budget admission over one second-bucket, vectorized:
    admit trace j iff counted + spans[j] </<= cap, where ``counted``
    accumulates ADMITTED traces only (a rejected trace does not consume
    budget — rate_limiting.go:38, composite.go:112-127). Up to the
    FIRST rejection the counter equals the plain inclusive cumsum, so
    that prefix is one numpy comparison (the common case admits the
    whole bucket without any Python loop); only the post-rejection tail
    pays a scalar loop, over numpy values, never pandas rows."""
    import numpy as np

    cum = np.cumsum(spans)
    ok = (cum < cap) if strict else (cum <= cap)
    if ok.all():
        return ok
    p = int(np.argmax(~ok))
    adm = np.zeros(len(spans), dtype=bool)
    adm[:p] = True
    counted = int(cum[p - 1]) if p else 0
    for j in range(p, len(spans)):
        c = counted + int(spans[j])
        if (c < cap) if strict else (c <= cap):
            counted = c
            adm[j] = True
    return adm

_ROW_TYPES = {
    "condition",
    "string_attribute",
    "numeric_attribute",
    "boolean_attribute",
    "status_code",
    "trace_state",
    "ottl_condition",
}
_RATE_TYPES = {"rate_limiting", "composite"}
_TYPES = _ROW_TYPES | _RATE_TYPES | {
    "latency",
    "probabilistic",
    "always",
    "span_count",
    "and",
}
_STATUS_CODES = {"OK", "ERROR", "UNSET"}


@dataclass
class TailPolicy:
    """One sampling policy (tailsamplingprocessor config.go policy types).

    type:
    - ``latency``: sample if trace duration >= threshold_ms
    - ``condition``: sample if ANY row satisfies the SQL predicate
      (engine-level superset of the attribute filters)
    - ``probabilistic``: consistent hash of the trace key vs percentage
    - ``always``: sample every trace
    - ``span_count``: trace size in [min_spans, max_spans]
      (max_spans=0 = unbounded, span_count_sampler.go:31-43)
    - ``string_attribute``: ANY row's ``key`` attr in ``values`` (exact
      nonempty match, or unanchored regex when
      ``enabled_regex_matching``); ``invert_match`` flips to the
      Invert* decisions (string_tag_filter.go:37-121)
    - ``numeric_attribute``: ANY row's ``key`` attr in
      [min_value, max_value]; invert_match matches rows missing the key
      or out of range (numeric_tag_filter.go:30-45 — plain decisions)
    - ``boolean_attribute``: ANY row's ``key`` attr == bool_value
    - ``status_code``: ANY row's status in status_codes (OK/ERROR/UNSET)
    - ``trace_state``: ANY row whose W3C tracestate has key=value with
      value in ``values`` (trace_state_filter.go:27-55)
    - ``ottl_condition``: ANY row satisfies ANY OTTL condition string
    - ``and``: all sub_policies sample; first NotSampled /
      InvertNotSampled sub-decision is returned (and.go:26-40)
    - ``rate_limiting``: event-time greedy budget — sample while the
      second-bucket's sampled span count + this trace's spans is
      STRICTLY below spans_per_second (rate_limiting.go:29-44)
    - ``composite``: ordered sub_policies; the first whose decision is
      Sampled/InvertSampled claims the trace, kept only if its
      per-policy budget (sub's spans_per_second) and
      max_total_spans_per_second allow (composite.go:84-131; <=, and
      a rejected trace does not consume budget)
    """

    name: str
    type: str
    threshold_ms: int = 0
    condition: str | None = None
    percentage: float = 100.0
    # span_count
    min_spans: int = 0
    max_spans: int = 0
    # attribute / trace_state filters
    key: str | None = None
    values: list[str] = field(default_factory=list)
    enabled_regex_matching: bool = False
    invert_match: bool = False
    min_value: int = 0
    max_value: int = 0
    bool_value: bool = True
    status_codes: list[str] = field(default_factory=list)
    # ottl_condition
    ottl_conditions: list[str] = field(default_factory=list)
    # and / composite
    sub_policies: list["TailPolicy"] = field(default_factory=list)
    # rate_limiting budget; on a composite SUB-policy this is its
    # allocated spans/second (SubPolicyEvalParams.MaxSpansPerSecond)
    spans_per_second: int = 0
    max_total_spans_per_second: int = 0

    def __post_init__(self):
        if self.type not in _TYPES:
            raise ValueError(f"unknown policy type {self.type!r}")
        if self.type == "condition" and not self.condition:
            raise ValueError("condition policy needs a SQL predicate")
        if self.type == "ottl_condition" and not self.ottl_conditions:
            raise ValueError("ottl_condition policy needs conditions")
        if self.type in ("string_attribute", "numeric_attribute",
                         "boolean_attribute", "trace_state") and not self.key:
            raise ValueError(f"{self.type} policy needs a key")
        if self.type == "status_code":
            bad = set(self.status_codes) - _STATUS_CODES
            if bad or not self.status_codes:
                raise ValueError(
                    f"status_code policy needs codes from {_STATUS_CODES}, got {bad}"
                )
        if self.type in ("and", "composite"):
            if not self.sub_policies:
                raise ValueError(f"{self.type} policy needs sub_policies")
            for sp in self.sub_policies:
                if sp.type in _RATE_TYPES or sp.type == "and" and any(
                    s.type in _RATE_TYPES for s in sp.sub_policies
                ):
                    raise ValueError("rate-bearing sub-policies are not nestable")


def _attr(df: DataFrame, key: str) -> Column:
    """Attribute accessor: top-level column if present, else the
    ``attributes`` map (span attrs and resource attrs are both just
    columns in the flattened model)."""
    if key in df.columns:
        return F.col(key)
    if "attributes" in df.columns:
        return try_element_at(F.col("attributes"), key)
    return F.lit(None).cast("string")


def _row_match(p: TailPolicy, df: DataFrame) -> Column:
    """Per-row boolean for the row-predicate policy types."""
    if p.type == "condition":
        return F.expr(p.condition)
    if p.type == "ottl_condition":
        from ..functions import compile_condition

        m = None
        for cond in p.ottl_conditions:
            c = compile_condition(cond, df)
            m = c if m is None else (m | c)
        return m
    if p.type == "string_attribute":
        v = _attr(df, p.key)
        if p.enabled_regex_matching:
            m = None
            for pat in p.values:
                c = v.rlike(pat)  # Go regexp.MatchString is unanchored too
                m = c if m is None else (m | c)
            return m if m is not None else F.lit(False)
        vals = [x for x in p.values if x != ""]  # reference drops empties
        return v.isin(vals) if vals else F.lit(False)
    if p.type == "numeric_attribute":
        v = _attr(df, p.key).cast("long")
        in_range = v.isNotNull() & (v >= p.min_value) & (v <= p.max_value)
        if p.invert_match:
            # reference: a row missing the key or out of range SATISFIES
            # the inverted filter (plain Sampled, not Invert* decisions)
            return ~F.coalesce(in_range, F.lit(False))
        return in_range
    if p.type == "boolean_attribute":
        return _attr(df, p.key).cast("boolean") == F.lit(p.bool_value)
    if p.type == "status_code":
        return _attr(df, p.key or "status_code").isin(p.status_codes)
    if p.type == "trace_state":
        # W3C tracestate "k1=v1,k2=v2"; 256-char k=v cap per the reference
        vals = [
            v for v in p.values if v != "" and len(p.key) + len(v) < 256
        ]
        if not vals:
            return F.lit(False)
        state = F.str_to_map(
            F.coalesce(_attr(df, "trace_state"), F.lit("")), F.lit(","), F.lit("=")
        )
        return try_element_at(state, p.key).isin(vals)
    raise ValueError(f"not a row-predicate policy: {p.type}")


@dataclass
class TailSampling:
    policies: list[TailPolicy]
    trace_key: str = "conv_id"
    ts_col: str = "ts"
    hash_seed: int = 22

    # -- per-policy decision codes -------------------------------------
    def _code(self, p: TailPolicy, df: DataFrame, any_, cnt, dur_ms, key_expr) -> Column:
        """Decision code for one policy; `any_` wraps a row boolean into
        a trace-level 'any row matches' (groupBy aggregate or window
        aggregate, so the same builder serves both execution paths)."""
        if p.type == "latency":
            return F.when(dur_ms >= p.threshold_ms, SAMPLED).otherwise(NOT_SAMPLED)
        if p.type == "span_count":
            ok = (
                (cnt >= p.min_spans)
                if p.max_spans == 0
                else ((cnt >= p.min_spans) & (cnt <= p.max_spans))
            )
            return F.when(ok, SAMPLED).otherwise(NOT_SAMPLED)
        if p.type == "probabilistic":
            keep = _bucket(key_expr.cast("string"), self.hash_seed, "md5") < int(
                p.percentage * 100
            )
            return F.when(keep, SAMPLED).otherwise(NOT_SAMPLED)
        if p.type == "always":
            return F.lit(SAMPLED)
        if p.type == "and":
            # first blocking sub-decision (NotSampled/InvertNotSampled)
            # wins, else Sampled — and.go:26-40
            subs = [
                self._code(sp, df, any_, cnt, dur_ms, key_expr)
                for sp in p.sub_policies
            ]
            chain = None
            for c in subs:
                blocked = c.isin(NOT_SAMPLED, INVERT_NOT_SAMPLED)
                chain = (
                    F.when(blocked, c) if chain is None else chain.when(blocked, c)
                )
            return chain.otherwise(SAMPLED) if chain is not None else F.lit(SAMPLED)
        if p.type in _RATE_TYPES:
            raise ValueError(
                f"{p.type} is rate-bearing; evaluated via decisions()"
            )
        m = any_(_row_match(p, df))
        if p.type == "string_attribute" and p.invert_match:
            return F.when(m, INVERT_NOT_SAMPLED).otherwise(INVERT_SAMPLED)
        return F.when(m, SAMPLED).otherwise(NOT_SAMPLED)

    @staticmethod
    def _combine(codes: list[Column]) -> Column:
        """processor.go:287-326 precedence over the policy decisions."""
        if not codes:
            return F.lit(False)
        def _any(val):
            e = None
            for c in codes:
                t = c == val
                e = t if e is None else (e | t)
            return e
        return (
            ~_any(INVERT_NOT_SAMPLED)
            & (
                _any(SAMPLED)
                | (_any(INVERT_SAMPLED) & ~_any(NOT_SAMPLED))
            )
        )

    def _split(self):
        regular = [p for p in self.policies if p.type not in _RATE_TYPES]
        rate = [p for p in self.policies if p.type in _RATE_TYPES]
        return regular, rate

    # -- trace-level decision frame ------------------------------------
    def decisions(self, df: DataFrame) -> DataFrame:
        """Per-trace policy decision codes:
        (trace_key, span_count, policy_<name> int codes, sampled)."""
        key = self.trace_key
        regular, rate = self._split()
        micros = F.unix_micros(F.col(self.ts_col).cast("timestamp"))
        dur_ms = (F.max(micros) - F.min(micros)) / 1000.0
        cnt = F.count(F.lit(1))
        key_expr = F.first(F.col(key))
        any_ = lambda c: F.coalesce(F.max(c.cast("int")) == 1, F.lit(False))

        aggs = [
            cnt.alias("span_count"),
            F.min(micros).alias("__micros__"),
        ]
        for p in regular:
            aggs.append(
                self._code(p, df, any_, cnt, dur_ms, key_expr).alias(
                    f"policy_{p.name}"
                )
            )
        # composite sub-policy codes are per-trace aggregates too
        for p in rate:
            if p.type == "composite":
                for i, sp in enumerate(p.sub_policies):
                    aggs.append(
                        self._code(sp, df, any_, cnt, dur_ms, key_expr).alias(
                            f"__{p.name}_sub{i}__"
                        )
                    )
        dec = df.groupBy(key).agg(*aggs)
        dec = dec.withColumn(
            "__second__", F.floor(F.col("__micros__") / 1_000_000)
        )
        for p in rate:
            dec = self._apply_rate(dec, p)
        codes = [F.col(f"policy_{p.name}") for p in self.policies]
        dec = dec.withColumn(
            "sampled", F.coalesce(self._combine(codes), F.lit(False))
        )
        drop = ["__micros__", "__second__"] + [
            c for c in dec.columns if c.startswith("__") and c.endswith("__")
        ]
        return dec.drop(*drop)

    def _apply_rate(self, dec: DataFrame, p: TailPolicy) -> DataFrame:
        """Greedy per-second budget accounting (reference counters are
        per wall-clock second; the batch analog uses the trace's event
        second). Sequential WITHIN a second-bucket — identical to the
        reference's single counter — parallel across seconds."""
        import pandas as pd

        key = self.trace_key
        sub_cols = (
            [f"__{p.name}_sub{i}__" for i in range(len(p.sub_policies))]
            if p.type == "composite"
            else []
        )
        cols = [key, "__second__", "span_count"] + sub_cols
        name, ptype = p.name, p.type
        sps = p.spans_per_second
        max_total = p.max_total_spans_per_second
        allocated = [sp.spans_per_second for sp in p.sub_policies]

        def greedy(pdf: "pd.DataFrame") -> "pd.DataFrame":
            import numpy as np

            pdf = pdf.sort_values([key], kind="mergesort")
            spans = pdf["span_count"].to_numpy(dtype="int64")
            if ptype == "rate_limiting":
                # strict <, rate_limiting.go:38
                adm = _greedy_admit(spans, sps, strict=True)
                out_codes = np.where(adm, SAMPLED, NOT_SAMPLED)
            else:  # composite
                out_codes = np.full(len(spans), NOT_SAMPLED, dtype="int64")
                codes_mat = pdf[sub_cols].to_numpy(dtype="int64")
                eligible = (codes_mat == SAMPLED) | (codes_mat == INVERT_SAMPLED)
                # each trace tries ONLY its first eligible sub-policy —
                # no fallthrough on budget rejection (composite.go:
                # 112-127), so rows partition by winner column and the
                # sub-policy budgets decouple: one masked greedy per
                # column, <= n_sub_policies passes
                winner = np.where(
                    eligible.any(axis=1), eligible.argmax(axis=1), -1
                )
                for i in range(len(allocated)):
                    mask = winner == i
                    if not mask.any():
                        continue
                    # <= both caps == one min() cap; a rejected trace
                    # does NOT consume budget (composite.go:112-127)
                    adm = _greedy_admit(
                        spans[mask], min(allocated[i], max_total), strict=False
                    )
                    out_codes[mask] = np.where(adm, SAMPLED, NOT_SAMPLED)
            return pd.DataFrame({key: pdf[key], f"policy_{name}": out_codes})

        key_type = dict(dec.dtypes)[key]
        codes = (
            dec.select(*cols)
            .groupBy("__second__")
            .applyInPandas(greedy, schema=f"{key} {key_type}, policy_{name} int")
        )
        return dec.join(codes, on=key, how="left").fillna(
            {f"policy_{name}": NOT_SAMPLED}
        )

    # -- keep path ------------------------------------------------------
    def __call__(self, df: DataFrame) -> DataFrame:
        key = self.trace_key
        regular, rate = self._split()
        if rate:
            # budget accounting is inherently trace-level state: build
            # the (tiny) per-trace decision frame and keep via semi-join
            keep = self.decisions(df).filter(F.col("sampled")).select(key)
            return df.join(keep, on=key, how="left_semi")
        w = Window.partitionBy(key)
        micros = F.unix_micros(F.col(self.ts_col).cast("timestamp"))
        dur_ms = (F.max(micros).over(w) - F.min(micros).over(w)) / 1000.0
        cnt = F.count(F.lit(1)).over(w)
        any_ = lambda c: F.coalesce(
            F.max(c.cast("int")).over(w) == 1, F.lit(False)
        )
        codes = [
            self._code(p, df, any_, cnt, dur_ms, F.col(key)) for p in regular
        ]
        # window expressions cannot appear in a WHERE clause directly
        return (
            df.withColumn("__sampled__", F.coalesce(self._combine(codes), F.lit(False)))
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
        # default struct ordering cannot compare map-typed collected
        # columns (attributes) — fall back to an explicit comparator on
        # the order field then (same fix as spanevents.regroup_events);
        # orderable structs keep the full-struct sort (deterministic
        # tiebreak across every collected field)
        dtypes = dict(df.dtypes)
        has_map = any(
            dtypes.get(c, "").startswith("map<") for c in self.collect
        )

        def _by_order(left, right):
            lo, ro = left.getField("__o__"), right.getField("__o__")
            return (
                F.when(lo < ro, -1).when(lo > ro, 1).otherwise(0).cast("int")
            )

        def _sorted(col):
            return F.array_sort(col, _by_order) if has_map else F.sort_array(col)

        if self.max_trace_size is None:
            return df.groupBy(self.trace_key).agg(
                F.count(F.lit(1)).alias("span_count"),
                _sorted(F.collect_list(entry)).alias("spans"),
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
                _sorted(
                    F.collect_list(
                        F.when(F.col("__rn__") <= self.max_trace_size, entry)
                    )
                ).alias("spans"),
                (F.max("__rn__") > self.max_trace_size).alias("truncated"),
            )
        )
