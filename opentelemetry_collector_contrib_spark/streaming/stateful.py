"""Custom stateful streaming operators (applyInPandasWithState).

The batch metrics-state processors (processors/metrics_state.py) are
window functions — fine when the whole stream is a table. In streaming,
deltatocumulative's semantics are genuinely STATEFUL: a per-stream
running total that must survive micro-batch boundaries AND restarts,
with ``max_stale`` eviction when a stream goes quiet
(processor/deltatocumulativeprocessor/config.go:15-24: "streams older
than max_stale are dropped from tracking").

Spark mapping (SURVEY.md 7.3 custom-operator tier):
``groupBy(stream keys).applyInPandasWithState(...)`` — per-key state in
the state store (checkpointed, restored on restart = the collector's
storage-extension persistence), Arrow-batched pandas per group, and
``GroupStateTimeout.ProcessingTimeTimeout`` + ``state.remove()`` as the
max_stale eviction. No other Spark primitive holds keyed user state
across micro-batches; this is the documented applyInPandasWithState
case, not a UDF-for-convenience.
"""

from __future__ import annotations

import math
from collections.abc import Iterator
from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def stateful_delta_to_cumulative(
    stream: DataFrame,
    stream_keys: list[str] | None = None,
    value_col: str = "value",
    order_col: str = "ts",
    max_stale_ms: int | None = None,
) -> DataFrame:
    """Streaming deltatocumulative: per-key running sum across
    micro-batches and restarts.

    Within a micro-batch rows are ordered by ``order_col``; across
    batches, arrival order applies (same as the reference, which folds
    datapoints as they arrive). ``max_stale_ms`` drops a stream's state
    after that much processing-time silence.
    """
    import pandas as pd

    keys = stream_keys or ["metric"]
    # key columns keep their ACTUAL input types (a hardcoded string
    # schema broke int/long stream keys at the Arrow boundary)
    in_types = dict(stream.dtypes)
    out_schema = ", ".join(
        [f"{k} {in_types.get(k, 'string')}" for k in keys]
        + [f"{order_col} timestamp", f"{value_col} double", "cumulative double"]
    )
    state_schema = "total double"

    def fold(
        key: tuple, pdfs: Iterator["pd.DataFrame"], state: GroupState
    ) -> Iterator["pd.DataFrame"]:
        if state.hasTimedOut:
            # max_stale eviction: forget the stream entirely
            state.remove()
            return
        (total,) = state.get if state.exists else (0.0,)
        # concatenate Arrow chunks before sorting: a group larger than
        # one chunk must still fold in event-time order within the batch
        chunks = [c for c in pdfs if len(c)]
        if chunks:
            pdf = chunks[0] if len(chunks) == 1 else pd.concat(chunks)
            pdf = pdf.sort_values(order_col)
            csum = pdf[value_col].astype("float64").cumsum() + total
            if len(csum):
                total = float(csum.iloc[-1])
            out = pdf[[*keys, order_col, value_col]].copy()
            out["cumulative"] = csum
            yield out
        state.update((total,))
        if max_stale_ms is not None:
            state.setTimeoutDuration(max_stale_ms)

    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout
        if max_stale_ms is not None
        else GroupStateTimeout.NoTimeout
    )
    return stream.groupBy(*keys).applyInPandasWithState(
        fold, out_schema, state_schema, "append", timeout
    )


# -- streaming tail sampling ----------------------------------------------

def _leaf_plan(policies):
    """Walk the policy tree; assign an index to every leaf whose trace
    decision is 'any row matched' (the _ROW_TYPES plus probabilistic,
    whose per-row boolean is a pure function of the trace key). Returns
    the ordered leaf list; `and` nodes recurse."""
    from ..processors.tail_sampling import _ROW_TYPES

    leaves: list = []

    def walk(p):
        if p.type == "and":
            for sp in p.sub_policies:
                walk(sp)
        elif p.type in _ROW_TYPES or p.type == "probabilistic":
            leaves.append(p)

    for p in policies:
        walk(p)
    return leaves


def _py_code(p, n, dur_ms, any_of):
    """Python twin of TailSampling._code for the timeout-side decision
    (processor/tailsamplingprocessor internal/sampling/*.go); `any_of`
    maps id(policy) -> 'any buffered row matched'."""
    from ..processors.tail_sampling import (
        INVERT_NOT_SAMPLED,
        INVERT_SAMPLED,
        NOT_SAMPLED,
        SAMPLED,
    )

    if p.type == "latency":
        return SAMPLED if dur_ms >= p.threshold_ms else NOT_SAMPLED
    if p.type == "span_count":
        ok = (
            n >= p.min_spans
            if p.max_spans == 0
            else (p.min_spans <= n <= p.max_spans)
        )
        return SAMPLED if ok else NOT_SAMPLED
    if p.type == "always":
        return SAMPLED
    if p.type == "and":
        # first blocking sub-decision wins, else Sampled (and.go:26-40)
        for sp in p.sub_policies:
            c = _py_code(sp, n, dur_ms, any_of)
            if c in (NOT_SAMPLED, INVERT_NOT_SAMPLED):
                return c
        return SAMPLED
    m = bool(any_of.get(id(p), False))
    if p.type == "string_attribute" and p.invert_match:
        return INVERT_NOT_SAMPLED if m else INVERT_SAMPLED
    return SAMPLED if m else NOT_SAMPLED


def _py_combine(codes):
    """Python twin of TailSampling._combine (processor.go:287-326):
    InvertNotSampled vetoes; else any Sampled keeps; else InvertSampled
    keeps unless some policy said NotSampled."""
    from ..processors.tail_sampling import (
        INVERT_NOT_SAMPLED,
        INVERT_SAMPLED,
        NOT_SAMPLED,
        SAMPLED,
    )

    if not codes:
        return False
    if INVERT_NOT_SAMPLED in codes:
        return False
    if SAMPLED in codes:
        return True
    return INVERT_SAMPLED in codes and NOT_SAMPLED not in codes


def streaming_tail_sampling(
    stream: DataFrame,
    policies,
    trace_key: str = "conv_id",
    ts_col: str = "ts",
    watermark: str = "10 seconds",
    decision_wait_ms: int = 30_000,
    hash_seed: int = 22,
) -> DataFrame:
    """Streaming tail sampling with REAL ``decision_wait`` semantics.

    The reference buffers spans per trace until ``decision_wait``
    elapses, then evaluates the policy set over the complete trace
    (processor/tailsamplingprocessor/processor.go: policy ticker +
    per-trace `DecisionTime = ArrivalTime + DecisionWait`). The batch
    operator treats the batch boundary as the wait; this operator is the
    true streaming analog:

    * per-row policy signals are compiled ONCE as Columns by the batch
      builders (`_row_match`, the probabilistic hash bucket) — the
      stateful fold only aggregates booleans/counts, so predicate
      semantics cannot drift between batch and stream;
    * `groupBy(trace_key).applyInPandasWithState` holds per-trace
      aggregate state (span count, min/max event micros, per-leaf "any
      row matched") — NOT the spans themselves, so state is O(1) per
      trace regardless of trace size;
    * `GroupStateTimeout.EventTimeTimeout` fires when the watermark
      passes `first_span_time + decision_wait_ms` — the exact
      DecisionTime rule — and the timeout branch assembles the decision
      with a Python twin of `_code`/`_combine` (cited above; parity is
      pytest-asserted against the batch ``decisions()``).

    Emits one APPEND row per decided trace:
    ``(trace_key, span_count, dur_ms, sampled)``. Keep-path joins this
    frame back to the spans at the sink (the spans themselves live in
    the sink's short-term storage; buffering them in the state store
    would make state O(trace) — the reference's memory-bound buffer —
    for no decision-semantics gain).

    Rate-bearing policies (rate_limiting / composite) meter a
    wall-clock-second budget with a sequential counter; that is
    processing-time state with cross-key coupling, not per-trace event
    logic — use the batch path for those.
    """
    import pandas as pd

    from ..processors.tail_sampling import _RATE_TYPES, _row_match
    from ..processors.sampler import _bucket

    bad = [p.name for p in policies if p.type in _RATE_TYPES]
    if bad:
        raise ValueError(
            f"rate-bearing policies are batch-only (event-time budget): {bad}"
        )

    leaves = _leaf_plan(policies)
    sigs = []
    for i, p in enumerate(leaves):
        if p.type == "probabilistic":
            c = _bucket(F.col(trace_key).cast("string"), hash_seed, "md5") < int(
                p.percentage * 100
            )
        else:
            c = _row_match(p, stream)
        sigs.append(F.coalesce(c.cast("boolean"), F.lit(False)).alias(f"__m{i}__"))

    key_type = dict(stream.dtypes)[trace_key]
    pre = stream.select(
        F.col(trace_key),
        F.col(ts_col).cast("timestamp").alias("__ts__"),
        F.unix_micros(F.col(ts_col).cast("timestamp")).alias("__us__"),
        *sigs,
    ).withWatermark("__ts__", watermark)

    n_leaves = len(leaves)
    out_schema = (
        f"{trace_key} {key_type}, span_count long, dur_ms double, sampled boolean"
    )
    state_schema = "n long, mn long, mx long, anys array<boolean>, decided boolean"

    def fold(
        key: tuple, pdfs: Iterator["pd.DataFrame"], state: GroupState
    ) -> Iterator["pd.DataFrame"]:
        if state.hasTimedOut:
            n, mn, mx, anys, decided = state.get
            if decided:
                # retention elapsed: the tombstone can finally go
                state.remove()
                return
            dur_ms = (mx - mn) / 1000.0
            any_of = {id(p): anys[i] for i, p in enumerate(leaves)}
            codes = [_py_code(p, n, dur_ms, any_of) for p in policies]
            # keep a DECIDED tombstone instead of removing state: spans
            # of this trace arriving after the decision must NOT rebuild
            # state and emit a second, conflicting decision row — the
            # reference serves late spans from its cached decision
            # (processor.go decision cache). The tombstone itself ages
            # out one decision_wait after the decision.
            state.update((n, mn, mx, list(anys), True))
            state.setTimeoutTimestamp(
                state.getCurrentWatermarkMs() + decision_wait_ms
            )
            yield pd.DataFrame(
                {
                    trace_key: [key[0]],
                    "span_count": [n],
                    "dur_ms": [dur_ms],
                    "sampled": [_py_combine(codes)],
                }
            )
            return
        if state.exists:
            n, mn, mx, anys, decided = state.get
            anys = list(anys)
            if decided:
                # late spans of an already-decided trace: the decision
                # stands (reference decision-cache semantics); refresh
                # nothing, let the tombstone age out
                return
        else:
            n, mn, mx, anys = 0, None, None, [False] * n_leaves
        for pdf in pdfs:
            n += len(pdf)
            if len(pdf):
                lo, hi = int(pdf["__us__"].min()), int(pdf["__us__"].max())
                mn = lo if mn is None else min(mn, lo)
                mx = hi if mx is None else max(mx, hi)
                for i in range(n_leaves):
                    anys[i] = bool(anys[i] or pdf[f"__m{i}__"].any())
        if mn is None:
            # no rows materialized for this key (empty Arrow chunks):
            # leave any existing state and its timeout untouched
            return
        state.update((n, mn, mx, anys, False))
        # DecisionTime = first span's event time + decision_wait; the
        # state API refuses timestamps at/behind the watermark, so a
        # late-starting trace decides at the next watermark tick
        decide_at = mn // 1000 + decision_wait_ms
        state.setTimeoutTimestamp(
            max(decide_at, state.getCurrentWatermarkMs() + 1)
        )
        return
        yield  # pragma: no cover — keeps the function a generator

    return pre.groupBy(trace_key).applyInPandasWithState(
        fold, out_schema, state_schema, "append", GroupStateTimeout.EventTimeTimeout
    )


def stateful_cumulative_to_delta(
    stream: DataFrame,
    stream_keys: list[str] | None = None,
    value_col: str = "value",
    order_col: str = "ts",
    monotonic: bool = False,
    max_stale_ms: int | None = None,
) -> DataFrame:
    """Streaming cumulativetodelta: adjacent-point difference per
    stream across micro-batches and restarts — the reference's
    MetricTracker state (processor/cumulativetodeltaprocessor
    internal/tracking: per-stream reference value, persisted via the
    storage extension; here the checkpointed state store).

    Basic-mode semantics matching the oracle-gated batch
    ``CumulativeToDelta``: the FIRST point of a stream initializes the
    reference and is dropped; with ``monotonic=True`` a value BELOW the
    reference is a counter restart — dropped, becomes the new
    reference. ``max_stale_ms`` forgets silent streams (the tracker's
    max_staleness sweep).
    """
    import pandas as pd

    keys = stream_keys or ["metric"]
    in_types = dict(stream.dtypes)
    out_schema = ", ".join(
        [f"{k} {in_types.get(k, 'string')}" for k in keys]
        + [f"{order_col} timestamp", f"{value_col} double", "delta double"]
    )
    state_schema = "ref double"

    def fold(
        key: tuple, pdfs: Iterator["pd.DataFrame"], state: GroupState
    ) -> Iterator["pd.DataFrame"]:
        if state.hasTimedOut:
            state.remove()
            return
        ref = state.get[0] if state.exists else None
        # a large group spans several Arrow chunks: concatenate BEFORE
        # sorting, or the diff would chain in partition order across
        # chunk boundaries (the batch twin sorts the whole key)
        chunks = [c for c in pdfs if len(c)]
        if not chunks:
            return
        pdf = chunks[0] if len(chunks) == 1 else pd.concat(chunks)
        pdf = pdf.sort_values(order_col)
        vals = pdf[value_col].astype("float64")
        valid = vals.notna()
        # reference = last VALID point (batch semantics: a NaN value is
        # emitted as a NaN delta but never updates the reference); every
        # valid point becomes the next reference whether it is emitted
        # or restart-dropped, so the chain is shift + ffill over valids
        prevs = vals.where(valid).shift(1)
        if ref is not None and not math.isnan(ref):
            prevs.iloc[0] = ref
        prevs = prevs.ffill()
        delta = vals - prevs
        # NaN rows are kept (delta = NaN) like the batch op; valid rows
        # need a reference, and a monotonic drop below it is a restart
        keep = ~valid | prevs.notna()
        if monotonic:
            keep &= ~valid | delta.isna() | (delta >= 0)
        out = pdf.loc[keep, [*keys, order_col]].copy()
        out[value_col] = vals[keep]
        out["delta"] = delta[keep]
        if valid.any():
            ref = float(vals[valid].iloc[-1])
        if len(out):
            yield out
        if ref is not None:
            state.update((ref,))
        if max_stale_ms is not None:
            state.setTimeoutDuration(max_stale_ms)

    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout
        if max_stale_ms is not None
        else GroupStateTimeout.NoTimeout
    )
    return stream.groupBy(*keys).applyInPandasWithState(
        fold, out_schema, state_schema, "append", timeout
    )
