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

from collections.abc import Iterator
from typing import Any

from pyspark.sql import DataFrame
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
        for pdf in pdfs:
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
