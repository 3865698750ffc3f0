"""Regression tests for the round-4 ADVICE findings.

1. spanmetrics: duplicate configured dimensions that sanitize to the
   same column name must be rejected (validateDimensions,
   connector/spanmetricsconnector/config.go:173-185 rejects duplicates
   among configured dimensions, not just collisions with reserved keys).
2. MetricsCollector.record_batch: a streaming query restarted on a
   fresh checkpoint resets batch ids to 0; the collector must fold the
   previous incarnation instead of letting colliding ids overwrite it.
"""

import pytest

from opentelemetry_collector_contrib_spark.connectors.spanmetrics import (
    SpanMetricsConnector,
)
from opentelemetry_collector_contrib_spark.metrics import MetricsCollector


def test_spanmetrics_duplicate_sanitized_dims_rejected():
    with pytest.raises(ValueError, match="duplicate dimension"):
        SpanMetricsConnector(
            duration_col="d", dimensions=["http.method", "http_method"]
        )


def test_spanmetrics_distinct_dims_accepted():
    c = SpanMetricsConnector(
        duration_col="d", dimensions=["http.method", "http.route"]
    )
    assert c.dimensions == ["http.method", "http.route"]


def _stage_total(c: MetricsCollector, stage: str, metric: str) -> float:
    total = sum(
        v for (st, m), v in c._batch_committed.items() if st == stage and m == metric
    )
    total += sum(
        ms[metric] for ms in c._batch_pending.get(stage, {}).values() if metric in ms
    )
    return total


def test_record_batch_checkpoint_reset_folds_previous_incarnation():
    c = MetricsCollector(run_id="t")
    for b in range(40):
        c.record_batch("s", b, {"rows": 1.0})
    assert _stage_total(c, "s", "rows") == 40.0
    # restart on a fresh checkpoint: ids reset to 0. Without the reset
    # fold, id 0 would overwrite the first incarnation's pending entry
    # and ids 24-39 would never fold.
    c.record_batch("s", 0, {"rows": 5.0})
    assert _stage_total(c, "s", "rows") == 45.0
    # and the new incarnation proceeds normally
    c.record_batch("s", 1, {"rows": 2.0})
    assert _stage_total(c, "s", "rows") == 47.0


def test_record_batch_replay_of_latest_still_overwrites():
    c = MetricsCollector(run_id="t")
    c.record_batch("s", 10, {"rows": 3.0})
    c.record_batch("s", 11, {"rows": 4.0})
    # the only legal same-incarnation re-delivery: the LATEST batch
    # replays after a crash before its commit — overwrites, no fold
    c.record_batch("s", 11, {"rows": 4.0})
    assert not c._batch_committed
    assert _stage_total(c, "s", "rows") == 7.0


def test_record_batch_short_first_incarnation_restart_folds():
    # a first incarnation SHORTER than the replay horizon must still be
    # detected as a restart when ids reset (code-review r05 finding)
    c = MetricsCollector(run_id="t")
    for b in range(5):
        c.record_batch("s", b, {"rows": 1.0})
    c.record_batch("s", 0, {"rows": 9.0})
    assert _stage_total(c, "s", "rows") == 14.0
