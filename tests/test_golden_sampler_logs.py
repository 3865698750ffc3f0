"""Golden port of the probabilisticsampler logs-sampling table.

Fixture and expected received-counts transcribed from
processor/probabilisticsamplerprocessor/logsprocessor_test.go:62-208
(TestLogsSampling): 100 log records, trace id bytes
``[0]*8 ++ [i]*8`` (all-zero and therefore INVALID at i==0), a bytes
attribute ``foo`` (= the trace id bytes) and a string attribute ``bar``
(= the hex trace id text) on every even record, and a double attribute
``priority`` = 100 on every fourth. The FNV decisions are bit-exact
(fnvhasher.go), so the counts must match the reference EXACTLY.
"""

from __future__ import annotations

import pytest
from pyspark.sql import Row

from opentelemetry_collector_contrib_spark.processors.sampler import (
    ProbabilisticSampler,
)

ZERO16 = "00" * 16


@pytest.fixture(scope="module")
def logs100(spark):
    rows = []
    for i in range(100):
        tid = "00" * 8 + (f"{i:02x}") * 8
        # pcommon.TraceID.String() returns "" for the all-zero id, so
        # the i==0 record's bar attribute is an EMPTY string (missing
        # randomness) in the reference fixture
        rows.append(
            Row(
                idx=i,
                trace_id=tid,
                foo=tid if i % 2 == 0 else None,       # bytes attr (hex form)
                bar=("" if i == 0 else tid) if i % 2 == 0 else None,
                priority=100.0 if i % 4 == 0 else None,
            )
        )
    return spark.createDataFrame(
        rows, "idx int, trace_id string, foo string, bar string, priority double"
    ).cache()


def _count(df, **kw):
    defaults = dict(hash_function="fnv", hash_seed=0)
    defaults.update(kw)
    return ProbabilisticSampler(**defaults)(df).count()


class TestLogsSampling:
    """Each method = one row of the reference table (expected count in
    the name's comment)."""

    def test_happy_path(self, logs100):
        # SamplingPercentage 100 (fail open) -> 100
        assert _count(
            logs100, percentage=100.0, attribute_source="trace_id",
            key_is_hex=True, fail_closed=False,
        ) == 100

    def test_nothing(self, logs100):
        # SamplingPercentage 0, FailClosed -> 0
        assert _count(
            logs100, percentage=0.0, attribute_source="trace_id",
            key_is_hex=True, invalid_key_pattern="^0{32}$",
        ) == 0

    def test_roughly_half(self, logs100):
        # 50%, traceID source, hash_seed, FailClosed -> 45 (the empty
        # trace id at i==0 fails closed)
        assert _count(
            logs100, percentage=50.0, attribute_source="trace_id",
            key_is_hex=True, invalid_key_pattern="^0{32}$",
        ) == 45

    def test_sampling_source_no_sampling(self, logs100):
        # 0%, record attribute foo -> 0
        assert _count(
            logs100, percentage=0.0, attribute_source="foo", key_is_hex=True,
        ) == 0

    def test_sampling_source_all_sampling(self, logs100):
        # 100%, record attribute foo, fail open -> 100 (odd records
        # have no foo and fail OPEN)
        assert _count(
            logs100, percentage=100.0, attribute_source="foo",
            key_is_hex=True, fail_closed=False,
        ) == 100

    def test_sampling_source_sampling(self, logs100):
        # 50%, bytes attribute foo, FailClosed -> 23
        assert _count(
            logs100, percentage=50.0, attribute_source="foo", key_is_hex=True,
        ) == 23

    def test_sampling_source_sampling_as_string(self, logs100):
        # 50%, STRING attribute bar (utf-8 bytes of the hex text),
        # FailClosed -> 29
        assert _count(
            logs100, percentage=50.0, attribute_source="bar",
        ) == 29

    def test_sampling_priority(self, logs100):
        # 0% + priority attribute -> the 25 records carrying
        # priority=100 survive (including the invalid-trace-id record,
        # which fails open and is then raised by its priority)
        assert _count(
            logs100, percentage=0.0, attribute_source="trace_id",
            key_is_hex=True, fail_closed=False, sampling_priority="priority",
        ) == 25

    def test_sampling_priority_with_sampling_field(self, logs100):
        # 0%, source foo, priority -> still 25: odd records fail open
        # but the configured-priority override then never-samples them
        assert _count(
            logs100, percentage=0.0, attribute_source="foo",
            key_is_hex=True, fail_closed=False, sampling_priority="priority",
        ) == 25
