"""Golden port of resourcedetectionprocessor internal TestDetect
(internal/resourcedetection_test.go:39-113): detectors merge in order
with FIRST-detector-wins per key; ``attributes`` allowlists keys.
Values are strings in the columnar restatement (typed values stringify,
documented in processors/resourcedetection.py)."""

from __future__ import annotations

import pytest

from opentelemetry_collector_contrib_spark.processors.resourcedetection import (
    ResourceDetection,
)


@pytest.fixture()
def base(spark):
    return spark.createDataFrame([(1,)], "id int")


def _run(df, detector_dicts, attributes=None):
    proc = ResourceDetection(
        detectors=[(lambda d=d: d) for d in detector_dicts],
        attributes=attributes,
    )
    return proc(df).first()["resource"]


def test_detect_three_resources(base):
    got = _run(base, [{"a": "1", "b": "2"}, {"a": "11", "c": "3"}, {"a": "12", "c": "3"}])
    assert got == {"a": "1", "b": "2", "c": "3"}


def test_detect_empty_resources(base):
    got = _run(base, [{"a": "1", "b": "2"}, {}, {"a": "11"}])
    assert got == {"a": "1", "b": "2"}


def test_detect_stringified_typed_resources(base):
    got = _run(base, [{"bool": "true", "int": "2", "double": "0.5"},
                      {"bool": "false"}, {"a": "11"}])
    assert got == {"a": "11", "bool": "true", "int": "2", "double": "0.5"}


def test_filter_to_one_attribute(base):
    got = _run(
        base,
        [{"a": "1", "b": "2"}, {"a": "11", "c": "3"}, {"a": "12", "c": "3"}],
        attributes=["a"],
    )
    assert got == {"a": "1"}


def test_invalid_detector_type_raises(base):
    with pytest.raises(ValueError):
        ResourceDetection(detectors=["not_a_detector"])(base)
