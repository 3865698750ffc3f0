"""Verbatim port of the geoip processor's TestProcessPdata table.

Reference: processor/geoipprocessor/geoip_processor_test.go:87-230 —
resource-attribute IP resolution (ordered probe, skip invalid /
unspecified, first valid wins) followed by provider lookup; records
whose IP resolves nowhere pass through untouched. The mock provider
("1.2.3.4 -> geo.city_name=barcelona") becomes a one-row CIDR dim
(1.2.3.4/32) resolved by the broadcast range join.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from opentelemetry_collector_contrib_spark.processors import GeoIpEnrich

SCHEMA = "rid int, attributes map<string,string>"


@pytest.fixture(scope="module")
def geo_dim(spark):
    return spark.createDataFrame(
        [("1.2.3.4/32", "barcelona")], "cidr string, city_name string"
    )


def _run(spark, geo_dim, attrs, attributes=None):
    df = spark.createDataFrame([(0, attrs)], SCHEMA)
    kwargs = {} if attributes is None else {"attributes": attributes}
    out = GeoIpEnrich(dim=geo_dim, **kwargs)(df).collect()[0]
    return out


def test_default_source_ip_attribute_not_found(spark, geo_dim):
    # 'ip' is not the default source.address key -> nothing resolves,
    # resource unchanged
    out = _run(spark, geo_dim, {"ip": "1.2.3.4"})
    assert out.geo_city_name is None
    assert dict(out.attributes) == {"ip": "1.2.3.4"}


def test_default_source_ip_attribute(spark, geo_dim):
    out = _run(
        spark, geo_dim, {"ip": "1.2.3.4", "source.address": "1.2.3.4"}
    )
    assert out.geo_city_name == "barcelona"


def test_unspecified_ip_skipped(spark, geo_dim):
    # parseIP rejects 0.0.0.0 (geoip_processor.go:44-46)
    out = _run(spark, geo_dim, {"source.address": "0.0.0.0"})
    assert out.geo_city_name is None


def test_custom_resource_attribute(spark, geo_dim):
    out = _run(spark, geo_dim, {"ip": "1.2.3.4"}, attributes=["ip"])
    assert out.geo_city_name == "barcelona"


def test_custom_resource_attributes_match_second(spark, geo_dim):
    # probe order ['ip', 'host.ip']; only host.ip present -> it wins
    out = _run(
        spark, geo_dim, {"host.ip": "1.2.3.4"}, attributes=["ip", "host.ip"]
    )
    assert out.geo_city_name == "barcelona"


def test_invalid_ip_no_attributes(spark, geo_dim):
    # '%' fails parseIP -> skipped, errIPNotFound -> untouched
    out = _run(spark, geo_dim, {"source.address": "%"})
    assert out.geo_city_name is None


def test_invalid_first_valid_second(spark, geo_dim):
    # ipFromResourceAttributes CONTINUES past a present-but-invalid
    # value (the attribute might contain a domain name,
    # geoip_processor.go:55-58)
    out = _run(
        spark, geo_dim,
        {"ip": "evil.example.com", "host.ip": "1.2.3.4"},
        attributes=["ip", "host.ip"],
    )
    assert out.geo_city_name == "barcelona"


def test_ip_outside_all_ranges(spark, geo_dim):
    # provider returns no data for this IP -> no geo attrs
    out = _run(spark, geo_dim, {"source.address": "9.9.9.9"})
    assert out.geo_city_name is None


def test_all_signals_batch(spark, geo_dim):
    # processMetrics/processTraces/processLogs all walk resources the
    # same way; columnar twin: one frame of mixed resources
    rows = [
        (0, {"source.address": "1.2.3.4"}),
        (1, {"source.address": "0.0.0.0"}),
        (2, {"other": "x"}),
    ]
    df = spark.createDataFrame(rows, SCHEMA)
    got = {r.rid: r.geo_city_name for r in GeoIpEnrich(dim=geo_dim)(df).collect()}
    assert got == {0: "barcelona", 1: None, 2: None}
