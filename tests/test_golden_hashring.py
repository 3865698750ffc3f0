"""Golden port of the loadbalancing exporter's consistent-hash ring
(exporter/loadbalancingexporter/consistent_hashing_test.go): exact ring
positions (weight 5) and endpointFor outcomes (default weight 100),
plus the columnar assignment agreeing with the driver-side twin."""

from __future__ import annotations

from opentelemetry_collector_contrib_spark.sinks.writers import HashRing


def test_positions_for_endpoints_exact():
    # consistent_hashing_test.go TestPositionsForEndpoints
    single = HashRing(["endpoint-1"], weight=5).items
    assert single == [
        (1401, "endpoint-1"), (4175, "endpoint-1"), (14133, "endpoint-1"),
        (17836, "endpoint-1"), (21667, "endpoint-1"),
    ]
    dup = HashRing(["endpoint-1", "endpoint-1"], weight=5).items
    assert dup == single  # duplicate endpoints add no positions
    multi = HashRing(["endpoint-1", "endpoint-2"], weight=5).items
    assert multi == [
        (1401, "endpoint-1"), (4175, "endpoint-1"), (10240, "endpoint-2"),
        (14133, "endpoint-1"), (15002, "endpoint-2"), (17836, "endpoint-1"),
        (21263, "endpoint-2"), (21667, "endpoint-1"), (26806, "endpoint-2"),
        (27020, "endpoint-2"),
    ]


def test_endpoint_for_exact():
    # consistent_hashing_test.go TestEndpointFor (default weight)
    ring = HashRing(["endpoint-1", "endpoint-2"])
    assert ring.endpoint_for(bytes([1, 2, 0, 0])) == "endpoint-1"
    assert ring.endpoint_for(bytes([128, 128, 0, 0])) == "endpoint-2"
    assert ring.endpoint_for(b"ad-service-7") == "endpoint-1"
    assert ring.endpoint_for(b"get-recommendations-1") == "endpoint-2"


def test_columnar_assignment_matches_driver_twin(spark):
    ring = HashRing(["endpoint-1", "endpoint-2", "endpoint-3"])
    ids = [f"trace-{i}" for i in range(200)]
    df = spark.createDataFrame([(i,) for i in ids], "tid string")
    got = {r["tid"]: r["endpoint"] for r in ring.assign(df, "tid").collect()}
    for tid in ids:
        assert got[tid] == ring.endpoint_for(tid.encode()), tid
    # hex ids route by their BYTES
    hexdf = spark.createDataFrame([("01020000",), ("80800000",)], "tid string")
    ring2 = HashRing(["endpoint-1", "endpoint-2"])
    got2 = {r["tid"]: r["endpoint"]
            for r in ring2.assign(hexdf, "tid", id_is_hex=True).collect()}
    assert got2 == {"01020000": "endpoint-1", "80800000": "endpoint-2"}
