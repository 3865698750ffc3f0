"""Processor tests (attributes/attraction actions, filter, enrich,
groupbyattrs, redaction, sampler, transform)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from opentelemetry_collector_contrib_spark.processors import (
    Action,
    AttributesProcessor,
    FilterProcessor,
    GroupByAttrs,
    LookupEnrich,
    ProbabilisticSampler,
    Redaction,
    TransformProcessor,
)


@pytest.fixture(scope="module")
def df(spark):
    return spark.createDataFrame(
        [
            (1, "ERROR", "bash", {"region": "us", "secret": "tok-123"}),
            (2, "INFO", "search", {"region": "eu"}),
            (3, "ERROR", "none", {}),
        ],
        "id int, level string, tool string, attributes map<string,string>",
    )


def test_attraction_insert_update_upsert(df):
    p = AttributesProcessor([
        Action("insert", key="attributes.region", value="default"),  # only if absent
        Action("update", key="attributes.secret", value="***"),       # only if present
        Action("upsert", key="attributes.stage", value="prod"),
    ])
    out = {r["id"]: r["attributes"] for r in p(df).collect()}
    assert out[1]["region"] == "us" and out[3]["region"] == "default"
    assert out[1]["secret"] == "***" and "secret" not in out[2]
    assert all(a["stage"] == "prod" for a in out.values())


def test_attraction_delete_hash_convert(df):
    p = AttributesProcessor([
        Action("hash", key="attributes.secret"),
        Action("delete", key="attributes.region"),
        Action("upsert", key="attributes.id_str", from_attribute="id"),
    ])
    out = {r["id"]: r["attributes"] for r in p(df).collect()}
    assert len(out[1]["secret"]) == 64  # sha2-256 hex (attraction hasher.go)
    assert "region" not in out[1] and "region" not in out[2]
    assert out[2]["id_str"] == "2"


def test_attraction_extract(df):
    p = AttributesProcessor([
        Action("extract", key="attributes.secret", pattern=r"tok-(?P<toknum>\d+)"),
    ])
    rows = {r["id"]: r for r in p(df).collect()}
    assert rows[1]["toknum"] == "123"
    assert rows[2]["toknum"] is None


def test_attraction_include_exclude(df):
    p = AttributesProcessor(
        [Action("upsert", key="attributes.flag", value="y")],
        include="level = 'ERROR'",
        exclude="tool = 'none'",
    )
    out = {r["id"]: r["attributes"].get("flag") for r in p(df).collect()}
    assert out == {1: "y", 2: None, 3: None}


def test_filter_processor_or_conditions(df):
    fp = FilterProcessor(["level = 'ERROR'", "tool = 'search'"])
    assert fp(df).count() == 0
    fp = FilterProcessor(["tool = 'search'"])
    assert {r["id"] for r in fp(df).collect()} == {1, 3}


def test_filter_processor_ottl_conditions(spark):
    # filterprocessor configs carry OTTL conditions verbatim
    df = spark.createDataFrame(
        [("drop me", {"env": "dev"}), ("keep", {"env": "prod"}), ("keep2", None)],
        "body string, attributes map<string,string>",
    )
    fp = FilterProcessor(
        conditions=[
            'attributes["env"] == "dev"',
            'IsMatch(body, "^never")',
        ],
        language="ottl",
    )
    kept = {r.body for r in fp(df).collect()}
    assert kept == {"keep", "keep2"}
    with pytest.raises(ValueError):
        FilterProcessor(conditions=[], language="xpath")


def test_filter_observe_counts(df):
    fp = FilterProcessor(["level = 'ERROR'"], observe_name="flt")
    out = fp(df)
    assert out.count() == 1
    assert fp.observation.get == {"filtered": 2, "seen": 3}


def test_lookup_enrich(spark, df):
    dim = spark.createDataFrame(
        [("bash", "exec"), ("search", "retrieval")], "tool string, category string"
    )
    out = LookupEnrich(dim, keys=["tool"])(df)
    rows = {r["id"]: r["category"] for r in out.collect()}
    assert rows == {1: "exec", 2: "retrieval", 3: None}
    # broadcast hint must appear in the physical plan
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_groupbyattrs_promotes_and_hashes(df):
    out = GroupByAttrs(keys=["region"])(df)
    rows = {r["id"]: r for r in out.collect()}
    assert rows[1]["region"] == "us" and rows[3]["region"] is None
    assert rows[1]["resource_hash"] is not None


def test_redaction(df):
    r = Redaction(
        allowed_keys=["region", "secret"],
        blocked_value_patterns=[r"tok-\d+"],
        summary="debug",
    )
    out = {row["id"]: row for row in r(df).collect()}
    assert out[1]["attributes"]["secret"] == "****"
    assert out[1]["attributes"]["redaction.masked.count"] == "1"
    assert out[1]["attributes"]["redaction.masked.keys"] == "secret"
    assert out[2]["attributes"] == {"region": "eu"}


def test_sampler_deterministic_and_proportional(spark):
    df = spark.range(10000).withColumn("key", F.col("id").cast("string"))
    s = ProbabilisticSampler(25.0, attribute_source="key")
    a = s(df).count()
    b = s(df).count()
    assert a == b  # deterministic
    assert 2200 <= a <= 2800  # ~25%
    assert ProbabilisticSampler(100.0, attribute_source="key")(df).count() == 10000
    with pytest.raises(ValueError):
        ProbabilisticSampler(150.0)
    with pytest.raises(ValueError):
        ProbabilisticSampler(10.0, mode="bogus")


def test_sampler_modes(spark):
    df = (
        spark.range(10000)
        .withColumn("key", F.col("id").cast("string"))
        .withColumn("prior", F.when(F.col("id") % 2 == 0, 0.2).otherwise(1.0))
    )
    # proportional: same keep rate as hash_seed, output prob = prior * pct
    prop = ProbabilisticSampler(
        25.0, attribute_source="key", mode="proportional", prior_col="prior"
    )(df)
    probs = {r.sampling_probability for r in prop.select("sampling_probability").distinct().collect()}
    assert probs == {0.2 * 0.25, 1.0 * 0.25}
    # equalizing: rows with prior (0.2) already below the target (0.5)
    # ALL survive untouched; prior-1.0 rows are cut to ~50%
    eq = ProbabilisticSampler(
        50.0, attribute_source="key", mode="equalizing", prior_col="prior"
    )(df)
    low = eq.filter(F.col("prior") == 0.2)
    assert low.count() == 5000  # every already-sampled row kept
    assert {r.sampling_probability for r in low.select("sampling_probability").distinct().collect()} == {0.2}
    hi_n = eq.filter(F.col("prior") == 1.0).count()
    assert 2200 <= hi_n <= 2800  # ~50% of 5000
    # xxhash64 fast path stays available and deterministic
    fast = ProbabilisticSampler(25.0, attribute_source="key", hash_function="xxhash64")
    assert fast(df).count() == fast(df).count()


def _py_fnv1a32(data: bytes, seed: int) -> int:
    """Independent FNV-1a reimplementation (the public algorithm Go's
    hash/fnv implements) for cross-checking the Column expression."""
    h = 2166136261
    for b in seed.to_bytes(4, "little") + data:
        h = ((h ^ b) * 16777619) & 0xFFFFFFFF
    return h


def test_sampler_fnv_exact_reference_hash(spark):
    from opentelemetry_collector_contrib_spark.processors.sampler import fnv1a32

    vals = [
        "", "test", "conv-123", "héllo wörld", "日本語テキスト",
        "a" * 300, "trace-00deadbeef",
    ]
    df = spark.createDataFrame([(v,) for v in vals], "s string")
    for seed in (0, 22, 0x3024001):
        got = {
            r["s"]: r["h"]
            for r in df.select("s", fnv1a32(F.col("s"), seed).alias("h")).collect()
        }
        for v in vals:
            assert got[v] == _py_fnv1a32(v.encode("utf-8"), seed), (v, seed)


def test_sampler_fnv_mode_decisions(spark):
    # decisions equal the collector's classic hash_seed acceptance rule:
    # fnv(seed ++ key) & 0x3FFF < pct * 16384/100
    df = spark.range(2000).withColumn("key", F.concat(F.lit("k-"), "id"))
    s = ProbabilisticSampler(25.0, attribute_source="key", hash_function="fnv")
    kept = {r["key"] for r in s(df).collect()}
    expected = {
        f"k-{i}"
        for i in range(2000)
        if (_py_fnv1a32(f"k-{i}".encode(), 22) & 0x3FFF) < int(25.0 * 163.84)
    }
    assert kept == expected


def test_tail_sampling_policies(spark):
    import datetime as dt

    from opentelemetry_collector_contrib_spark.processors import (
        TailPolicy,
        TailSampling,
    )

    t0 = dt.datetime(2024, 1, 1)
    rows = [
        # slow trace: 10s duration
        ("slow", 0, "none", t0), ("slow", 1, "none", t0 + dt.timedelta(seconds=10)),
        # fast trace with a bash turn
        ("bashy", 0, "bash", t0), ("bashy", 1, "none", t0 + dt.timedelta(seconds=1)),
        # fast, boring trace
        ("boring", 0, "none", t0), ("boring", 1, "none", t0 + dt.timedelta(seconds=1)),
    ]
    df = spark.createDataFrame(rows, "conv_id string, turn_idx int, tool string, ts timestamp")
    ts = TailSampling(policies=[
        TailPolicy("slow", "latency", threshold_ms=5000),
        TailPolicy("bash", "condition", condition="tool = 'bash'"),
    ])
    kept = {r.conv_id for r in ts(df).collect()}
    assert kept == {"slow", "bashy"}  # boring trace dropped whole
    # every row of a sampled trace survives (whole-trace decision)
    assert ts(df).filter("conv_id = 'slow'").count() == 2
    # always policy keeps everything; probabilistic is deterministic
    assert TailSampling(policies=[TailPolicy("all", "always")])(df).count() == 6
    prob = TailSampling(policies=[TailPolicy("p", "probabilistic", percentage=50.0)])
    assert prob(df).count() == prob(df).count()
    with pytest.raises(ValueError):
        TailPolicy("x", "bogus")
    with pytest.raises(ValueError):
        TailPolicy("x", "condition")


def test_groupbytrace_collects_in_order(spark):
    from opentelemetry_collector_contrib_spark.processors import GroupByTrace

    rows = [("c", 2, "u", "three"), ("c", 0, "u", "one"), ("c", 1, "a", "two"),
            ("d", 0, "u", "solo")]
    df = spark.createDataFrame(rows, "conv_id string, turn_idx int, role string, text string")
    out = {r.conv_id: r for r in GroupByTrace()(df).collect()}
    assert out["c"].span_count == 3
    assert [s.text for s in out["c"].spans] == ["one", "two", "three"]
    assert out["d"].span_count == 1


def test_groupbytrace_max_trace_size_bounds_buffer(spark):
    """An oversized trace keeps only its first max_trace_size rows (in
    order) and is flagged, while span_count still reports the full size
    — the num_traces/bounded-buffer posture of the reference
    groupbytraceprocessor."""
    import pytest

    from opentelemetry_collector_contrib_spark.processors import GroupByTrace

    rows = [("big", i, "u", f"t{i}") for i in range(50)] + [
        ("small", 0, "u", "solo")
    ]
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string"
    )
    out = {
        r.conv_id: r
        for r in GroupByTrace(max_trace_size=10)(df).collect()
    }
    assert out["big"].span_count == 50
    assert out["big"].truncated is True
    assert [s.text for s in out["big"].spans] == [f"t{i}" for i in range(10)]
    assert out["small"].span_count == 1
    assert out["small"].truncated is False
    assert [s.text for s in out["small"].spans] == ["solo"]
    with pytest.raises(ValueError):
        GroupByTrace(max_trace_size=0)(df)


def test_resourcedetection_env_and_override(spark, monkeypatch):
    from opentelemetry_collector_contrib_spark.processors import ResourceDetection

    monkeypatch.setenv("OTEL_RESOURCE_ATTRIBUTES", "service.name=svc,region=eu")
    df = spark.createDataFrame(
        [("x", {"region": "us", "keep": "1"})],
        "body string, resource map<string,string>",
    )
    # override=True (default): detected wins
    out = ResourceDetection(detectors=["env"])(df).collect()[0]
    assert dict(out["resource"]) == {"service.name": "svc", "region": "eu", "keep": "1"}
    # override=False: existing wins
    out = ResourceDetection(detectors=["env"], override=False)(df).collect()[0]
    assert dict(out["resource"])["region"] == "us"
    # allowlist filters detected keys
    out = ResourceDetection(detectors=["env"], attributes=["service.name"])(df).collect()[0]
    assert dict(out["resource"])["region"] == "us"
    assert dict(out["resource"])["service.name"] == "svc"
    # system detector stamps host.name / os.type; unknown detector raises
    out = ResourceDetection(detectors=["system"])(df).collect()[0]
    assert "host.name" in dict(out["resource"]) and "os.type" in dict(out["resource"])
    with pytest.raises(ValueError):
        ResourceDetection(detectors=["not_a_detector"])(df)
    # cloud detectors are valid names now (metadata-map-driven stamps);
    # with no captured metadata they stamp nothing
    out = ResourceDetection(detectors=["gcp"])(df).collect()[0]
    assert dict(out["resource"]) == {"region": "us", "keep": "1"}


def test_transform_processor_statement_order(spark):
    df = spark.createDataFrame([("x", {"a": "1"})], "body string, attributes map<string,string>")
    tp = TransformProcessor([
        'set(attributes["b"], attributes["a"])',
        'set(attributes["a"], "2")',
        'set(attributes["c"], attributes["a"])',  # sees the NEW value (order!)
    ])
    out = tp(df).collect()[0]["attributes"]
    assert out == {"a": "2", "b": "1", "c": "2"}


# --- metrics-state processors (SURVEY.md 2.5 metrics row) --------------------

def test_delta_to_cumulative(spark):
    from opentelemetry_collector_contrib_spark.processors import DeltaToCumulative

    df = spark.createDataFrame(
        [("m", 1, 5.0), ("m", 2, 3.0), ("m", 3, 2.0), ("n", 1, 10.0)],
        "metric string, seq int, value double",
    )
    out = DeltaToCumulative(stream_keys=["metric"], order_col="seq")(df)
    got = {(r.metric, r.seq): r.cumulative for r in out.collect()}
    assert got[("m", 1)] == 5.0 and got[("m", 2)] == 8.0 and got[("m", 3)] == 10.0
    assert got[("n", 1)] == 10.0


def test_cumulative_to_delta_drops_first_point(spark):
    from opentelemetry_collector_contrib_spark.processors import CumulativeToDelta

    df = spark.createDataFrame(
        [("m", 1, 5.0), ("m", 2, 8.0), ("m", 3, 10.0)],
        "metric string, seq int, value double",
    )
    out = CumulativeToDelta(stream_keys=["metric"], order_col="seq")(df).collect()
    assert {(r.seq, r.delta) for r in out} == {(2, 3.0), (3, 2.0)}


def test_delta_to_rate_subsecond(spark):
    from opentelemetry_collector_contrib_spark.processors import DeltaToRate
    import datetime as dt

    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)
    df = spark.createDataFrame(
        [("m", t0, 4.0), ("m", t0 + dt.timedelta(milliseconds=500), 2.0)],
        "metric string, ts timestamp, value double",
    )
    out = DeltaToRate(stream_keys=["metric"])(df).collect()
    assert len(out) == 1 and out[0].rate == 4.0  # 2.0 / 0.5s


def test_interval_keeps_last_per_bucket(spark):
    from opentelemetry_collector_contrib_spark.processors import IntervalProcessor
    import datetime as dt

    t0 = dt.datetime(2024, 1, 1, 10, 0, 0)
    df = spark.createDataFrame(
        [("m", t0, 1.0), ("m", t0 + dt.timedelta(minutes=30), 2.0),
         ("m", t0 + dt.timedelta(hours=1), 3.0)],
        "metric string, ts timestamp, value double",
    )
    out = IntervalProcessor(interval="1 hour", stream_keys=["metric"])(df)
    got = {(r.interval_start.hour, r.value) for r in out.collect()}
    assert got == {(10, 2.0), (11, 3.0)}


def test_interval_honors_duration_multiple(spark):
    # "15 minutes" must bucket per 15 minutes, not per minute: inputs at
    # :00/:05/:20/:40 -> three buckets (:00-:15 keeps the :05 point)
    from opentelemetry_collector_contrib_spark.processors import IntervalProcessor
    import datetime as dt

    t0 = dt.datetime(2024, 1, 1, 10, 0, 0)
    df = spark.createDataFrame(
        [("m", t0, 1.0), ("m", t0 + dt.timedelta(minutes=5), 2.0),
         ("m", t0 + dt.timedelta(minutes=20), 3.0),
         ("m", t0 + dt.timedelta(minutes=40), 4.0)],
        "metric string, ts timestamp, value double",
    )
    out = IntervalProcessor(interval="15 minutes", stream_keys=["metric"])(df)
    got = {(r.interval_start.minute, r.value) for r in out.collect()}
    assert got == {(0, 2.0), (15, 3.0), (30, 4.0)}

    import pytest

    with pytest.raises(ValueError):
        IntervalProcessor(interval="3 months", stream_keys=["metric"])
    with pytest.raises(ValueError):
        IntervalProcessor(interval="2 fortnights", stream_keys=["metric"])


def test_cidr_enrich_range_join(spark):
    """geoip posture (geoip_processor.go:83-135): CIDR prefix ranges
    resolve via a broadcast /16-bucket equi-join + range residual —
    never a BroadcastNestedLoopJoin."""
    from opentelemetry_collector_contrib_spark.processors import CidrEnrich

    dim = spark.createDataFrame(
        [
            ("10.1.0.0/16", "net-a"),
            ("10.2.128.0/24", "net-b"),
            ("172.16.0.0/12", "net-wide"),  # spans 16 /16 buckets
        ],
        "cidr string, name string",
    )
    facts = spark.createDataFrame(
        [
            (1, "10.1.200.7"),      # inside /16
            (2, "10.2.128.9"),      # inside /24
            (3, "10.2.129.9"),      # outside the /24 -> no match
            (4, "172.31.255.255"),  # last addr of the /12
            (5, "172.32.0.0"),      # one past the /12 -> no match
            (6, "not-an-ip"),       # malformed -> null, kept
            (7, "10.1.999.1"),      # octet out of range -> null, kept
        ],
        "id int, ip string",
    )
    out = CidrEnrich(dim, ip_col="ip", prefix="")(facts)
    rows = {r.id: r.name for r in out.collect()}
    assert rows == {
        1: "net-a", 2: "net-b", 3: None, 4: "net-wide",
        5: None, 6: None, 7: None,
    }
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "NestedLoop" not in plan and "Cartesian" not in plan


def test_cidr_enrich_longest_prefix_match(spark):
    from opentelemetry_collector_contrib_spark.processors import CidrEnrich

    dim = spark.createDataFrame(
        [("10.0.0.0/8", "wide"), ("10.5.0.0/16", "mid"), ("10.5.5.0/24", "narrow")],
        "cidr string, name string",
    )
    facts = spark.createDataFrame(
        [(1, "10.9.0.1"), (2, "10.5.9.1"), (3, "10.5.5.1"), (3, "10.5.5.1")],
        "id int, ip string",
    )
    out = CidrEnrich(dim, ip_col="ip", prefix="", longest_prefix_match=True)(facts)
    got = sorted((r.id, r.name) for r in out.collect())
    # duplicate fact rows each keep their own LPM result
    assert got == [(1, "wide"), (2, "mid"), (3, "narrow"), (3, "narrow")]


# --- remote tap (processor/remotetapprocessor/processor.go:95-140) ----------


def test_remote_tap_passthrough_and_bounded_sample(spark, tmp_path):
    import json
    import os

    from opentelemetry_collector_contrib_spark.processors import RemoteTap

    df = spark.createDataFrame(
        [(f"b{i}", "INFO") for i in range(50)], "body string, severity_text string"
    )
    tap = RemoteTap(str(tmp_path / "tap"), sample_rows=3)
    out = tap(df)
    # pass-through: the returned frame is the input, unmodified
    assert out is df
    files = []
    for root, _, names in os.walk(tmp_path / "tap"):
        files += [os.path.join(root, n) for n in names if not n.startswith(("_", "."))]
    lines = []
    for f in files:
        lines += [ln for ln in open(f).read().splitlines() if ln]
    # tap volume is bounded by sample_rows, never O(data)
    assert len(lines) == 3
    doc = json.loads(lines[0])
    rec = doc["resourceLogs"][0]["scopeLogs"][0]["logRecords"][0]
    assert rec["severityText"] == "INFO"


def test_remote_tap_successive_invocations_separate_dirs(spark, tmp_path):
    import os

    from opentelemetry_collector_contrib_spark.processors import RemoteTap

    df = spark.createDataFrame([("x",)], "body string")
    tap = RemoteTap(str(tmp_path / "tap"))
    tap(df)
    tap(df)
    assert sorted(os.listdir(tmp_path / "tap")) == ["tap-00000", "tap-00001"]
