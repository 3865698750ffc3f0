"""groupbyattrs golden parity with the reference processor's own tests.

Transcribed from processor/groupbyattrsprocessor/processor_test.go:
- TestComplexAttributeGrouping (:206-264): the 4-case table over
  someComplexLogs (rlCount resources x illCount scope-logs, each with
  one record carrying commonGroupedAttr=abc + commonNonGroupedAttr=xyz)
  asserting output resource count, total record count, moved-vs-kept
  attribute placement.
- TestAttributeGrouping (:398-426): the 4-case table over the shared
  attrMap {xx: aa, yy: 11} asserting the extracted resource attrs and
  the surviving record attrs.

Columnar restatement: a "resource" is the identity map column; the
output resource count is the number of distinct identity hashes.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from opentelemetry_collector_contrib_spark.processors import GroupByAttrs


def _complex_logs(spark, with_res_idx: bool, rl_count: int, ill_count: int):
    """someComplexLogs: one row per record; resource map carries
    resourceAttrIndex when with_res_idx."""
    rows = []
    for i in range(rl_count):
        res = {"resourceAttrIndex": str(i)} if with_res_idx else {}
        for _j in range(ill_count):
            rows.append(
                (res, {"commonGroupedAttr": "abc", "commonNonGroupedAttr": "xyz"})
            )
    return spark.createDataFrame(
        rows, "resource map<string,string>, attributes map<string,string>"
    )


COMPLEX_CASES = [
    # (name, keys, with_res_idx, should_move, rl, ill, out_resources, out_records)
    ("not unique resource attrs", ["commonGroupedAttr"], False, True, 4, 4, 1, 16),
    ("unique resource attrs", ["commonGroupedAttr"], True, True, 4, 4, 4, 16),
    ("compaction empty keys", [], False, False, 4, 4, 1, 16),
    ("compaction empty keys grouped res", [], True, False, 4, 4, 4, 16),
]


@pytest.mark.parametrize(
    "name,keys,with_idx,should_move,rl,ill,out_res,out_recs",
    COMPLEX_CASES,
    ids=[c[0] for c in COMPLEX_CASES],
)
def test_complex_attribute_grouping(
    spark, name, keys, with_idx, should_move, rl, ill, out_res, out_recs
):
    df = _complex_logs(spark, with_idx, rl, ill)
    out = GroupByAttrs(keys=keys)(df).cache()
    rows = out.collect()
    assert len(rows) == out_recs
    assert out.select("resource_hash").distinct().count() == out_res
    for r in rows:
        if should_move:
            # moved to resource level: gone from record attrs, present as
            # the promoted identity column
            assert r["attributes"] == {"commonNonGroupedAttr": "xyz"}
            assert r["commonGroupedAttr"] == "abc"
        else:
            assert r["attributes"] == {
                "commonGroupedAttr": "abc",
                "commonNonGroupedAttr": "xyz",
            }
    out.unpersist()


ATTR_CASES = [
    # (name, keys, expected_resource_attrs, expected_record_attrs)
    ("two groupByKeys", ["xx", "yy"], {"xx": "aa", "yy": "11"}, {}),
    ("one groupByKey", ["xx"], {"xx": "aa"}, {"yy": "11"}),
    ("not matching groupByKeys", ["zz"], {}, {"xx": "aa", "yy": "11"}),
    ("empty groupByKeys", [], {}, {"xx": "aa", "yy": "11"}),
]


@pytest.mark.parametrize(
    "name,keys,exp_res,exp_attrs", ATTR_CASES, ids=[c[0] for c in ATTR_CASES]
)
def test_attribute_grouping(spark, name, keys, exp_res, exp_attrs):
    count = 4
    df = spark.createDataFrame(
        [({"xx": "aa", "yy": "11"},)] * count, "attributes map<string,string>"
    )
    out = GroupByAttrs(keys=keys)(df).cache()
    rows = out.collect()
    assert len(rows) == count
    # all records land under ONE resource identity
    assert out.select("resource_hash").distinct().count() == 1
    for r in rows:
        assert r["attributes"] == exp_attrs
        for k, v in exp_res.items():
            assert r[k] == v
    out.unpersist()


def test_move_false_keeps_record_attrs(spark):
    df = spark.createDataFrame(
        [({"xx": "aa", "yy": "11"},)], "attributes map<string,string>"
    )
    r = GroupByAttrs(keys=["xx"], move=False)(df).collect()[0]
    assert r["attributes"] == {"xx": "aa", "yy": "11"} and r["xx"] == "aa"


def test_resource_override_semantics(spark):
    # extracted record attr overrides a same-named base resource attr in
    # the identity (reference copies the resource, then puts extracted
    # values on top): two records whose BASE resource differs only in the
    # overridden key collapse into one identity
    df = spark.createDataFrame(
        [
            ({"env": "stale1", "host": "h"}, {"env": "prod"}),
            ({"env": "stale2", "host": "h"}, {"env": "prod"}),
        ],
        "resource map<string,string>, attributes map<string,string>",
    )
    out = GroupByAttrs(keys=["env"])(df)
    assert out.select("resource_hash").distinct().count() == 1


def test_distinct_grouped_values_distinct_identities(spark):
    # the core grouping semantic the reference tables never vary: records
    # whose extracted attr VALUES differ must land in different resource
    # identities, and the identity must be computed from the pre-move
    # attributes (regression: a post-move evaluation sees an emptied map
    # and collapses everything to one group)
    df = spark.createDataFrame(
        [({"env": "prod"},), ({"env": "prod"},), ({"env": "dev"},), ({},)],
        "attributes map<string,string>",
    )
    out = GroupByAttrs(keys=["env"])(df).cache()
    assert out.select("resource_hash").distinct().count() == 3
    assert "__gba_extracted__" not in out.columns
    by_env = {r["env"]: r["resource_hash"] for r in out.collect()}
    assert by_env["prod"] != by_env["dev"] != by_env[None]
    out.unpersist()


def test_zero_shuffle_plan(spark):
    # default posture must stay a pure projection — no Exchange
    df = spark.createDataFrame(
        [({"xx": "aa"},)], "attributes map<string,string>"
    )
    plan = GroupByAttrs(keys=["xx"])(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    df2 = spark.createDataFrame(
        [({"xx": "aa"},)], "attributes map<string,string>"
    )
    plan2 = (
        GroupByAttrs(keys=["xx"], repartition=True)(df2)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" in plan2
