"""Golden-output parity with the reference's OWN countconnector test
corpus: connector/countconnector/testdata/logs/*.yaml driven through
our CountConnector with the exact metric configs from
connector_test.go:537-658 (TestLogsToMetrics), conditions included —
the OTTL condition strings compile through functions.compile_condition
verbatim (`resource.attributes["resource.optional"] != nil` etc.).

The reference emits one metric tree per input RESOURCE; the columnar
equivalent here runs the connector per resource slice and compares
(metric name, datapoint attributes, count) sets bit-for-bit.
"""

from __future__ import annotations

from pathlib import Path

import pytest
import yaml
from pyspark.sql import functions as F

from opentelemetry_collector_contrib_spark.connectors import CountConnector, MetricDef

REF = Path("/root/reference/connector/countconnector/testdata/logs")

pytestmark = pytest.mark.skipif(
    not REF.exists(), reason="reference testdata not mounted"
)


def _kv(entries) -> dict[str, str]:
    return {e["key"]: e["value"]["stringValue"] for e in (entries or [])}


@pytest.fixture(scope="module")
def log_input(spark):
    doc = yaml.safe_load((REF / "input.yaml").read_text())
    rows = []
    for ri, rl in enumerate(doc["resourceLogs"]):
        res = _kv(rl["resource"].get("attributes"))
        for sl in rl["scopeLogs"]:
            for lr in sl["logRecords"]:
                rows.append(
                    (ri, res, _kv(lr.get("attributes")), lr["body"]["stringValue"])
                )
    return spark.createDataFrame(
        rows,
        "res_id int, resource map<string,string>, "
        "attributes map<string,string>, body string",
    )


def _golden(name: str):
    """(res_attrs, metric, dp_attrs, count) tuples from the golden yaml."""
    doc = yaml.safe_load((REF / f"{name}.yaml").read_text())
    out = []
    for rm in doc["resourceMetrics"]:
        res = tuple(sorted(_kv(rm["resource"].get("attributes")).items()))
        for sm in rm["scopeMetrics"]:
            for metric in sm["metrics"]:
                for dp in metric["sum"]["dataPoints"]:
                    out.append(
                        (
                            res,
                            metric["name"],
                            tuple(sorted(_kv(dp.get("attributes")).items())),
                            int(dp["asInt"]),
                        )
                    )
    return sorted(out)


RES_OPT = 'resource.attributes["resource.optional"] != nil'
LOG_OPT = 'attributes["log.optional"] != nil'

# exact configs from connector_test.go TestLogsToMetrics
CASES = {
    "zero_conditions": [MetricDef()],
    "one_condition": [MetricDef("count.if", conditions=[RES_OPT])],
    "multiple_conditions": [MetricDef("count.if", conditions=[RES_OPT, LOG_OPT])],
    "multiple_metrics": [
        MetricDef("count.all"),
        MetricDef("count.if", conditions=[RES_OPT]),
    ],
    "one_attribute": [
        MetricDef("log.count.by_attr", attributes=[("log.required", None)])
    ],
    "multiple_attributes": [
        MetricDef(
            "log.count.by_attr",
            attributes=[("log.required", None), ("log.optional", None)],
        )
    ],
    "default_attribute_value": [
        MetricDef(
            "log.count.by_attr",
            attributes=[("log.required", None), ("log.optional", "other")],
        )
    ],
    "condition_and_attribute": [
        MetricDef(
            "log.count.if.by_attr",
            conditions=[RES_OPT],
            attributes=[("log.required", None)],
        )
    ],
}


@pytest.mark.parametrize("name", sorted(CASES))
def test_logs_to_metrics_golden(spark, log_input, name):
    # the reference's OTTL condition strings feed the connector verbatim
    metrics = CASES[name]
    df = log_input
    expected = _golden(name)
    got = []
    res_by_id: dict[int, tuple] = {}
    for r in log_input.select("res_id", "resource").collect():
        res_by_id.setdefault(r["res_id"], tuple(sorted(dict(r["resource"]).items())))
    for ri, res in res_by_id.items():
        out = CountConnector(metrics, language="ottl")(
            df.filter(F.col("res_id") == ri)
        )
        for r in out.collect():
            attrs = {k: v for k, v in dict(r["attrs"]).items() if v is not None}
            got.append(
                (res, r["metric_name"], tuple(sorted(attrs.items())), int(r["count"]))
            )
    assert sorted(got) == expected, f"{name}: {sorted(got)} != {expected}"
