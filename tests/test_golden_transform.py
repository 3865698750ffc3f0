"""Golden parity with the reference transformprocessor's own testdata
(processor/transformprocessor/testdata/logs + processor_test.go:67-91):
statements `set(resource.attributes["host.name"], attributes["host.name"])`
+ `delete_key(attributes, "host.name")` over input.yaml must produce
expected-with-flatten.yaml.

The reference needs ``flatten_data: true`` for this result because its
pdata tree SHARES one mutable resource across the batch (without
flatten, the last record's write wins for every record). The columnar
envelope carries resource per row, so the per-record semantics — the
ones the flatten flag exists to recover — are the only behavior here.
"""

from __future__ import annotations

from pathlib import Path

import pytest
import yaml

from opentelemetry_collector_contrib_spark.functions import compile_statement

REF = Path("/root/reference/processor/transformprocessor/testdata/logs")

pytestmark = pytest.mark.skipif(
    not REF.exists(), reason="reference testdata not mounted"
)


def _kv(entries) -> dict[str, str]:
    return {e["key"]: e["value"]["stringValue"] for e in (entries or [])}


def _rows(path: Path):
    doc = yaml.safe_load(path.read_text())
    out = []
    for rl in doc["resourceLogs"]:
        res = _kv((rl.get("resource") or {}).get("attributes"))
        for sl in rl["scopeLogs"]:
            for lr in sl["logRecords"]:
                out.append(
                    (
                        lr["body"]["stringValue"],
                        _kv(lr.get("attributes")),
                        res,
                    )
                )
    return out


def test_transform_golden_resource_promotion(spark):
    df = spark.createDataFrame(
        _rows(REF / "input.yaml"),
        "body string, attributes map<string,string>, resource map<string,string>",
    )
    for stmt in [
        'set(resource.attributes["host.name"], attributes["host.name"])',
        'delete_key(attributes, "host.name")',
    ]:
        df = compile_statement(stmt)(df)
    got = sorted(
        (r["body"], tuple(sorted(dict(r["attributes"]).items())),
         tuple(sorted(dict(r["resource"]).items())))
        for r in df.collect()
    )
    expected = sorted(
        (body, tuple(sorted(attrs.items())), tuple(sorted(res.items())))
        for body, attrs, res in _rows(REF / "expected-with-flatten.yaml")
    )
    assert got == expected
