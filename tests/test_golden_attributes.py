"""attributesprocessor reference goldens, ported verbatim.

Case tables from
``processor/attributesprocessor/attributes_log_test.go``:
- TestLogAttributes_Hash (:284-345): exact SHA2-256 digests per value
  type — string/int/double/bool byte encodings from
  ``internal/coreinternal/attraction/hasher.go:29-58``.
- TestLogAttributes_Convert (:347-430): type conversions incl. the
  keep-original-on-failed-parse rule
  (``attraction/type_converter.go:19-76``).
- TestAttributes_FilterLogs (:97-156) /
  TestAttributes_FilterLogsByNameStrict (:158-218) /
  TestAttributes_FilterLogsByNameRegexp (:220-282): include/exclude
  match guards over the resource ``name`` attribute (strict + regexp
  filtersets) gating an INSERT action.

The log-record model maps to one row per record with the resource
``name`` as a column and the record attributes as typed columns (hash
cases) or a ``map<string,string>`` (convert/filter cases — pcommon.Map
under our table semantics).
"""

from __future__ import annotations

import pytest

from opentelemetry_collector_contrib_spark.processors import (
    Action,
    AttributesProcessor,
)


# --- TestLogAttributes_Hash: exact digests from the reference table ---------

HASH_CASES = [
    # (column, dtype, input literal, expected digest) — verbatim
    ("user_email", "string", "john.doe@example.com",
     "836f82db99121b3481011f16b49dfa5fbc714a0d1b1b9f784a1ebbbf5b39577f"),
    ("user_id", "long", 10,
     "a111f275cc2e7588000001d300a31e76336d15b9d314cd1a1d8f3d3556975eed"),
    ("user_balance", "double", 99.1,
     "05fabd78b01be9692863cb0985f600c99da82979af18db5c55173c2a30adb924"),
    ("user_authenticated", "boolean", True,
     "4bf5122f344554c53bde2ebb8cd2b7e3d1600ad631c385a5d7cce23c7785459a"),
]


@pytest.mark.parametrize("col,dtype,value,expected", HASH_CASES)
def test_hash_digests_verbatim(spark, col, dtype, value, expected):
    df = spark.createDataFrame([(value,)], f"{col} {dtype}")
    out = AttributesProcessor([Action("hash", key=col)])(df).collect()[0]
    assert out[col] == expected


# --- TestLogAttributes_Convert: map-backed attributes ------------------------

CONVERT_CASES = [
    # (name, target, input string value, expected string value)
    ("int to int", "int", "1", "1"),
    ("false to int", "int", "false", "0"),
    ("String to int (good)", "int", "123", "123"),
    ("String to int (bad)", "int", "int-10", "int-10"),
    ("String to double", "double", "123.6", "123.6"),
    ("Double to string", "string", "99.1", "99.1"),
]


@pytest.mark.parametrize("name,target,value,expected", CONVERT_CASES)
def test_convert_verbatim(spark, name, target, value, expected):
    key = {"int": "to.int", "double": "to.double", "string": "to.string"}[
        target
    ]
    df = spark.createDataFrame(
        [({key: value},)], "attributes map<string,string>"
    )
    p = AttributesProcessor(
        [Action("convert", key=f'attributes["{key}"]', converted_type=target)]
    )
    out = p(df).collect()[0]
    assert out["attributes"][key] == expected, name


# --- include/exclude guard tables --------------------------------------------

def _run_filter_cases(spark, proc, cases):
    """Each case: (resource name, input attrs, expected attrs)."""
    for name, attrs, expected in cases:
        df = spark.createDataFrame(
            [(name, attrs)], "name string, attributes map<string,string>"
        )
        out = dict(proc(df).collect()[0]["attributes"])
        out = {k: v for k, v in out.items() if v is not None}
        assert out == expected, name


def test_filter_logs_resource_regex_include_attr_exclude(spark):
    """TestAttributes_FilterLogs: include = resource name =~ ^[^i].*,
    exclude = attribute NoModification == "true" (strict)."""
    proc = AttributesProcessor(
        [Action("insert", key="attributes.attribute1", value="123")],
        include="name rlike '^[^i].*'",
        exclude="attributes['NoModification'] = 'true'",
    )
    _run_filter_cases(spark, proc, [
        ("apply processor", {}, {"attribute1": "123"}),
        ("apply processor with different value for exclude property",
         {"NoModification": "false"},
         {"attribute1": "123", "NoModification": "false"}),
        ("incorrect name for include property", {}, {}),
        ("attribute match for exclude property",
         {"NoModification": "true"}, {"NoModification": "true"}),
    ])


def test_filter_logs_by_name_strict(spark):
    """TestAttributes_FilterLogsByNameStrict: include name == "apply",
    exclude name == "dont_apply"."""
    proc = AttributesProcessor(
        [Action("insert", key="attributes.attribute1", value="123")],
        include="name = 'apply'",
        exclude="name = 'dont_apply'",
    )
    _run_filter_cases(spark, proc, [
        ("apply", {}, {"attribute1": "123"}),
        ("apply", {"NoModification": "false"},
         {"attribute1": "123", "NoModification": "false"}),
        ("incorrect_log_name", {}, {}),
        ("dont_apply", {}, {}),
        ("incorrect_log_name_with_attr",
         {"NoModification": "true"}, {"NoModification": "true"}),
    ])


def test_filter_logs_by_name_regexp(spark):
    """TestAttributes_FilterLogsByNameRegexp: include name =~ ^apply.*,
    exclude name =~ .*dont_apply$."""
    proc = AttributesProcessor(
        [Action("insert", key="attributes.attribute1", value="123")],
        include="name rlike '^apply.*'",
        exclude="name rlike '.*dont_apply$'",
    )
    _run_filter_cases(spark, proc, [
        ("apply_to_log_with_no_attrs", {}, {"attribute1": "123"}),
        ("apply_to_log_with_attr", {"NoModification": "false"},
         {"attribute1": "123", "NoModification": "false"}),
        ("incorrect_log_name", {}, {}),
        ("apply_dont_apply", {}, {}),
        ("incorrect_log_name_with_attr",
         {"NoModification": "true"}, {"NoModification": "true"}),
    ])


def test_attributes_with_match_properties_guard(spark):
    # attraction include/exclude as the declarative MatchConfig forms
    # (processor/attributesprocessor/config.go Include/Exclude) instead
    # of SQL strings
    from opentelemetry_collector_contrib_spark.processors import (
        Action,
        AttributesProcessor,
        LogMatchProperties,
    )

    df = spark.createDataFrame(
        [({"svc": "a"}, {}, "keep me", "INFO", 9),
         ({"svc": "b"}, {}, "skip me", "INFO", 9)],
        "resource map<string,string>, attributes map<string,string>, "
        "body string, severity_text string, severity_number int",
    )
    proc = AttributesProcessor(
        actions=[Action("upsert", key="attributes.touched", value="1")],
        include=LogMatchProperties(
            match_type="strict", resource_attributes=[("svc", "a")]
        ),
    )
    rows = {r.body: dict(r.attributes) for r in proc(df).collect()}
    assert rows["keep me"].get("touched") == "1"
    assert "touched" not in rows["skip me"]
