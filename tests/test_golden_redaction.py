"""redactionprocessor reference goldens, ported verbatim.

Case tables from ``processor/redactionprocessor/processor_test.go``
(:21-418). Each reference case builds one span whose attributes combine
an ``allowed`` / ``ignored`` / ``masked`` / ``redacted`` map; here that
is one row with a ``map<string,string>`` attributes column (pcommon.Map
under table semantics — ints render as their strings).
"""

from __future__ import annotations

import pytest

from opentelemetry_collector_contrib_spark.processors.redaction import (
    IGNORED_COUNT,
    MASKED_COUNT,
    MASKED_KEYS,
    REDACTED_COUNT,
    REDACTED_KEYS,
    Redaction,
)

CC_PATTERN = "4[0-9]{12}(?:[0-9]{3})?"


def _apply(spark, proc, attrs):
    df = spark.createDataFrame([(attrs,)], "attributes map<string,string>")
    return dict(proc(df).collect()[0]["attributes"])


def test_redact_unknown_attributes(spark):
    """TestRedactUnknownAttributes (:21-49): keys off the allowlist are
    deleted."""
    out = _apply(
        spark,
        Redaction(allowed_keys=["group", "id", "name"]),
        {"group": "temporary", "id": "5", "name": "placeholder",
         "credit_card": "4111111111111111"},
    )
    assert out == {"group": "temporary", "id": "5", "name": "placeholder"}


def test_allow_all_keys(spark):
    """TestAllowAllKeys (:54-76): allow_all_keys keeps off-list keys."""
    out = _apply(
        spark,
        Redaction(allowed_keys=["group", "id"], allow_all_keys=True),
        {"group": "temporary", "id": "5", "name": "placeholder"},
    )
    assert out["name"] == "placeholder"


def test_allow_all_keys_mask_values(spark):
    """TestAllowAllKeysMaskValues (:79-108): masking replaces the
    MATCHED SUBSTRING, not the whole value."""
    out = _apply(
        spark,
        Redaction(
            allowed_keys=["group", "id", "name"],
            blocked_value_patterns=[CC_PATTERN],
            allow_all_keys=True,
        ),
        {"group": "temporary", "id": "5", "name": "placeholder",
         "credit_card": "placeholder 4111111111111111"},
    )
    assert out["credit_card"] == "placeholder ****"
    assert out["group"] == "temporary"


def test_redact_summary_debug(spark):
    """TestRedactSummaryDebug (:111-163): full keys+counts summary;
    ignored keys escape both deletion and masking."""
    out = _apply(
        spark,
        Redaction(
            allowed_keys=["id", "group", "name", "group.id", "member (id)"],
            blocked_value_patterns=[CC_PATTERN],
            ignored_keys=["safe_attribute"],
            summary="debug",
        ),
        {"id": "5", "group.id": "some.valid.id",
         "member (id)": "some other valid id",
         "name": "placeholder 4111111111111111",
         "safe_attribute": "harmless 4111111111111112",
         "credit_card": "4111111111111111"},
    )
    assert "credit_card" not in out
    assert out[REDACTED_KEYS] == "credit_card"
    assert out[REDACTED_COUNT] == "1"
    assert out[IGNORED_COUNT] == "1"
    assert out[MASKED_KEYS] == "name"
    assert out[MASKED_COUNT] == "1"
    assert out["name"] == "placeholder ****"
    assert out["safe_attribute"] == "harmless 4111111111111112"


def test_redact_summary_info(spark):
    """TestRedactSummaryInfo (:169-217): counts only, no key lists."""
    out = _apply(
        spark,
        Redaction(
            allowed_keys=["id", "name", "group"],
            blocked_value_patterns=[CC_PATTERN],
            ignored_keys=["safe_attribute"],
            summary="info",
        ),
        {"id": "5",
         "safe_attribute": "harmless but suspicious 4111111111111141",
         "name": "placeholder 4111111111111111",
         "credit_card": "4111111111111111"},
    )
    assert "credit_card" not in out
    assert REDACTED_KEYS not in out
    assert out[REDACTED_COUNT] == "1"
    assert MASKED_KEYS not in out
    assert out[MASKED_COUNT] == "1"
    assert out[IGNORED_COUNT] == "1"
    assert out["name"] == "placeholder ****"
    assert out["safe_attribute"] == "harmless but suspicious 4111111111111141"


@pytest.mark.parametrize("summary", ["silent", "default"])
def test_redact_summary_silent_and_default(spark, summary):
    """TestRedactSummarySilent (:220-252) / Default (:255-281)."""
    out = _apply(
        spark,
        Redaction(
            allowed_keys=["id", "name", "group"],
            blocked_value_patterns=[CC_PATTERN],
            summary=summary,
        ),
        {"id": "5", "name": "placeholder 4111111111111111",
         "credit_card": "4111111111111111"},
    )
    assert "credit_card" not in out
    for meta in (REDACTED_KEYS, REDACTED_COUNT, MASKED_KEYS, MASKED_COUNT,
                 IGNORED_COUNT):
        assert meta not in out
    assert out["name"] == "placeholder ****"


def test_multiple_block_values(spark):
    """TestMultipleBlockValues (:284-330): several patterns apply in
    sequence to the same value; masked key list is sorted."""
    out = _apply(
        spark,
        Redaction(
            allowed_keys=["id", "name", "mystery"],
            blocked_value_patterns=[CC_PATTERN, "(5[1-5][0-9]{3})"],
            summary="debug",
        ),
        {"id": "5", "mystery": "mystery 52000",
         "name": "placeholder 4111111111111111 52000",
         "credit_card": "4111111111111111"},
    )
    assert out[REDACTED_KEYS] == "credit_card"
    assert out[REDACTED_COUNT] == "1"
    assert out[MASKED_KEYS] == "mystery,name"
    assert out[MASKED_COUNT] == "2"
    assert out["name"] == "placeholder **** ****"
    assert out["mystery"] == "mystery ****"


def test_process_attrs_applied_twice(spark):
    """TestProcessAttrsAppliedTwice (:333-365): reapplication merges the
    summary (keys re-sorted, counts added) instead of overwriting, and
    never deletes the meta attributes themselves."""
    proc = Redaction(
        allowed_keys=["id", "credit_card", "mystery"],
        blocked_value_patterns=[CC_PATTERN],
        summary="debug",
    )
    first = _apply(
        spark, proc,
        {"id": "5", "credit_card": "4111111111111111",
         "mystery": "mystery 4111111111111111", "drop_me": "x"},
    )
    assert first[REDACTED_KEYS] == "drop_me"
    assert first[MASKED_KEYS] == "credit_card,mystery"
    assert first[MASKED_COUNT] == "2"
    df2 = spark.createDataFrame([(first,)], "attributes map<string,string>")
    second = dict(proc(df2).collect()[0]["attributes"])
    # meta attrs survived (implicit allowlist) and counts accumulated
    assert second[REDACTED_KEYS] == "drop_me"
    assert second[REDACTED_COUNT] == "1"
    assert second[MASKED_COUNT] == "2"  # values already masked: no new hits
