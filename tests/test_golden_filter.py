"""Reference filterprocessor golden cases, ported verbatim.

Source: processor/filterprocessor/logs_test.go:204-566 — the
``standardLogTests`` include/exclude table (strict + regexp attribute /
severity-text / body matchers and min-severity-number properties) and
TestFilterLogProcessorWithOTTL:699-764 (OTTL condition cascade incl.
the erroring-condition case)."""

from __future__ import annotations

import pytest

from opentelemetry_collector_contrib_spark.processors import (
    FilterProcessor,
    LogMatchProperties,
)

# logWithResource fixtures (logs_test.go:44-204), one row per log record
IN_LOG_NAMES = [("full_name_match", {}, {}, None, None, 0),
                ("random", {}, {}, None, None, 0)]

RESOURCE_TEST = [
    ("log1", {"attr1": "attr1/val1", "attr2": "attr2/val2", "attr3": "attr3/val3"}, {}, None, None, 0),
    ("log2", {"attr1": "attr1/val1", "attr2": "attr2/val2", "attr3": "attr3/val3"}, {}, None, None, 0),
]

TWO_RESOURCE = [
    ("log1", {"attr1": "attr1/val1"}, {}, None, None, 0),
    ("log2", {"attr1": "attr1/val1"}, {}, None, None, 0),
    ("log3", {"attr1": "attr1/val2"}, {}, None, None, 0),
    ("log4", {"attr1": "attr1/val2"}, {}, None, None, 0),
]

TWO_RESOURCE_REC = [
    ("log1", {"attr1": "attr1/val1"}, {"rec": "rec/val1"}, None, None, 0),
    ("log2", {"attr1": "attr1/val1"}, {"rec": "rec/val1"}, None, None, 0),
    ("log3", {"attr1": "attr1/val2"}, {"rec": "rec/val2"}, None, None, 0),
    ("log4", {"attr1": "attr1/val2"}, {"rec": "rec/val2"}, None, None, 0),
]

THREE_RESOURCE_REC = TWO_RESOURCE_REC + [
    ("log5", {"attr1": "attr1/val5"}, {"rec": "rec/val5"}, None, None, 0),
]

FOUR_RESOURCE = [
    ("log1", {"attr": "attr/val1"}, {}, None, None, 0),
    ("log2", {"attr": "attr/val2"}, {}, None, None, 0),
    ("log3", {"attr": "attr/val3"}, {}, None, None, 0),
    ("log4", {"attr": "attr/val4"}, {}, None, None, 0),
]

SEVERITY_TEXT = [
    ("log1", {}, {}, "DEBUG", None, 0),
    ("log2", {}, {}, "DEBUG2", None, 0),
    ("log3", {}, {}, "INFO", None, 0),
    ("log4", {}, {}, "WARN", None, 0),
]

BODY = [
    ("log1", {}, {}, None, "This is a log body", 0),
    ("log2", {}, {}, None, "This is also a log body", 0),
    ("log3", {}, {}, None, "test1", 0),
    ("log4", {}, {}, None, "test2", 0),
]

SEVERITY_NUMBER = [
    ("log1", {}, {}, None, None, 5),   # DEBUG
    ("log2", {}, {}, None, None, 9),   # INFO
    ("log3", {}, {}, None, None, 17),  # ERROR
    ("log4", {}, {}, None, None, 0),   # UNSPECIFIED
]

SCHEMA = (
    "log_name string, resource map<string,string>, "
    "attributes map<string,string>, severity_text string, body string, "
    "severity_number int"
)


def _run(spark, rows, inc=None, exc=None):
    df = spark.createDataFrame(
        [(n, r, a, st, b, sn) for n, r, a, st, b, sn in rows], SCHEMA
    )
    out = FilterProcessor(include=inc, exclude=exc)(df)
    return sorted(r.log_name for r in out.collect())


# (name, include, exclude, rows, expected kept log names) —
# standardLogTests logs_test.go:204-566 verbatim
STANDARD_LOG_TESTS = [
    ("emptyFilterInclude",
     LogMatchProperties("strict"), None, IN_LOG_NAMES,
     ["full_name_match", "random"]),
    ("includeNilWithResourceAttributes",
     LogMatchProperties("strict"), None, RESOURCE_TEST, ["log1", "log2"]),
    ("includeAllWithMissingResourceAttributes",
     LogMatchProperties("strict", resource_attributes=[("attr1", "attr1/val2")]),
     None, TWO_RESOURCE, ["log3", "log4"]),
    ("emptyFilterExclude",
     None, LogMatchProperties("strict"), IN_LOG_NAMES,
     ["full_name_match", "random"]),
    ("excludeNilWithResourceAttributes",
     None, LogMatchProperties("strict"), RESOURCE_TEST, ["log1", "log2"]),
    ("excludeAllWithMissingResourceAttributes",
     None, LogMatchProperties("strict", resource_attributes=[("attr1", "attr1/val1")]),
     TWO_RESOURCE, ["log3", "log4"]),
    ("emptyFilterIncludeAndExclude",
     LogMatchProperties("strict"), LogMatchProperties("strict"), IN_LOG_NAMES,
     ["full_name_match", "random"]),
    ("allWithMissingResourceAttributesIncludeAndExclude",
     LogMatchProperties("strict", resource_attributes=[("attr1", "attr1/val2")]),
     LogMatchProperties("strict", resource_attributes=[("attr1", "attr1/val1")]),
     TWO_RESOURCE, ["log3", "log4"]),
    ("matchAttributesWithRegexpInclude",
     LogMatchProperties("regexp", resource_attributes=[("attr", "attr/val2")]),
     None, FOUR_RESOURCE, ["log2"]),
    ("matchAttributesWithRegexpInclude2",
     LogMatchProperties("regexp", resource_attributes=[("attr", "attr/val(2|3)")]),
     None, FOUR_RESOURCE, ["log2", "log3"]),
    ("matchAttributesWithRegexpInclude3",
     LogMatchProperties("regexp", resource_attributes=[("attr", "attr/val[234]")]),
     None, FOUR_RESOURCE, ["log2", "log3", "log4"]),
    ("matchAttributesWithRegexpInclude4",
     LogMatchProperties("regexp", resource_attributes=[("attr", "attr/val.*")]),
     None, FOUR_RESOURCE, ["log1", "log2", "log3", "log4"]),
    ("matchAttributesWithRegexpExclude",
     None, LogMatchProperties("regexp", resource_attributes=[("attr", "attr/val[23]")]),
     FOUR_RESOURCE, ["log1", "log4"]),
    ("matchRecordAttributeWithRegexp1",
     LogMatchProperties("regexp", record_attributes=[("rec", "rec/val[1]")]),
     None, TWO_RESOURCE_REC, ["log1", "log2"]),
    ("matchRecordAttributeWithRegexp2a",
     LogMatchProperties("regexp", record_attributes=[("rec", "rec/val[^2]")]),
     None, TWO_RESOURCE_REC, ["log1", "log2"]),
    ("matchRecordAttributeWithRegexp2b",
     LogMatchProperties("regexp", record_attributes=[("rec", "rec/val[1|2]")]),
     None, TWO_RESOURCE_REC, ["log1", "log2", "log3", "log4"]),
    ("matchRecordAttributeWithRegexp3",
     LogMatchProperties("regexp", record_attributes=[("rec", "rec/val[1|5]")]),
     None, THREE_RESOURCE_REC, ["log1", "log2", "log5"]),
    ("includeRecordSeverityStrict",
     LogMatchProperties("strict", severity_texts=["INFO", "DEBUG2"]),
     None, SEVERITY_TEXT, ["log2", "log3"]),
    ("includeRecordSeverityRegexp",
     LogMatchProperties("regexp", severity_texts=["DEBUG[1-4]?"]),
     None, SEVERITY_TEXT, ["log1", "log2"]),
    ("excludeRecordSeverityStrict",
     None, LogMatchProperties("strict", severity_texts=["INFO", "DEBUG"]),
     SEVERITY_TEXT, ["log2", "log4"]),
    ("excludeRecordSeverityRegexp",
     None, LogMatchProperties("regexp", severity_texts=["^[DI]"]),
     SEVERITY_TEXT, ["log4"]),
    ("includeRecordBodyStrict",
     LogMatchProperties("strict", log_bodies=["test1", "test2", "no match"]),
     None, BODY, ["log3", "log4"]),
    ("includeRecordBodyRegexp",
     LogMatchProperties("regexp", log_bodies=["^This"]),
     None, BODY, ["log1", "log2"]),
    ("excludeRecordBodyStrict",
     None, LogMatchProperties("strict", log_bodies=["test1", "test2", "no match"]),
     BODY, ["log1", "log2"]),
    ("excludeRecordBodyRegexp",
     None, LogMatchProperties("regexp", log_bodies=["^This"]),
     BODY, ["log3", "log4"]),
    ("includeMinSeverityINFO",
     LogMatchProperties("regexp", severity_min="INFO"),
     None, SEVERITY_NUMBER, ["log2", "log3"]),
    ("includeMinSeverityDEBUG",
     LogMatchProperties("regexp", severity_min="DEBUG"),
     None, SEVERITY_NUMBER, ["log1", "log2", "log3"]),
    ("includeMinSeverityFATAL+undefined",
     LogMatchProperties("regexp", severity_min="FATAL", match_undefined=True),
     None, SEVERITY_NUMBER, ["log4"]),
    ("excludeMinSeverityINFO",
     None, LogMatchProperties("regexp", severity_min="INFO"),
     SEVERITY_NUMBER, ["log1", "log4"]),
    ("excludeMinSeverityTRACE",
     None, LogMatchProperties("regexp", severity_min="TRACE"),
     SEVERITY_NUMBER, ["log4"]),
    ("excludeMinSeverityINFO+undefined",
     None, LogMatchProperties("regexp", severity_min="INFO", match_undefined=True),
     SEVERITY_NUMBER, ["log1"]),
]


@pytest.mark.parametrize(
    "name,inc,exc,rows,expected",
    STANDARD_LOG_TESTS,
    ids=[t[0] for t in STANDARD_LOG_TESTS],
)
def test_standard_log_tests(spark, name, inc, exc, rows, expected):
    assert _run(spark, rows, inc, exc) == expected


# TestFilterLogProcessorWithOTTL (logs_test.go:699-764): constructLogs
# builds two scopes x [operationA, operationB]
OTTL_ROWS = [
    ("scopeA", "operationA"), ("scopeA", "operationB"),
    ("scopeB", "operationA"), ("scopeB", "operationB"),
]


@pytest.mark.parametrize(
    "name,conditions,expected",
    [
        ("drop logs", ['body == "operationA"'],
         [("scopeA", "operationB"), ("scopeB", "operationB")]),
        ("drop everything by dropping all logs",
         ['IsMatch(body, "operation.*")'], []),
        ("multiple conditions",
         ['IsMatch(body, "wrong name")', 'IsMatch(body, "operation.*")'], []),
        # erroring condition (Substring beyond bounds) + ignore mode:
        # nothing dropped
        ("with error conditions",
         ['Substring("", 0, 100) == "test"'], OTTL_ROWS),
    ],
    ids=["drop_logs", "drop_everything", "multiple_conditions", "error_conditions"],
)
def test_filter_log_processor_with_ottl(spark, name, conditions, expected):
    df = spark.createDataFrame(OTTL_ROWS, "scope string, body string")
    out = FilterProcessor(conditions, language="ottl")(df)
    assert sorted((r.scope, r.body) for r in out.collect()) == sorted(expected)


# --- metrics signal: standardTests (metrics_test.go:42-318) ------------------

VALID_FILTERS = [
    "prefix/.*", "prefix_.*", ".*/suffix", ".*_suffix", ".*/contains/.*",
    ".*_contains_.*", "full/name/match", "full_name_match",
]

IN_METRIC_NAMES = [
    "full_name_match", "not_exact_string_match", "prefix/test/match",
    "prefix_test_match", "prefixprefix/test/match", "test/match/suffix",
    "test_match_suffix", "test/match/suffixsuffix", "test/contains/match",
    "test_contains_match", "random", "full/name/match", "full_name_match",
    "not_exact_string_match",
]

INCLUDE_FILTER_OUT = [
    "full_name_match", "prefix/test/match", "prefix_test_match",
    "prefixprefix/test/match", "test/match/suffix", "test_match_suffix",
    "test/match/suffixsuffix", "test/contains/match", "test_contains_match",
    "full/name/match", "full_name_match",
]

RES1 = {"attr1": "attr1/val1", "attr2": "attr2/val2", "attr3": "attr3/val3"}
RES2 = {"attr1": "attr1/val2"}
# metricWithResource fixtures
RESOURCE_METRICS = [("metric1", RES1), ("metric2", RES1)]
TWO_RESOURCE_METRICS = [
    ("metric1", RES1), ("metric2", RES1), ("metric3", RES2), ("metric4", RES2),
]


def _metric_df(spark, rows):
    return spark.createDataFrame(
        rows, "metric_name string, resource map<string,string>"
    )


METRIC_CASES = [
    ("includeFilter",
     {"include": {"match_type": "regexp", "metric_names": VALID_FILTERS}},
     [(n, {}) for n in IN_METRIC_NAMES], INCLUDE_FILTER_OUT),
    ("excludeFilter",
     {"exclude": {"match_type": "regexp", "metric_names": VALID_FILTERS}},
     [(n, {}) for n in IN_METRIC_NAMES],
     ["not_exact_string_match", "random", "not_exact_string_match"]),
    ("includeAndExclude",
     {"include": {"match_type": "regexp", "metric_names": VALID_FILTERS},
      "exclude": {"match_type": "strict",
                  "metric_names": ["prefix_test_match", "test_contains_match"]}},
     [(n, {}) for n in IN_METRIC_NAMES],
     [n for n in INCLUDE_FILTER_OUT
      if n not in ("prefix_test_match", "test_contains_match")]),
    ("emptyFilterInclude",
     {"include": {"match_type": "strict"}},
     [(n, {}) for n in IN_METRIC_NAMES], IN_METRIC_NAMES),
    ("emptyFilterExclude",
     {"exclude": {"match_type": "strict"}},
     [(n, {}) for n in IN_METRIC_NAMES], IN_METRIC_NAMES),
    ("excludeNilWithResourceAttributes",
     {"exclude": {"match_type": "strict"}},
     RESOURCE_METRICS, ["metric1", "metric2"]),
    ("includeAllWithResourceAttributes",
     {"include": {"match_type": "strict", "metric_names": ["metric1", "metric2"],
                  "resource_attributes": [("attr1", "attr1/val1")]}},
     RESOURCE_METRICS, ["metric1", "metric2"]),
    ("includeAllWithMissingResourceAttributes",
     {"include": {"match_type": "strict",
                  "metric_names": ["metric1", "metric2", "metric3", "metric4"],
                  "resource_attributes": [("attr1", "attr1/val1")]}},
     TWO_RESOURCE_METRICS, ["metric1", "metric2"]),
    ("excludeAllWithMissingResourceAttributes",
     {"exclude": {"match_type": "strict",
                  "resource_attributes": [("attr1", "attr1/val1")]}},
     TWO_RESOURCE_METRICS, ["metric3", "metric4"]),
    ("includeWithRegexResourceAttributes",
     {"include": {"match_type": "regexp", "metric_names": [".*"],
                  "resource_attributes": [("attr1", "attr1/val1")]}},
     TWO_RESOURCE_METRICS, ["metric1", "metric2"]),
    ("includeWithRegexResourceAttributesOnly",
     {"include": {"match_type": "regexp",
                  "resource_attributes": [("attr1", "attr1/val1")]}},
     TWO_RESOURCE_METRICS, ["metric1", "metric2"]),
    ("includeWithStrictResourceAttributes",
     {"include": {"match_type": "strict", "metric_names": ["metric1", "metric2"],
                  "resource_attributes": [("attr1", "attr1/val1")]}},
     TWO_RESOURCE_METRICS, ["metric1", "metric2"]),
    ("includeWithStrictResourceAttributesOnly",
     {"include": {"match_type": "strict",
                  "resource_attributes": [("attr1", "attr1/val1")]}},
     TWO_RESOURCE_METRICS, ["metric1", "metric2"]),
]


@pytest.mark.parametrize("name,cfg,rows,expected", METRIC_CASES,
                         ids=[c[0] for c in METRIC_CASES])
def test_filter_metric_processor(spark, name, cfg, rows, expected):
    from opentelemetry_collector_contrib_spark.processors import (
        FilterMetricsProcessor,
        MetricMatchProperties,
    )

    kwargs = {}
    for side in ("include", "exclude"):
        if side in cfg:
            kwargs[side] = MetricMatchProperties(**cfg[side])
    out = FilterMetricsProcessor(**kwargs)(_metric_df(spark, rows))
    got = sorted(r.metric_name for r in out.collect())
    assert got == sorted(expected), name


# --- traces signal: standardTraceTests (traces_test.go:24-160) ----------------

REDIS_SPANS = [
    # (span_name, scope_name, scope_version, attributes, resource)
    ("test!", "otel", "11", {"db.type": "redis"}, {}),
    ("test!", "otel", "11", {}, {}),
]
NAME_SPANS = [
    ("test!", "otel", "11", {}, {"service.name": "keep"}),
    ("test!", "otel", "11", {}, {"service.name": "dont_keep"}),
    ("test!", "otel", "11", {}, {"service.name": "keep"}),
]

SPAN_SCHEMA = ("span_name string, scope_name string, scope_version string, "
               "attributes map<string,string>, resource map<string,string>")


@pytest.mark.parametrize("name,inc,exc,rows,expected", [
    ("filterRedis", None,
     {"attributes": [("db.type", "redis")]}, REDIS_SPANS, 1),
    ("keepRedis",
     {"attributes": [("db.type", "redis")]}, None, REDIS_SPANS, 1),
    ("keepServiceName",
     {"services": ["keep"]}, None, NAME_SPANS, 2),
], ids=["filterRedis", "keepRedis", "keepServiceName"])
def test_filter_trace_processor(spark, name, inc, exc, rows, expected):
    from opentelemetry_collector_contrib_spark.processors import (
        FilterSpansProcessor,
        SpanMatchProperties,
    )

    df = spark.createDataFrame(rows, SPAN_SCHEMA)
    proc = FilterSpansProcessor(
        include=SpanMatchProperties(**inc) if inc else None,
        exclude=SpanMatchProperties(**exc) if exc else None,
    )
    assert proc(df).count() == expected, name


def test_filter_trace_ottl_conditions(spark):
    # TestFilterTraceProcessorWithOTTL "drop spans": name = "operationA"
    rows = [("operationA", "otel", "1", {}, {}),
            ("operationB", "otel", "1", {}, {})]
    from opentelemetry_collector_contrib_spark.processors import (
        FilterSpansProcessor,
    )

    df = spark.createDataFrame(rows, SPAN_SCHEMA)
    out = FilterSpansProcessor(conditions=["span_name = 'operationA'"])(df)
    assert [r.span_name for r in out.collect()] == ["operationB"]


def test_filter_trace_library_match(spark):
    rows = [("s", "otel", "11", {}, {}), ("s", "other", "11", {}, {})]
    from opentelemetry_collector_contrib_spark.processors import (
        FilterSpansProcessor,
        SpanMatchProperties,
    )

    df = spark.createDataFrame(rows, SPAN_SCHEMA)
    out = FilterSpansProcessor(
        include=SpanMatchProperties(libraries=[("otel", "11")])
    )(df)
    assert out.count() == 1
