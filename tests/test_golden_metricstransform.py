"""metricstransform processor goldens, transcribed VERBATIM from the
reference's table-driven corpus:
processor/metricstransformprocessor/metrics_transform_processor_testcases_test.go
(standardTests, lines cited per case).

The reference metric plane is pdata metrics with datapoints; here it is
the long frame (metric_name, value double, labels map, value_type) —
one row per NUMBER datapoint. Cases whose metrics carry no datapoints
get one int datapoint (value 1, no labels) added to both sides: the
case still exercises exactly the name-matching/rename semantics it was
written for. Histogram/exponential-histogram cases are out of the
number-point plane and are not ported. Timestamps are uniform in the
ported cases, so the reference's (attrs, ts) grouping key reduces to
the label set.
"""

from __future__ import annotations

import pytest

from opentelemetry_collector_contrib_spark.processors.metrics_transform import (
    MetricOp,
    MetricsTransform,
    MetricTransform,
)

SCHEMA = "metric_name string, value double, labels map<string,string>, value_type string"
SCHEMA_TYPED = SCHEMA + ", metric_type string, unit string"


def i(name, val, labels=None):  # int datapoint row
    return (name, float(val), labels or {}, "int")


def d(name, val, labels=None):  # double datapoint row
    return (name, float(val), labels or {}, "double")


def run(spark, transforms, rows, schema=SCHEMA):
    df = spark.createDataFrame(rows, schema)
    out = MetricsTransform(transforms, type_col="value_type")(df)
    extra = [c for c in out.columns if c in ("metric_type", "unit")]
    return sorted(
        (
            r.metric_name,
            r.value,
            tuple(sorted(r.labels.items())),
            r.value_type,
            *[r[c] for c in extra],
        )
        for r in out.collect()
    )


def canon(rows):
    return sorted(
        (n, float(v), tuple(sorted((l or {}).items())), t, *rest)
        for n, v, l, t, *rest in rows
    )


# --- UPDATE (testcases_test.go:22-673) -------------------------------------


def test_metric_name_update(spark):
    """testcases_test.go:24-38"""
    got = run(
        spark,
        [MetricTransform(include="metric1", action="update", new_name="new/metric1")],
        [i("metric1", 1)],
    )
    assert got == canon([i("new/metric1", 1)])


def test_metric_name_update_chained(spark):
    """testcases_test.go:40-61"""
    got = run(
        spark,
        [
            MetricTransform(include="metric1", action="update", new_name="new/metric1"),
            MetricTransform(include="metric2", action="update", new_name="new/metric2"),
        ],
        [i("metric1", 1), i("metric2", 2)],
    )
    assert got == canon([i("new/metric1", 1), i("new/metric2", 2)])


def test_metric_names_update_chained_regexp_expansion(spark):
    """testcases_test.go:63-86 — $1 / $namedsubmatch expansion in new_name"""
    got = run(
        spark,
        [
            MetricTransform(
                include="^(metric)(?P<namedsubmatch>[12])$",
                match_type="regexp",
                action="update",
                new_name="new/$1/$namedsubmatch",
            ),
            MetricTransform(
                include="new/metric/1", action="update", new_name="new/new/metric1"
            ),
        ],
        [i("metric1", 1), i("metric2", 2), i("metric3", 3)],
    )
    assert got == canon(
        [i("new/new/metric1", 1), i("new/metric/2", 2), i("metric3", 3)]
    )


def test_metric_name_update_nonexist(spark):
    """testcases_test.go:88-102"""
    got = run(
        spark,
        [MetricTransform(include="nonexist", action="update", new_name="new/metric1")],
        [i("metric1", 1)],
    )
    assert got == canon([i("metric1", 1)])


def test_metric_label_update(spark):
    """testcases_test.go:104-128"""
    got = run(
        spark,
        [
            MetricTransform(
                include="metric1",
                action="update",
                operations=[
                    MetricOp(action="update_label", label="label1", new_label="new/label1")
                ],
            )
        ],
        [i("metric1", 3, {"label1": "value1"})],
    )
    assert got == canon([i("metric1", 3, {"new/label1": "value1"})])


def test_metric_label_value_update(spark):
    """testcases_test.go:130-158"""
    got = run(
        spark,
        [
            MetricTransform(
                include="metric1",
                action="update",
                operations=[
                    MetricOp(
                        action="update_label",
                        label="label1",
                        value_actions={"label1-value1": "new/label1-value1"},
                    )
                ],
            )
        ],
        [
            i("metric1", 3, {"label1": "label1-value1"}),
            i("metric1", 3, {"label1": "label1-value2"}),
        ],
    )
    assert got == canon(
        [
            i("metric1", 3, {"label1": "new/label1-value1"}),
            i("metric1", 3, {"label1": "label1-value2"}),
        ]
    )


def test_metric_label_update_label_and_label_value(spark):
    """testcases_test.go:160-185"""
    got = run(
        spark,
        [
            MetricTransform(
                include="metric1",
                action="update",
                operations=[
                    MetricOp(
                        action="update_label",
                        label="label1",
                        new_label="new/label1",
                        value_actions={"label1-value1": "new/label1-value1"},
                    )
                ],
            )
        ],
        [i("metric1", 3, {"label1": "label1-value1"})],
    )
    assert got == canon([i("metric1", 3, {"new/label1": "new/label1-value1"})])


def test_metric_label_update_with_regexp_filter(spark):
    """testcases_test.go:187-215"""
    got = run(
        spark,
        [
            MetricTransform(
                include="^matched.*$",
                match_type="regexp",
                action="update",
                operations=[
                    MetricOp(
                        action="update_label",
                        label="label1",
                        value_actions={"label1-value1": "new/label1-value1"},
                    )
                ],
            )
        ],
        [
            i("matched-metric1", 3, {"label1": "label1-value1", "label2": "label2-value1"}),
            i("unmatched-metric2", 3, {"label1": "label1-value1", "label2": "label2-value1"}),
        ],
    )
    assert got == canon(
        [
            i("matched-metric1", 3, {"label1": "new/label1-value1", "label2": "label2-value1"}),
            i("unmatched-metric2", 3, {"label1": "label1-value1", "label2": "label2-value1"}),
        ]
    )


AGG_IN_31 = [  # 3 / 1 valued pair, shared label1
    i("metric1", 3, {"label1": "label1-value1", "label2": "label2-value1"}),
    i("metric1", 1, {"label1": "label1-value1", "label2": "label2-value2"}),
]
AGG_IN_132 = [  # 1 / 3 / 2 valued triple
    i("metric1", 1, {"label1": "label1-value1", "label2": "label2-value1"}),
    i("metric1", 3, {"label1": "label1-value1", "label2": "label2-value2"}),
    i("metric1", 2, {"label1": "label1-value1", "label2": "label2-value2"}),
]
AGG_IN_142 = [
    i("metric1", 1, {"label1": "label1-value1", "label2": "label2-value1"}),
    i("metric1", 4, {"label1": "label1-value1", "label2": "label2-value2"}),
    i("metric1", 2, {"label1": "label1-value1", "label2": "label2-value2"}),
]


def _agg_transform(how):
    return MetricTransform(
        include="metric1",
        action="update",
        operations=[
            MetricOp(action="aggregate_labels", aggregation_type=how, label_set=["label1"])
        ],
    )


@pytest.mark.parametrize(
    "how,rows,expect",
    [
        ("sum", AGG_IN_31, 4),    # testcases_test.go:217-243
        ("mean", AGG_IN_31, 2),   # :245-271 — integer mean truncates
        ("max", AGG_IN_132, 3),   # :273-300
        ("count", AGG_IN_142, 3), # :302-329
        ("min", AGG_IN_132, 1),   # :331-358
    ],
)
def test_metric_label_aggregation_int_update(spark, how, rows, expect):
    got = run(spark, [_agg_transform(how)], rows)
    assert got == canon([i("metric1", expect, {"label1": "label1-value1"})])


def test_metric_label_aggregation_mean_double_update(spark):
    """testcases_test.go:388-414"""
    rows = [
        d("metric1", 3, {"label1": "label1-value1", "label2": "label2-value1"}),
        d("metric1", 1, {"label1": "label1-value1", "label2": "label2-value2"}),
    ]
    got = run(spark, [_agg_transform("mean")], rows)
    assert got == canon([d("metric1", 2.0, {"label1": "label1-value1"})])


def test_metric_label_aggregation_insert_sum_with_several_attrs_match(spark):
    """testcases_test.go:504-539 — insert + match_labels + aggregate"""
    rows = [
        d("metric1", 3, {"label0": "label0-value1", "label1": "label1-value1",
                         "label2": "label2-value1", "label3": "label3-value1"}),
        d("metric1", 1, {"label0": "label0-value1", "label1": "label1-value1",
                         "label2": "label2-value1", "label3": "label3-value2"}),
        d("metric1", 1, {"label0": "label0-value2", "label1": "label1-value1",
                         "label2": "label2-value1", "label3": "label3-value1"}),
    ]
    got = run(
        spark,
        [
            MetricTransform(
                include="metric1",
                action="insert",
                new_name="new/metric1",
                match_labels={"label0": "label0-value1"},
                operations=[
                    MetricOp(
                        action="aggregate_labels",
                        aggregation_type="sum",
                        label_set=["label1", "label2"],
                    )
                ],
            )
        ],
        rows,
    )
    assert got == canon(
        rows
        + [d("new/metric1", 4, {"label1": "label1-value1", "label2": "label2-value1"})]
    )


def test_metric_label_values_aggregation_sum_int_update(spark):
    """testcases_test.go:541-575"""
    rows = [
        i("metric1", 3, {"label1": "label1-value1", "label2": "label2-value1"}),
        i("metric1", 1, {"label1": "label1-value1", "label2": "label2-value2"}),
        i("metric1", 1, {"label1": "label1-value1", "label2": "label2-value3"}),
        i("metric1", 4, {"label1": "label1-value1", "label2": "label2-value4"}),
    ]
    got = run(
        spark,
        [
            MetricTransform(
                include="metric1",
                action="update",
                operations=[
                    MetricOp(
                        action="aggregate_label_values",
                        label="label2",
                        new_value="new/label2-value",
                        aggregation_type="sum",
                        aggregated_values=["label2-value1", "label2-value2"],
                    )
                ],
            )
        ],
        rows,
    )
    assert got == canon(
        [
            i("metric1", 4, {"label1": "label1-value1", "label2": "new/label2-value"}),
            i("metric1", 1, {"label1": "label1-value1", "label2": "label2-value3"}),
            i("metric1", 4, {"label1": "label1-value1", "label2": "label2-value4"}),
        ]
    )


def test_metric_label_aggregation_ignored_for_partial_metric_match(spark):
    """testcases_test.go:612-642 — canChangeMetric=false skips aggregate"""
    rows = [
        i("metric1", 3, {"label1": "label1-value1", "label2": "label2-value1"}),
        i("metric1", 1, {"label1": "label1-value2", "label2": "label2-value2"}),
    ]
    got = run(
        spark,
        [
            MetricTransform(
                include="metric1",
                action="update",
                match_labels={"label1": "label1-value1"},
                operations=[
                    MetricOp(
                        action="aggregate_labels",
                        aggregation_type="sum",
                        label_set=["label1"],
                    )
                ],
            )
        ],
        rows,
    )
    assert got == canon(rows)


# --- INSERT (testcases_test.go:673-1100) ------------------------------------


def test_metric_name_insert(spark):
    """testcases_test.go:675-690"""
    got = run(
        spark,
        [MetricTransform(include="metric1", action="insert", new_name="new/metric1")],
        [i("metric1", 1)],
    )
    assert got == canon([i("metric1", 1), i("new/metric1", 1)])


def test_metric_name_insert_multiple(spark):
    """testcases_test.go:692-715"""
    got = run(
        spark,
        [
            MetricTransform(include="metric1", action="insert", new_name="new/metric1"),
            MetricTransform(include="metric2", action="insert", new_name="new/metric2"),
        ],
        [i("metric1", 1), i("metric2", 2)],
    )
    assert got == canon(
        [i("metric1", 1), i("metric2", 2), i("new/metric1", 1), i("new/metric2", 2)]
    )


def _insert_match_label_case(spark, match_type, matchers, rows, expect_clone):
    got = run(
        spark,
        [
            MetricTransform(
                include="metric1",
                match_type=match_type,
                action="insert",
                new_name="new/metric1",
                match_labels=matchers,
            )
        ],
        rows,
    )
    clones = [
        (name.replace("metric1", "new/metric1", 1) if name == "metric1" else name, v, l, t)
        for name, v, l, t in expect_clone
    ]
    assert got == canon(rows + clones)


def test_insert_with_match_label_strict(spark):
    """testcases_test.go:717-736"""
    rows = [i("metric1", 2, {"label1": "value1", "label2": "value2"})]
    _insert_match_label_case(spark, "strict", {"label1": "value1"}, rows, rows)


def test_insert_with_match_label_regexp(spark):
    """testcases_test.go:738-757 — (.|\\s)*\\S(.|\\s)* matches any non-blank"""
    rows = [i("metric1", 3, {"label1": "value1", "label2": "value2"})]
    _insert_match_label_case(
        spark, "regexp", {"label1": r"(.|\s)*\S(.|\s)*"}, rows, rows
    )


def test_insert_with_match_label_regexp_two_datapoints_positive(spark):
    """testcases_test.go:759-780 — only the matching datapoint is cloned"""
    rows = [
        i("metric1", 3, {"label1": "value1", "label2": "value2"}),
        i("metric1", 3, {"label1": "value3", "label2": "value4"}),
    ]
    _insert_match_label_case(
        spark, "regexp", {"label1": "value3"}, rows, [rows[1]]
    )


def test_insert_with_match_label_regexp_two_datapoints_negative(spark):
    """testcases_test.go:782-801"""
    rows = [
        i("metric1", 3, {"label1": "value1", "label2": "value2"}),
        i("metric1", 3, {"label1": "value11", "label2": "value22"}),
    ]
    # value11 contains no "value3" substring -> nothing cloned
    _insert_match_label_case(spark, "regexp", {"label1": "value3"}, rows, [])


def test_insert_with_match_label_strict_negative(spark):
    """testcases_test.go:824-841"""
    rows = [i("metric1", 3, {"label1": "value1", "label2": "value2"})]
    _insert_match_label_case(spark, "strict", {"label1": "wrong_value"}, rows, [])


def test_insert_with_match_label_strict_missing_key(spark):
    """testcases_test.go:862-879"""
    rows = [i("metric1", 3, {"label1": "value1", "label2": "value2"})]
    _insert_match_label_case(spark, "strict", {"missing_key": "value1"}, rows, [])


def test_insert_with_match_label_regexp_missing_key(spark):
    """testcases_test.go:881-898"""
    rows = [i("metric1", 3, {"label1": "value1", "label2": "value2"})]
    _insert_match_label_case(spark, "regexp", {"missing_key": "value1"}, rows, [])


def test_insert_with_match_label_regexp_missing_key_with_empty_expression(spark):
    """testcases_test.go:920-940 — ^$ on a missing key matches"""
    rows = [i("metric1", 3, {"label1": "value1", "label2": "value2"})]
    _insert_match_label_case(
        spark, "regexp", {"label1": "value1", "missing_key": "^$"}, rows, rows
    )


def test_metric_label_update_with_metric_insert(spark):
    """testcases_test.go:942-969"""
    rows = [i("metric1", 3, {"label1": "value1", "label2": "value2"})]
    got = run(
        spark,
        [
            MetricTransform(
                include="metric1",
                action="insert",
                new_name="new/metric1",
                operations=[
                    MetricOp(action="update_label", label="label1", new_label="new/label1")
                ],
            )
        ],
        rows,
    )
    assert got == canon(
        rows + [i("new/metric1", 3, {"new/label1": "value1", "label2": "value2"})]
    )


def test_metric_label_value_update_with_metric_insert(spark):
    """testcases_test.go:971-1001"""
    rows = [
        i("metric1", 3, {"label1": "label1-value1"}),
        i("metric1", 4, {"label1": "label1-value2"}),
    ]
    got = run(
        spark,
        [
            MetricTransform(
                include="metric1",
                action="insert",
                new_name="new/metric1",
                operations=[
                    MetricOp(
                        action="update_label",
                        label="label1",
                        value_actions={"label1-value1": "new/label1-value1"},
                    )
                ],
            )
        ],
        rows,
    )
    assert got == canon(
        rows
        + [
            i("new/metric1", 3, {"label1": "new/label1-value1"}),
            i("new/metric1", 4, {"label1": "label1-value2"}),
        ]
    )


def test_metric_label_aggregation_sum_int_insert(spark):
    """testcases_test.go:1003-1032 — insert without new_name keeps the name"""
    got = run(
        spark,
        [
            MetricTransform(
                include="metric1",
                action="insert",
                operations=[
                    MetricOp(
                        action="aggregate_labels",
                        aggregation_type="sum",
                        label_set=["label1"],
                    )
                ],
            )
        ],
        AGG_IN_31,
    )
    assert got == canon(AGG_IN_31 + [i("metric1", 4, {"label1": "label1-value1"})])


def test_metric_label_values_aggregation_sum_int_insert(spark):
    """testcases_test.go:1034-1064"""
    rows = [
        i("metric1", 3, {"label1": "label1-value1", "label2": "label2-value1"}),
        i("metric1", 1, {"label1": "label1-value1", "label2": "label2-value2"}),
    ]
    got = run(
        spark,
        [
            MetricTransform(
                include="metric1",
                action="insert",
                operations=[
                    MetricOp(
                        action="aggregate_label_values",
                        label="label2",
                        new_value="new/label2-value",
                        aggregation_type="sum",
                        aggregated_values=["label2-value1", "label2-value2"],
                    )
                ],
            )
        ],
        rows,
    )
    assert got == canon(
        rows
        + [i("metric1", 4, {"label1": "label1-value1", "label2": "new/label2-value"})]
    )


# --- COMBINE (testcases_test.go:1100-1327) ----------------------------------


def test_combine(spark):
    """testcases_test.go:1102-1122 — capture groups become labels, lower"""
    got = run(
        spark,
        [
            MetricTransform(
                include="^([mM]etric)(?P<namedsubmatch>[12])$",
                match_type="regexp",
                action="combine",
                new_name="new",
                submatch_case="lower",
            )
        ],
        [i("Metric1", 1), i("metric2", 2), i("metric3", 3)],
    )
    assert got == canon(
        [
            i("metric3", 3),
            i("new", 1, {"$1": "metric", "namedsubmatch": "1"}),
            i("new", 2, {"$1": "metric", "namedsubmatch": "2"}),
        ]
    )


def test_combine_no_matches(spark):
    """testcases_test.go:1124-1142"""
    rows = [i("metric1", 1), i("metric2", 2), i("metric3", 3)]
    got = run(
        spark,
        [
            MetricTransform(
                include="^X(metric)(?P<namedsubmatch>[12])$",
                match_type="regexp",
                action="combine",
                new_name="new",
            )
        ],
        rows,
    )
    assert got == canon(rows)


def test_combine_single_match(spark):
    """testcases_test.go:1144-1163 — upper submatch case"""
    got = run(
        spark,
        [
            MetricTransform(
                include="^([mM]etric)(?P<namedsubmatch>[1])$",
                match_type="regexp",
                action="combine",
                new_name="new",
                submatch_case="upper",
            )
        ],
        [i("Metric1", 1), i("metric2", 2), i("metric3", 3)],
    )
    assert got == canon(
        [
            i("metric2", 2),
            i("metric3", 3),
            i("new", 1, {"$1": "METRIC", "namedsubmatch": "1"}),
        ]
    )


def test_combine_aggregate(spark):
    """testcases_test.go:1165-1183 — no captures: points merge by label set"""
    got = run(
        spark,
        [
            MetricTransform(
                include="^metric[12]$",
                match_type="regexp",
                action="combine",
                new_name="new",
                aggregation_type="sum",
            )
        ],
        [i("metric1", 1), i("metric2", 2), i("metric3", 3)],
    )
    assert got == canon([i("metric3", 3), i("new", 3)])


def test_combine_with_operations(spark):
    """testcases_test.go:1185-1220"""
    got = run(
        spark,
        [
            MetricTransform(
                include="^(metric)(?P<namedsubmatch>[12])$",
                match_type="regexp",
                action="combine",
                new_name="new",
                operations=[
                    MetricOp(action="add_label", label="new_label", new_value="new_label_value"),
                    MetricOp(
                        action="aggregate_labels",
                        aggregation_type="sum",
                        label_set=["$1", "new_label"],
                    ),
                ],
            )
        ],
        [i("metric1", 1), i("metric2", 2), i("metric3", 3)],
    )
    assert got == canon(
        [
            i("metric3", 3),
            i("new", 3, {"$1": "metric", "new_label": "new_label_value"}),
        ]
    )


def test_combine_error_type(spark):
    """testcases_test.go:1241-1260 — gauge+sum cannot combine: no-op"""
    rows = [
        ("metric1", 1.0, {}, "int", "gauge", ""),
        ("metric2", 2.0, {}, "int", "sum", ""),
        ("metric3", 3.0, {}, "int", "gauge", ""),
    ]
    got = run(
        spark,
        [
            MetricTransform(
                include="^metric[12]$",
                match_type="regexp",
                action="combine",
                new_name="new",
                aggregation_type="sum",
            )
        ],
        rows,
        schema=SCHEMA_TYPED,
    )
    assert got == canon(rows)


def test_combine_error_units(spark):
    """testcases_test.go:1262-1281 — differing units: no-op"""
    rows = [
        ("metric1", 1.0, {}, "int", "gauge", "s"),
        ("metric2", 2.0, {}, "int", "gauge", "ms"),
        ("metric3", 3.0, {}, "int", "gauge", ""),
    ]
    got = run(
        spark,
        [
            MetricTransform(
                include="^metric[12]$",
                match_type="regexp",
                action="combine",
                new_name="new",
                aggregation_type="sum",
            )
        ],
        rows,
        schema=SCHEMA_TYPED,
    )
    assert got == canon(rows)


def test_combine_error_labels(spark):
    """testcases_test.go:1283-1326 — differing label keysets: no-op"""
    rows = [
        i("metric1", 1, {"a": "1", "b": "2"}),
        i("metric2", 2, {"a": "1", "c": "3"}),
        i("metric3", 3),
    ]
    got = run(
        spark,
        [
            MetricTransform(
                include="^metric[12]$",
                match_type="regexp",
                action="combine",
                new_name="new",
                aggregation_type="sum",
            )
        ],
        rows,
    )
    assert got == canon(rows)


# --- TOGGLE / SCALE (testcases_test.go:1327-1645) ---------------------------


def test_toggle_scalar_data_type_int64_to_double(spark):
    """testcases_test.go:1328-1361"""
    got = run(
        spark,
        [
            MetricTransform(
                include="metric1",
                action="update",
                operations=[MetricOp(action="toggle_scalar_data_type")],
            ),
            MetricTransform(
                include="metric2",
                action="update",
                operations=[MetricOp(action="toggle_scalar_data_type")],
            ),
        ],
        [i("metric1", 1), i("metric2", 1)],
    )
    assert got == canon([d("metric1", 1), d("metric2", 1)])


def test_toggle_scalar_data_type_double_to_int64(spark):
    """testcases_test.go:1363-1396 — truncates toward zero"""
    got = run(
        spark,
        [
            MetricTransform(
                include="metric1",
                action="update",
                operations=[MetricOp(action="toggle_scalar_data_type")],
            ),
        ],
        [d("metric1", 1.7)],
    )
    assert got == canon([i("metric1", 1)])


def test_experimental_scale_value_int64(spark):
    """testcases_test.go:1423-1458"""
    got = run(
        spark,
        [
            MetricTransform(
                include="metric1",
                action="update",
                operations=[MetricOp(action="experimental_scale_value", scale=100)],
            ),
            MetricTransform(
                include="metric2",
                action="update",
                operations=[MetricOp(action="experimental_scale_value", scale=10)],
            ),
        ],
        [i("metric1", 1), i("metric2", 3)],
    )
    assert got == canon([i("metric1", 100), i("metric2", 30)])


def test_experimental_scale_value_double(spark):
    """testcases_test.go:1460-1495"""
    got = run(
        spark,
        [
            MetricTransform(
                include="metric1",
                action="update",
                operations=[MetricOp(action="experimental_scale_value", scale=100)],
            ),
            MetricTransform(
                include="metric2",
                action="update",
                operations=[MetricOp(action="experimental_scale_value", scale=0.1)],
            ),
        ],
        [d("metric1", 1), d("metric2", 300)],
    )
    # same IEEE double arithmetic as the Go processor
    assert got == canon([d("metric1", 100.0), d("metric2", 300 * 0.1)])


def test_experimental_scale_with_attr_filtering(spark):
    """testcases_test.go:1579-1604 (number-point slice of the case):
    only the matching datapoint scales; the other stays int-typed"""
    got = run(
        spark,
        [
            MetricTransform(
                include="metric1",
                action="update",
                match_labels={"label1": "value1"},
                operations=[MetricOp(action="experimental_scale_value", scale=100)],
            )
        ],
        [
            i("metric1", 1, {"label1": "value1"}),
            i("metric1", 3, {"label1": "value2"}),
        ],
    )
    assert got == canon(
        [
            i("metric1", 100, {"label1": "value1"}),
            i("metric1", 3, {"label1": "value2"}),
        ]
    )


# --- ADD LABEL (testcases_test.go:1645-1699) --------------------------------


@pytest.mark.parametrize(
    "labels,expect_labels",
    [
        ({}, {"foo": "bar"}),  # :1646-1668
        (
            {"label1": "value1", "label2": "value2"},
            {"label1": "value1", "label2": "value2", "foo": "bar"},
        ),  # :1670-1694
    ],
)
def test_update_existing_metric_by_adding_a_new_label(spark, labels, expect_labels):
    got = run(
        spark,
        [
            MetricTransform(
                include="metric1",
                action="update",
                operations=[MetricOp(action="add_label", label="foo", new_value="bar")],
            )
        ],
        [i("metric1", 3, labels)],
    )
    assert got == canon([i("metric1", 3, expect_labels)])
