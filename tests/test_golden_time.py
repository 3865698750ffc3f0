"""Verbatim port of the time parser's reference layout table.

Reference: pkg/stanza/operator/parser/time/parser_test.go:142-270
(TestTimeParser — 13 real-world layouts, each in BOTH gotime and
strptime form) and :272-470 (TestTimeEpochs). Directive translation
follows internal/coreinternal/timeutils/internal/ctimefmt/
ctimefmt.go:23-62. Spark timestamps are microsecond-precision, so
nanosecond samples (k8s) truncate their last three digits — the one
documented deviation.
"""

from __future__ import annotations

from datetime import datetime, timezone

import pytest

from opentelemetry_collector_contrib_spark.operators.parsers import TimeParser


def utc(y, mo, d, h, mi, s, us=0):
    return datetime(y, mo, d, h, mi, s, us)


# (name, sample, expected UTC instant, gotime layout, strptime layout)
# expected instants are the reference's expected values converted to
# UTC (MST = -07:00, HST = -10:00; Local pins to the session's UTC)
CASES = [
    ("unix-utc", "Mon Jan 2 15:04:05 UTC 2006", utc(2006, 1, 2, 15, 4, 5),
     "Mon Jan 2 15:04:05 MST 2006", "%a %b %e %H:%M:%S %Z %Y"),
    ("unix-mst", "Mon Jan 2 15:04:05 MST 2006", utc(2006, 1, 2, 22, 4, 5),
     "Mon Jan 2 15:04:05 MST 2006", "%a %b %e %H:%M:%S %Z %Y"),
    ("unix-hst", "Mon Jan 2 15:04:05 HST 2006", utc(2006, 1, 3, 1, 4, 5),
     "Mon Jan 2 15:04:05 MST 2006", "%a %b %e %H:%M:%S %Z %Y"),
    ("almost-unix", "Mon Jan 02 15:04:05 MST 2006", utc(2006, 1, 2, 22, 4, 5),
     "Mon Jan 02 15:04:05 MST 2006", "%a %b %d %H:%M:%S %Z %Y"),
    ("opendistro", "2020-06-09T15:39:58", utc(2020, 6, 9, 15, 39, 58),
     "2006-01-02T15:04:05", "%Y-%m-%dT%H:%M:%S"),
    ("postgres", "2019-11-05 10:38:35.118 HST",
     utc(2019, 11, 5, 20, 38, 35, 118000),
     "2006-01-02 15:04:05.999 MST", "%Y-%m-%d %H:%M:%S.%L %Z"),
    ("ibm-mq", "3/4/2018 11:52:29", utc(2018, 3, 4, 11, 52, 29),
     "1/2/2006 15:04:05", "%q/%g/%Y %H:%M:%S"),
    ("cassandra", "2019-11-27T09:34:32.901-1000",
     utc(2019, 11, 27, 19, 34, 32, 901000),
     "2006-01-02T15:04:05.999-0700", "%Y-%m-%dT%H:%M:%S.%L%z"),
    ("oracle", "2019-10-15T10:42:01.900436-10:00",
     utc(2019, 10, 15, 20, 42, 1, 900436),
     "2006-01-02T15:04:05.999999-07:00", "%Y-%m-%dT%H:%M:%S.%f%j"),
    ("oracle-listener", "22-JUL-2019 15:16:13", utc(2019, 7, 22, 15, 16, 13),
     "02-Jan-2006 15:04:05", "%d-%b-%Y %H:%M:%S"),
    ("k8s", "2019-03-08T18:41:12.152531115Z",
     utc(2019, 3, 8, 18, 41, 12, 152531),  # ns -> us truncation
     "2006-01-02T15:04:05.999999999Z", "%Y-%m-%dT%H:%M:%S.%sZ"),
    ("jetty", "05/Aug/2019:20:38:46 +0000", utc(2019, 8, 5, 20, 38, 46),
     "02/Jan/2006:15:04:05 -0700", "%d/%b/%Y:%H:%M:%S %z"),
    ("esxi", "2020-12-16T21:43:28.391Z", utc(2020, 12, 16, 21, 43, 28, 391000),
     "2006-01-02T15:04:05.999Z", "%Y-%m-%dT%H:%M:%S.%LZ"),
]


@pytest.mark.parametrize(
    "name,sample,expected,gotime,strptime", CASES, ids=[c[0] for c in CASES]
)
def test_time_parser_case(spark, name, sample, expected, gotime, strptime):
    df = spark.createDataFrame([(sample,)], "body string")
    for layout_type, layout in (("gotime", gotime), ("strptime", strptime)):
        got = TimeParser(layout=layout, layout_type=layout_type)(df).collect()[0].ts
        assert got == expected, (name, layout_type, got)
        # non-root field (someField in the reference table)
        df2 = spark.createDataFrame([(sample,)], "some_field string")
        got2 = TimeParser(
            layout=layout, layout_type=layout_type, parse_from="some_field"
        )(df2).collect()[0].ts
        assert got2 == expected, (name, layout_type, "non-root")


EPOCH_CASES = [
    ("s", "1136214245", utc(2006, 1, 2, 15, 4, 5)),
    ("ms", "1136214245123", utc(2006, 1, 2, 15, 4, 5, 123000)),
    ("us", "1136214245123456", utc(2006, 1, 2, 15, 4, 5, 123456)),
    # ns -> us truncation
    ("ns", "1136214245123456789", utc(2006, 1, 2, 15, 4, 5, 123456)),
]


@pytest.mark.parametrize("layout,sample,expected", EPOCH_CASES,
                         ids=[c[0] for c in EPOCH_CASES])
def test_time_epochs(spark, layout, sample, expected):
    df = spark.createDataFrame([(sample,)], "body string")
    got = TimeParser(layout=layout, layout_type="epoch")(df).collect()[0].ts
    assert got == expected
    # int-typed sample parses identically (valueAsString twin)
    df2 = spark.createDataFrame([(int(sample),)], "body long")
    got2 = TimeParser(layout=layout, layout_type="epoch")(df2).collect()[0].ts
    assert got2 == expected
