from __future__ import annotations

import os

import pytest

from opentelemetry_collector_contrib_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="tests", master="local[8]")
    yield s


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR


@pytest.fixture(scope="session")
def duck(sf_dir):
    import duckdb

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def assert_frames_equal(spark_df, duck_rel, sort_cols=None, float_cols=(), tol=1e-9):
    """Order-insensitive comparison of a Spark DataFrame vs a DuckDB relation."""
    import math

    spk = spark_df.toPandas()
    dck = duck_rel.df()
    assert sorted(spk.columns) == sorted(dck.columns), (
        f"columns differ: {sorted(spk.columns)} vs {sorted(dck.columns)}"
    )
    cols = sorted(spk.columns)
    spk = spk[cols]
    dck = dck[cols]
    sort_cols = sort_cols or cols
    s_rows = sorted(
        spk.itertuples(index=False, name=None),
        key=lambda r: tuple(str(x) for x in r),
    )
    d_rows = sorted(
        dck.itertuples(index=False, name=None),
        key=lambda r: tuple(str(x) for x in r),
    )
    assert len(s_rows) == len(d_rows), f"row counts differ: {len(s_rows)} vs {len(d_rows)}"
    float_idx = {cols.index(c) for c in float_cols}
    for i, (sr, dr) in enumerate(zip(s_rows, d_rows)):
        for j, (a, b) in enumerate(zip(sr, dr)):
            if j in float_idx:
                if a is None and (b is None or (isinstance(b, float) and math.isnan(b))):
                    continue
                assert abs(float(a) - float(b)) <= tol * max(1.0, abs(float(b))), (
                    f"row {i} col {cols[j]}: {a} != {b}\nspark={sr}\nduck={dr}"
                )
            else:
                assert str(a) == str(b), (
                    f"row {i} col {cols[j]}: {a!r} != {b!r}\nspark={sr}\nduck={dr}"
                )
