"""ANSI-mode oracle sweep over every registered query.

Driver sessions run Spark 4 defaults (``spark.sql.ansi.enabled=true``)
while the package's own test session pins ANSI off (``pkg/session.py``),
so an expression that is fine in tests can throw at the driver gate
(round 3's ``delta_to_cumulative_expo``: ``element_at`` on an empty
array). This sweep closes that blind spot permanently: it runs ALL
``queries()`` entries under an ANSI-on session, MATERIALIZES values
(``toPandas`` — a bare ``count()`` prunes the failing projection and
proves nothing), and value-compares against the DuckDB ``oracle_sql()``
twin with the driver's own canonicalization (sorted columns, sorted
rows, stringified cells).

Usage::

    python tools/ansi_sweep.py [sf_dir] [--only name1,name2] [--no-oracle]

Exit code 0 iff every query materializes and (unless --no-oracle)
matches its oracle. Prints one status line per query and a JSON summary.
"""

from __future__ import annotations

import json
import math
import sys
import time

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def _canon(rows, cols):
    """Driver-style canonical form: sort columns by name, stringify
    cells (floats rounded to 6 significant-ish decimals), sort rows."""
    order = sorted(range(len(cols)), key=lambda i: cols[i])

    def cell(v):
        if v is None:
            return ""
        # pandas nulls: toPandas() yields NaT for null timestamps and
        # NaN for null floats, DuckDB yields None — normalize all to ""
        if v.__class__.__name__ == "NaTType":
            return ""
        if isinstance(v, float):
            if math.isnan(v):
                return ""
            return f"{v:.6g}"
        if isinstance(v, bytes):
            return v.hex()
        if isinstance(v, (list, tuple)):
            return "[" + ",".join(cell(x) for x in v) + "]"
        if isinstance(v, dict):
            return "{" + ",".join(f"{k}={cell(v[k])}" for k in sorted(v)) + "}"
        return str(v)

    return sorted(tuple(cell(r[i]) for i in order) for r in rows)


def main() -> int:
    sf_dir = "/root/testdata/sf0.01"
    only = None
    use_oracle = True
    args = sys.argv[1:]
    while args:
        a = args.pop(0)
        if a == "--only":
            only = set(args.pop(0).split(","))
        elif a == "--no-oracle":
            use_oracle = False
        else:
            sf_dir = a

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[16]")
        .config("spark.sql.shuffle.partitions", "16")
        .config("spark.sql.ansi.enabled", "true")  # the whole point
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.driver.memory", "8g")
        .appName("ansi-sweep")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    import duckdb

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    sys.path.insert(0, "/root/repo")
    import __spark_entry__ as entry

    qs = entry.queries()
    oracles = entry.oracle_sql()

    results = {}
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            df = fn(spark, sf_dir)
            pdf = df.toPandas()  # value materialization — ANSI throws surface here
            spark_rows = _canon(pdf.itertuples(index=False, name=None), list(pdf.columns))
        except Exception as exc:  # noqa: BLE001 - report, don't mask
            results[name] = {"status": "SPARK_ERROR", "err": str(exc)[:400]}
            failures.append(name)
            print(f"FAIL  {name}: {str(exc).splitlines()[0][:160]}")
            continue
        status = "MATERIALIZED"
        if use_oracle and name in oracles:
            try:
                cur = con.execute(oracles[name])
                cols = [d[0] for d in cur.description]
                orows = _canon(cur.fetchall(), cols)
                status = "MATCH" if spark_rows == orows else "MISMATCH"
            except Exception as exc:  # noqa: BLE001
                status = "ORACLE_ERROR"
                results[name] = {"status": status, "err": str(exc)[:400]}
                failures.append(name)
                print(f"FAIL  {name}: oracle: {str(exc).splitlines()[0][:160]}")
                continue
            if status == "MISMATCH":
                failures.append(name)
        results[name] = {
            "status": status,
            "rows": len(spark_rows),
            "sec": round(time.time() - t0, 2),
        }
        print(f"{'ok   ' if status in ('MATCH', 'MATERIALIZED') else 'FAIL '}"
              f"{name}: {status} rows={len(spark_rows)} {results[name]['sec']}s")

    n_fail = len(failures)
    print(json.dumps({"queries": len(results), "failures": failures}))
    spark.stop()
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
