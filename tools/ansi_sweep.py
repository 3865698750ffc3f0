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
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from canonical import make_cell  # noqa: E402 - shared gate canonicalizer

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()

# this gate's historical strictness: 6 significant digits, NaN -> ""
# (pandas nulls arrive as NaN where DuckDB yields None)
_cell = make_cell(sig=6, nan_repr="")


def _canon(rows, cols):
    """Driver-style canonical form: sort columns by name, stringify
    cells (shared tools/canonical.py rules), sort rows."""
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(_cell(r[i]) for i in order) for r in rows)


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
    missing = [t for t in TABLES if not Path(f"{sf_dir}/{t}.parquet").exists()]
    if missing:
        raise SystemExit(
            f"ansi_sweep: {sf_dir} is missing parquet tables {missing} — "
            "every oracle view must exist before the sweep can claim a gate"
        )
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    import __spark_entry__ as entry

    qs = entry.queries()
    oracles = entry.oracle_sql()
    if only:
        unknown = only - set(qs)
        if unknown:
            # a typo'd --only must not pass as a 0-query green sweep
            raise SystemExit(
                f"ansi_sweep: unknown query names in --only: {sorted(unknown)}"
            )

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
