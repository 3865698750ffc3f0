"""Local replica of the driver's correctness gate.

Runs every ``__spark_entry__.queries()`` entry at a given SF dir and
compares row count + sorted-column value multiset against the matching
``oracle_sql()`` via DuckDB. Usage:

    python tools/check_contract.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys
from pathlib import Path

import duckdb

sys.path.insert(0, str(Path(__file__).resolve().parent))
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


# this gate's historical strictness: 9 significant digits, NaN kept
# visible; structural rules shared with ansi_sweep (tools/canonical.py)
from canonical import make_cell  # noqa: E402

canon = make_cell(sig=9, nan_repr="NaN")


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    import __spark_entry__ as e
    from opentelemetry_collector_contrib_spark.session import get_spark

    spark = get_spark(app_name="contract-check")
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if Path(p).exists():
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

    qs, oracles = e.queries(), e.oracle_sql()
    if only:
        unknown = only - set(qs)
        if unknown:
            # a typo'd query list must not pass as a 0-query green gate
            raise SystemExit(
                f"check_contract: unknown query names: {sorted(unknown)}"
            )
    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        sdf = fn(spark, sf_dir)
        cols = sorted(sdf.columns)
        srows = sdf.select(*cols).collect()
        sset = sorted(tuple(canon(v) for v in r) for r in srows)
        if name not in oracles:
            print(f"{name:28s} rows={len(srows):6d}  (no oracle: rows-only)")
            continue
        ocur = con.sql(oracles[name])
        ocols = sorted(ocur.columns)
        orows = ocur.fetchall()
        omap = {c: i for i, c in enumerate(ocur.columns)}
        oset = sorted(
            tuple(canon(r[omap[c]]) for c in ocols) for r in orows
        )
        if cols != ocols:
            print(f"{name:28s} SCHEMA MISMATCH spark={cols} duck={ocols}")
            failures += 1
        elif sset != oset:
            print(f"{name:28s} VALUE MISMATCH rows {len(sset)} vs {len(oset)}")
            oset_s, sset_s = set(oset), set(sset)
            diff_s = [r for r in sset if r not in oset_s][:3]
            diff_o = [r for r in oset if r not in sset_s][:3]
            print("  spark-only:", diff_s)
            print("  duck-only :", diff_o)
            failures += 1
        else:
            print(f"{name:28s} OK rows={len(sset):6d}")
    spark.stop()
    print("FAILURES:", failures)
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
