#!/usr/bin/env python
"""Driver-gate pre-flight: run registry queries AND their DuckDB oracles
side-by-side and compare row counts + sorted-column values — a local
replica of the correctness harness.

Usage:
    python tools/preflight.py                 # every registry query
    python tools/preflight.py name1 name2     # just these
    python tools/preflight.py --sf /root/testdata/sf0.1 --graded-window 50

Comparison discipline mirrors the driver: columns sorted by name, rows
sorted, values normalized (floats rounded, NaN→NULL, timestamps → str).
Exit code = number of failures.
"""

from __future__ import annotations

import math
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)


def norm(v):
    import datetime
    import decimal

    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return None
        return round(v, 9)
    if isinstance(v, decimal.Decimal):
        return round(float(v), 9)
    if isinstance(v, (datetime.datetime, datetime.date)):
        return str(v)
    return v


def _sort_key(row: tuple):
    """None-safe, mixed-type-safe total order for row multiset compare."""
    return tuple((v is None, str(type(v)), str(v)) for v in row)


def main() -> int:
    args = sys.argv[1:]
    sf = "/root/testdata/sf0.01"
    window = None
    if "--sf" in args:
        i = args.index("--sf")
        sf = args[i + 1]
        del args[i : i + 2]
    if "--graded-window" in args:
        i = args.index("--graded-window")
        window = int(args[i + 1])
        del args[i : i + 2]

    import duckdb

    import __spark_entry__ as e
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(
            f"local[{os.environ.get('SPARK_GRAFT_CPUS', '16')}]"
        )
        .appName("preflight")
        .config("spark.sql.shuffle.partitions", "16")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    qs, oracles = e.queries(), e.oracle_sql()
    names = args if args else list(qs)
    if window is not None:
        names = [n for n in names if n in list(qs)[:window]]

    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    fails: list[str] = []
    for name in names:
        try:
            sdf = qs[name](spark, sf)
            cols = sorted(sdf.columns)
            srows = sorted(
                (tuple(norm(r[c]) for c in cols) for r in sdf.collect()),
                key=_sort_key,
            )
            if name not in oracles:
                print(f"ROWS-ONLY {name}: {len(srows)} rows")
                continue
            cur = con.execute(oracles[name])
            ocols = [d[0] for d in cur.description]
            idx = [ocols.index(c) for c in sorted(ocols)]
            orows = sorted(
                (tuple(norm(r[i]) for i in idx) for r in cur.fetchall()),
                key=_sort_key,
            )
            schema_ok = sorted(ocols) == cols
            ok = schema_ok and srows == orows
            print(
                f"{'PASS' if ok else 'FAIL'} {name}: spark {len(srows)} "
                f"oracle {len(orows)} schema_match={schema_ok}"
            )
            if not ok:
                fails.append(name)
                if not schema_ok:
                    print(f"  cols spark={cols} oracle={sorted(ocols)}")
                for a, b in zip(srows, orows):
                    if a != b:
                        print(f"  first diff:\n    spark  {a}\n    oracle {b}")
                        break
                else:
                    if len(srows) != len(orows):
                        print("  row-count mismatch only")
        except Exception as ex:  # keep scanning remaining gates
            print(f"ERR  {name}: {ex!r}")
            fails.append(name)
    print(f"\n{len(names) - len(fails)}/{len(names)} green; failures: {fails}")
    return len(fails)


if __name__ == "__main__":
    sys.exit(main())
