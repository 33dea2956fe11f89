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


# Canonical families for DuckDB-vs-Spark type parity.  The driver hashes
# TYPED values, so an oracle column whose representation differs from the
# Spark column (DuckDB HUGEINT=int128 window SUM vs Spark BIGINT; DECIMAL
# vs DOUBLE) hash-diverges even when every value matches — the a14 (r1)
# and w8 (r3) red rows were exactly this class.  norm() above is
# type-insensitive, which is why value compare alone cannot catch it.
_DUCK_CANON = {
    "TINYINT": "i8", "SMALLINT": "i16", "INTEGER": "i32", "BIGINT": "i64",
    "HUGEINT": "i128", "UTINYINT": "u8", "USMALLINT": "u16",
    "UINTEGER": "u32", "UBIGINT": "u64",
    "FLOAT": "f32", "DOUBLE": "f64", "VARCHAR": "str", "BOOLEAN": "bool",
    "DATE": "date", "BLOB": "binary",
}
_SPARK_CANON = {
    "tinyint": "i8", "smallint": "i16", "int": "i32", "bigint": "i64",
    "float": "f32", "double": "f64", "string": "str", "boolean": "bool",
    "date": "date", "binary": "binary",
}


def _canon_duck(t: str) -> str:
    t = t.upper()
    if t.startswith("DECIMAL"):
        return "decimal"
    if t.startswith("TIMESTAMP"):
        return "timestamp"
    if t.endswith("[]"):
        return "array<" + _canon_duck(t[:-2]) + ">"
    return _DUCK_CANON.get(t, t.lower())


def _canon_spark(t: str) -> str:
    t = t.lower()
    if t.startswith("decimal"):
        return "decimal"
    if t.startswith("timestamp"):
        return "timestamp"
    if t.startswith("array<") and t.endswith(">"):
        return "array<" + _canon_spark(t[6:-1]) + ">"
    return _SPARK_CANON.get(t, t)


def type_mismatches(spark_dtypes, duck_cols) -> list[str]:
    """Columns whose canonical DuckDB type differs from Spark's.

    spark_dtypes: df.dtypes list[(name, dtype)];
    duck_cols: list[(name, duckdb_type_str)] from DESCRIBE.
    Returns human-readable 'col: spark=X duck=Y' strings.
    """
    sd = {n: _canon_spark(t) for n, t in spark_dtypes}
    out = []
    for n, t in duck_cols:
        dc = _canon_duck(t)
        if n in sd and sd[n] != dc:
            out.append(f"{n}: spark={sd[n]} duck={dc}")
    return out


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

    from cyclegraph_spark.operators.queries import extended_oracles, extended_queries

    qs, oracles = e.queries(), e.oracle_sql()
    graded = list(qs)
    # extended registry (composite-gated, out of the driver window) is
    # still preflighted — appended after the driver-visible entries.
    qs = {**qs, **extended_queries()}
    oracles = {**oracles, **extended_oracles()}
    names = args if args else list(qs)
    if window is not None:
        names = [n for n in names if n in graded[:window]]

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
            duck_cols = [
                (r[0], r[1])
                for r in con.execute(f"DESCRIBE {oracles[name]}").fetchall()
            ]
            tmis = type_mismatches(sdf.dtypes, duck_cols)
            cur = con.execute(oracles[name])
            ocols = [d[0] for d in cur.description]
            idx = [ocols.index(c) for c in sorted(ocols)]
            orows = sorted(
                (tuple(norm(r[i]) for i in idx) for r in cur.fetchall()),
                key=_sort_key,
            )
            schema_ok = sorted(ocols) == cols
            ok = schema_ok and srows == orows and not tmis
            print(
                f"{'PASS' if ok else 'FAIL'} {name}: spark {len(srows)} "
                f"oracle {len(orows)} schema_match={schema_ok} "
                f"type_match={not tmis}"
            )
            if not ok:
                fails.append(name)
                if tmis:
                    print(f"  TYPE mismatch (driver hash would diverge): {tmis}")
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
