"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship KG query: lift the sf0.001 ``events`` table
into an RDF triple DataFrame with the reference mapper's semantics
(/root/reference/cli/csv_to_rdf.py:12-62) and summarize per predicate.

``queries()`` / ``oracle_sql()`` — operator registry
(cyclegraph_spark.operators.queries) checked against DuckDB at sf0.01.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

SF0001 = "/root/testdata/sf0.001"


def _arm(spark: SparkSession) -> None:
    """Make the package importable on driver + executors regardless of
    the caller's cwd/PYTHONPATH (--py-files discipline; see
    cyclegraph_spark.session.ship_package), and pin the session timezone
    to UTC — timestamp_ntz→epoch conversions in the queries must agree
    with the UTC-naive DuckDB oracles whatever the host TZ is."""
    import os
    import sys

    here = os.path.dirname(os.path.abspath(__file__))
    if here not in sys.path:
        sys.path.insert(0, here)
    from cyclegraph_spark.session import ship_package

    spark.conf.set("spark.sql.session.timeZone", "UTC")
    ship_package(spark)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: events → stream-shaped rows → typed RDF triples."""
    _arm(spark)
    from cyclegraph_spark.operators.triples import lift_stream_rows

    ev = spark.read.parquet(f"{SF0001}/events.parquet")
    stream = ev.select(
        F.col("user_id").cast("string").alias("activity_id"),
        F.col("event_id").cast("string").alias("index"),
        F.unix_timestamp("ts").cast("string").alias("time_s"),
        F.round(F.col("value") % 100 + 60, 0).cast("string").alias("hr"),
        F.round(F.col("value") * 3, 0).cast("string").alias("watts"),
        F.when(F.col("event_type") == "view", F.lit("1")).otherwise(F.lit("0")).alias("moving"),
        F.col("value").cast("string").alias("altitude"),
    )
    triples = lift_stream_rows(stream)
    return (
        triples.groupBy("pred", "obj_dtype")
        .agg(F.count(F.lit(1)).alias("n_triples"))
        .orderBy("pred")
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    import os
    import sys

    here = os.path.dirname(os.path.abspath(__file__))
    if here not in sys.path:
        sys.path.insert(0, here)
    from cyclegraph_spark.operators.queries import all_queries

    def _wrap(fn: Callable[[SparkSession, str], DataFrame]):
        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            _arm(spark)
            return fn(spark, sf_dir)

        run.__name__ = getattr(fn, "__name__", "query")
        run.__doc__ = fn.__doc__
        return run

    return {name: _wrap(fn) for name, fn in all_queries().items()}


def oracle_sql() -> dict[str, str]:
    import os
    import sys

    here = os.path.dirname(os.path.abspath(__file__))
    if here not in sys.path:
        sys.path.insert(0, here)
    from cyclegraph_spark.operators.queries import all_oracles

    return all_oracles()
