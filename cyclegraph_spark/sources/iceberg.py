"""Iceberg table connector — gated behind runtime detection.

The v1 image has no Iceberg runtime jars (spark.jars.packages would need
network). When the catalog is configured (``spark.sql.catalog.*`` set and
the Iceberg extension on the classpath) these helpers use real Iceberg
tables — atomic snapshot commits, hidden partitioning (``bucket(N, url)``),
incremental reads between snapshots. Otherwise they fall back to this
repo's Iceberg-STYLE layout (plans/materialize.py: bucketed parquet data
files + a content-addressed manifest + lineage rows), which reproduces
the properties the pipeline relies on: atomic visibility of a completed
bucket, partition pruning on the bucket id, and resumable incremental
processing via the manifest high-watermark.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def iceberg_available(spark: SparkSession) -> bool:
    try:
        jvm = spark.sparkContext._jvm
        jvm.java.lang.Class.forName("org.apache.iceberg.spark.SparkCatalog")
        return True
    except Exception:
        return False


def write_table(df: DataFrame, identifier: str, fallback_dir: str, n_buckets: int = 32) -> str:
    """Write to an Iceberg table when available, else the manifest layout.

    Returns 'iceberg' or 'fallback' so callers/lineage record which path ran.
    """
    spark = df.sparkSession
    if iceberg_available(spark):
        (
            df.writeTo(identifier)
            .partitionedBy(f"bucket({n_buckets}, subj)")  # hidden partitioning
            .createOrReplace()
        )
        return "iceberg"
    from cyclegraph_spark.plans.materialize import materialize_triples

    materialize_triples(df, fallback_dir, run_id=identifier, n_buckets=n_buckets)
    return "fallback"


def read_table(spark: SparkSession, identifier: str, fallback_dir: str) -> DataFrame:
    if iceberg_available(spark):
        return spark.read.table(identifier)
    return spark.read.parquet(f"{fallback_dir}/data")
