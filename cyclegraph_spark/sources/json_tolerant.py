"""S7/S8 — tolerant JSON scan with sample-list discovery.

Reference semantics (/root/reference/server/analysis/t11_matrix.py:106-199):
parse JSON / JSON-Lines / bracket-slice / gzip tolerantly, then discover
"samples-like" arrays under aliased keys (samples/records/points/...).

Spark-first restatement:
- ``spark.read.json`` with ``mode=PERMISSIVE`` +
  ``columnNameOfCorruptRecord`` — malformed documents land in a corrupt
  column instead of failing the scan (the reference's try-cascade);
- gzip is native to the reader (codec by extension);
- alias discovery = ``F.coalesce`` over candidate array paths with an
  explicit schema (never schema inference in production paths).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

SAMPLE_KEYS = ("samples", "records", "points", "data", "stream", "items")

_SAMPLE = T.ArrayType(
    T.StructType(
        [
            T.StructField("t", T.DoubleType()),
            T.StructField("watts", T.DoubleType()),
            T.StructField("hr", T.DoubleType()),
        ]
    )
)


def result_schema() -> T.StructType:
    fields = [T.StructField(k, _SAMPLE, True) for k in SAMPLE_KEYS]
    fields += [
        T.StructField("ride_id", T.StringType(), True),
        T.StructField("id", T.StringType(), True),
        T.StructField("_corrupt", T.StringType(), True),
    ]
    return T.StructType(fields)


def read_results_json(spark: SparkSession, path: str) -> DataFrame:
    """→ (ride_id, samples, corrupt) — one row per document; corrupt
    docs survive as rows with ``corrupt`` set (t11 tolerant cascade)."""
    df = (
        spark.read.schema(result_schema())
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt")
        .json(path)
    )
    samples = F.coalesce(*[F.col(k) for k in SAMPLE_KEYS])
    return df.select(
        F.coalesce(F.col("ride_id"), F.col("id")).alias("ride_id"),
        samples.alias("samples"),
        F.col("_corrupt").alias("corrupt"),
    )


def explode_samples(results: DataFrame) -> DataFrame:
    """Discovered sample arrays → long per-sample rows (S8)."""
    return (
        results.filter(F.col("samples").isNotNull())
        .select("ride_id", F.posexplode("samples").alias("idx", "s"))
        .select("ride_id", "idx", "s.t", "s.watts", "s.hr")
    )
