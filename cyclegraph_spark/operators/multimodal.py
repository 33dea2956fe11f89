"""Multimodal column plumbing — image/audio/video as opaque ``binary``
columns with typed metadata, processed by Arrow-batched ``mapInPandas``.

The decode step is STUBBED (no image/audio libs in this container): a
clearly-marked deterministic fake stands in for the codec, while the
Spark-side contract — schema, batch shape, partitioning, UDF signature —
is real and tested. Swap ``_decode_image_stub`` for a real decoder
(PIL/libvips via pandas) without touching the plan.

Design points for 100 TB of media:
- media bytes NEVER pass through a shuffle: decode/feature stages are
  mapInPandas over the scan (narrow); only small feature vectors /
  metadata move afterwards;
- batch size is bounded by bytes not rows
  (spark.sql.execution.arrow.maxRecordsPerBatch interacts with row size
  — callers should repartition by size class or set maxRecordsPerBatch
  lower for large blobs);
- metadata travels in a sibling struct column so pruning works: a query
  over width/height never touches the blob column (parquet column
  pruning drops it at the scan).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image|audio|video
        T.StructField("content", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("mime", T.StringType()),
                    T.StructField("width", T.IntegerType()),
                    T.StructField("height", T.IntegerType()),
                    T.StructField("duration_ms", T.IntegerType()),
                ]
            ),
        ),
    ]
)

FEATURE_DIM = 16

_FEATURE_SCHEMA = (
    "media_id long, kind string, n_bytes int, sha256 string, "
    f"features array<float>"
)


def _decode_image_stub(content: bytes) -> list[float]:
    """STUB decoder — deterministic fake feature vector.

    A real implementation would decode the image and pool pixel
    statistics; this container has no codec libs, so we derive a
    deterministic FEATURE_DIM-vector from the bytes' sha256. The
    signature and batch mechanics are the production ones.
    """
    if content is None:
        return [0.0] * FEATURE_DIM
    d = hashlib.sha256(content).digest()
    return [b / 255.0 for b in d[:FEATURE_DIM]]


def extract_features(media: DataFrame) -> DataFrame:
    """media(media_id, kind, content, meta) → per-item feature rows.

    mapInPandas: one Arrow batch in, one out; blob column consumed here
    and dropped from the output (no media bytes downstream).
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": pdf["content"].map(lambda b: 0 if b is None else len(b)),
                    "sha256": pdf["content"].map(
                        lambda b: "" if b is None else hashlib.sha256(b).hexdigest()
                    ),
                    "features": pdf["content"].map(_decode_image_stub),
                }
            )

    return media.mapInPandas(batches, schema=_FEATURE_SCHEMA)


def frame_sample_plan(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling PLAN: which (media_id, ts_ms) frames a real
    decoder would extract — pure Column math over metadata (no blob
    access; the parquet scan prunes `content` entirely)."""
    n_frames = F.greatest((F.col("meta.duration_ms") / every_ms).cast("int"), F.lit(0))
    return (
        media.filter(F.col("kind") == "video")
        .select(
            "media_id",
            F.explode(
                F.when(n_frames > 0, F.sequence(F.lit(0), n_frames - 1)).otherwise(
                    F.expr("array()").cast("array<int>")
                )
            ).alias("frame_idx"),
        )
        .withColumn("ts_ms", F.col("frame_idx") * every_ms)
    )


def synthetic_media(spark, n: int = 100, seed: int = 42) -> DataFrame:
    """Deterministic fake media table for tests/bench."""

    def gen(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids = pdf["id"].astype(int)
            kinds = ids.map(lambda i: ["image", "audio", "video"][i % 3])
            content = ids.map(
                lambda i: hashlib.sha256(f"{seed}:{i}".encode()).digest() * (1 + i % 5)
            )
            yield pd.DataFrame(
                {
                    "media_id": ids,
                    "kind": kinds,
                    "content": content,
                    "meta": [
                        {
                            "mime": {"image": "image/png", "audio": "audio/wav", "video": "video/mp4"}[k],
                            "width": 64 + (i % 4) * 32 if k == "image" else None,
                            "height": 64 if k == "image" else None,
                            "duration_ms": int(1000 + (i % 7) * 500) if k != "image" else None,
                        }
                        for i, k in zip(ids, kinds)
                    ],
                }
            )

    return spark.range(n).mapInPandas(gen, schema=MEDIA_SCHEMA)
