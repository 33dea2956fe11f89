"""Incremental / streaming idioms.

1. High-watermark batch resume (S6, /root/reference/cli/strava_import.py:
   289-313 + state/last_import.json): persist max(ts) after each batch;
   the next run filters `ts > watermark` — a pushed-down predicate, so
   a resumed run scans only new files/row-groups (parquet min/max
   pruning).
2. Structured Streaming windowed aggregation with event-time watermark
   (the reference is batch-only — SURVEY.md §2.8 — this is the Spark
   capability its incremental idioms map onto at scale).
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class HighWatermark:
    """Atomic JSON watermark state (write-temp-then-rename, the
    reference's crash-consistency idiom, sessions.py:85-96)."""

    def __init__(self, path: str):
        self.path = path

    def read(self) -> str | None:
        if not os.path.exists(self.path):
            return None
        with open(self.path, encoding="utf-8") as f:
            return json.load(f).get("max_ts")

    def write(self, max_ts: str) -> None:
        tmp = self.path + ".tmp"
        with open(tmp, "w", encoding="utf-8") as f:
            json.dump({"max_ts": max_ts}, f)
        os.replace(tmp, self.path)


def incremental_read(
    spark: SparkSession, path: str, state: HighWatermark, ts_col: str = "ts"
) -> DataFrame:
    """Rows with ts strictly above the stored watermark (all rows on the
    first run). Filter is a pushdown predicate → min/max pruning."""
    df = spark.read.parquet(path)
    wm = state.read()
    if wm is not None:
        df = df.filter(F.col(ts_col) > F.lit(wm).cast("timestamp"))
    return df


def advance_watermark(df: DataFrame, state: HighWatermark, ts_col: str = "ts") -> int:
    """Process-then-commit: returns row count; persists new max(ts)."""
    agg = df.agg(
        F.count(F.lit(1)).alias("n"), F.max(ts_col).cast("string").alias("mx")
    ).collect()[0]
    if agg.n > 0 and agg.mx is not None:
        state.write(agg.mx)
    return int(agg.n)


def windowed_event_counts(
    events_stream: DataFrame,
    window: str = "5 minutes",
    slide: str | None = None,
    watermark: str = "10 minutes",
) -> DataFrame:
    """Event-time windowed aggregation with late-data watermark —
    readStream(events) → groupBy(window(ts), event_type).agg(...)."""
    return (
        events_stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window, slide or window), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("total_value"))
    )
