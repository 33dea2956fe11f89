"""Tolerant CSV session source — S1/S2/S3 of the operator inventory.

Reimplements, Spark-first, the reference reader's robustness stack
(/root/reference/cli/io.py):
- encoding fallback utf-8 → utf-8-sig → cp1252 → latin-1 (io.py:12-32):
  a driver-side sniff of the first 2 KiB picks the charset, then the
  DISTRIBUTED read uses that charset option — the probe is O(1), the
  scan stays parallel;
- delimiter heuristic ';' vs ',' + Sniffer fallback (io.py:35-45);
- header-alias projection (io.py:107-109, session.py:638-639):
  time (t|time|timestamp|date|datetime), power (watts|watt|power|
  power_w|pwr|device_watts), hr (hr|heartrate|heart_rate|bpm|pulse) —
  resolved with ``F.coalesce`` over whichever alias columns exist;
- decimal-comma floats (io.py:47-53 _to_float) via replace+try_cast;
- missing time column → row index (io.py:111-118) via a window
  row_number (single file) — documented caveat: global ordering of a
  headerless stream is only meaningful per file, so we key it by file;
- km/h→m/s unit inference when v > 50 (session.py:828-829, 955-957);
- moving default = v > 0.1 (session.py:817-865).
"""

from __future__ import annotations

import csv as _csv

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

TIME_KEYS = ("t", "time", "timestamp", "date", "datetime")
POWER_KEYS = ("watts", "watt", "power", "power_w", "pwr", "device_watts")
HR_KEYS = ("hr", "heartrate", "heart_rate", "bpm", "pulse")
SPEED_KEYS = ("v_ms", "speed", "v", "velocity")
ALT_KEYS = ("altitude", "alt", "elevation")
LAT_KEYS = ("latitude", "lat")
LON_KEYS = ("longitude", "lon", "lng")
MOVING_KEYS = ("moving", "in_segment", "valid", "ok")

_ENCODINGS = ("utf-8", "utf-8-sig", "cp1252", "latin-1")


def sniff_format(path: str) -> tuple[str, str]:
    """Driver-side probe: (encoding, delimiter) from the first 2 KiB."""
    with open(path, "rb") as f:
        head = f.read(2048)
    encoding = "latin-1"
    for enc in _ENCODINGS:
        try:
            head.decode(enc)
            encoding = enc
            break
        except UnicodeDecodeError:
            continue
    sample = head.decode(encoding, errors="replace")
    if ";" in sample and "," not in sample:
        delim = ";"
    elif "," in sample and ";" not in sample:
        delim = ","
    else:
        try:
            delim = _csv.Sniffer().sniff(sample, delimiters=";,").delimiter
        except _csv.Error:
            delim = ","
    return encoding, delim


def _loose_float(col: F.Column) -> F.Column:
    """_to_float (io.py:47-53): decimal-comma tolerant float, else NULL."""
    return F.replace(F.trim(col.cast("string")), F.lit(","), F.lit(".")).try_cast("double")


def _first_alias(df: DataFrame, keys: tuple[str, ...]) -> F.Column | None:
    norm = {c.lower().strip(): c for c in df.columns}
    cols = [F.col(f"`{norm[k]}`") for k in keys if k in norm]
    if not cols:
        return None
    return F.coalesce(*cols) if len(cols) > 1 else cols[0]


def read_session_csv(spark: SparkSession, path: str) -> DataFrame:
    """S1/S2: one session CSV → normalized (t, watts, hr, v_ms, altitude,
    latitude, longitude, moving) with the reference's tolerance stack."""
    encoding, delim = sniff_format(path)
    # Spark's CSV charset whitelist has no cp1252; iso-8859-1 decodes the
    # same byte range (0x80-0x9F land as C1 controls instead of smart
    # punctuation — the same lossy-last-resort posture as the reference's
    # errors="replace" fallback, io.py:29-32).
    spark_charset = {"cp1252": "iso-8859-1", "latin-1": "iso-8859-1"}.get(encoding, encoding)
    raw = (
        spark.read.option("header", True)
        .option("sep", delim)
        .option("encoding", spark_charset)
        .option("mode", "PERMISSIVE")
        .csv(path)
    )

    t_raw = _first_alias(raw, TIME_KEYS)
    if t_raw is not None:
        # numeric seconds, else ISO8601 (session.py:797-815 tolerant
        # parse); try_to_timestamp keeps garbage NULL under ANSI mode
        t = F.coalesce(
            _loose_float(t_raw),
            F.unix_timestamp(F.try_to_timestamp(t_raw.cast("string"))).cast("double"),
        )
        df = raw.withColumn("t", t)
    else:
        # io.py:111-118: missing time → row index (per file, single file here)
        w = Window.orderBy(F.monotonically_increasing_id())
        df = raw.withColumn("t", (F.row_number().over(w) - 1).cast("double"))

    def add(name: str, keys: tuple[str, ...]) -> None:
        nonlocal df
        c = _first_alias(raw, keys)
        df = df.withColumn(name, _loose_float(c) if c is not None else F.lit(None).cast("double"))

    add("watts", POWER_KEYS)
    add("hr", HR_KEYS)
    add("v_ms", SPEED_KEYS)
    add("altitude", ALT_KEYS)
    add("latitude", LAT_KEYS)
    add("longitude", LON_KEYS)

    # km/h → m/s inference (session.py:828-829): sustained v>50 means km/h
    df = df.withColumn(
        "v_ms", F.when(F.col("v_ms") > 50.0, F.col("v_ms") / 3.6).otherwise(F.col("v_ms"))
    )

    mv = _first_alias(raw, MOVING_KEYS)
    truthy = F.lower(F.trim(mv.cast("string"))).isin("1", "true", "yes", "y", "ok") if mv is not None else None
    moving = (
        truthy
        if truthy is not None
        else F.when(F.col("v_ms").isNotNull(), F.col("v_ms") > 0.1).otherwise(F.lit(True))
    )
    df = df.withColumn("moving", moving)

    return df.select(
        "t", "watts", "hr", "v_ms", "altitude", "latitude", "longitude", "moving"
    )


def filter_valid_samples(df: DataFrame) -> DataFrame:
    """P2 (core/src/lib.rs:290-313): drop non-moving / non-positive-watt /
    null-hr rows before metric aggregation."""
    return df.filter(
        F.col("moving")
        & (F.col("watts") > 0)
        & F.col("hr").isNotNull()
    )
