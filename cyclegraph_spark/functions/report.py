"""Report contract layer — P14/P15/P16/A17/A19 as column expressions.

- P15 key canonicalization (/root/reference/cli/session.py:1490-1535,
  483-516): alias map NP→np, avg/avg_watt→avg_power, if/IF→if_,
  PrecisionWatt→precision_watt (numeric extract), loose booleans.
- P16 schema/constant injection (session.py:274-297, 1966-2020):
  schema_version literal with semver guard, calibrated/reason rule
  (calibrated → drop reason; else default "calibration_context_missing").
- P14 weather adjustment factor (core/src/metrics.rs:19-28):
  multiplicative penalties humidity>80 → 0.95, temp>25 → 0.97,
  pressure<1000 → 0.98.
- A19 estimated-error heuristic (server/analysis/calibration15.py:19-50):
  base 18% − field-presence bonuses, clamp [2, 20], ±1 band; hints for
  windy (>4 m/s) / wet conditions.
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

SCHEMA_VERSION = "0.7.0"
_SEMVER = re.compile(r"^\d+\.\d+\.\d+$")

# P15 alias map (normalized-lower key → canonical column)
KEY_ALIASES: dict[str, str] = {
    "np": "np",
    "avg": "avg_power",
    "avg_watt": "avg_power",
    "avg_power": "avg_power",
    "if": "if_",
    "if_": "if_",
    "vi": "vi",
    "pa_hr": "pa_hr",
    "pahr": "pa_hr",
    "w_per_beat": "w_per_beat",
    "wpb": "w_per_beat",
    "precisionwatt": "precision_watt",
    "precision_watt": "precision_watt",
}


def canonicalize_report_columns(df: DataFrame) -> DataFrame:
    """P15: rename alias columns to the canonical contract; on collision
    the first canonical name wins (deterministic: sorted column order)."""
    out = df
    taken = set(df.columns)
    for col in sorted(df.columns):
        canon = KEY_ALIASES.get(col.lower().strip())
        if canon and canon != col and canon not in taken:
            out = out.withColumnRenamed(col, canon)
            taken.add(canon)
    return out


def loose_bool(c: Column) -> Column:
    """session.py:1537-1609 loose boolean: truthy/falsy strings, else NULL."""
    low = F.lower(F.trim(c.cast("string")))
    return (
        F.when(low.isin("true", "1", "yes", "y", "ja"), F.lit(True))
        .when(low.isin("false", "0", "no", "n", "nei"), F.lit(False))
        .otherwise(F.lit(None).cast("boolean"))
    )


def precision_watt_numeric(c: Column) -> Column:
    """P15: extract the numeric part of "±3.2 W" (session.py:483-516)."""
    num = F.regexp_extract(c.cast("string"), r"([0-9]+(?:[.,][0-9]+)?)", 1)
    return F.replace(num, F.lit(","), F.lit(".")).try_cast("double")


def inject_schema_contract(df: DataFrame, calibrated_col: str = "calibrated") -> DataFrame:
    """P16: schema_version lit + calibrated/reason rule."""
    if not _SEMVER.match(SCHEMA_VERSION):  # session.py:529-531 regex guard
        raise ValueError(f"schema_version {SCHEMA_VERSION!r} is not semver")
    out = df.withColumn("schema_version", F.lit(SCHEMA_VERSION))
    cal = F.coalesce(F.col(calibrated_col), F.lit(False)) if calibrated_col in df.columns else F.lit(False)
    reason = F.when(cal, F.lit(None).cast("string")).otherwise(
        F.lit("calibration_context_missing")
    )
    return out.withColumn("reason", reason)


def weather_adjustment(humidity: Column, temp_c: Column, pressure_hpa: Column) -> Column:
    """P14 (metrics.rs:19-28): multiplicative penalty factor."""
    return (
        F.when(humidity > 80, 0.95).otherwise(1.0)
        * F.when(temp_c > 25, 0.97).otherwise(1.0)
        * F.when(pressure_hpa < 1000, 0.98).otherwise(1.0)
    )


def estimated_error_pct(
    has_power: Column,
    has_hr: Column,
    has_gps: Column,
    has_weather: Column,
    wind_ms: Column,
) -> dict[str, Column]:
    """A19 (calibration15.py:19-50): base 18% − presence bonuses,
    clamp [2, 20]; ±1 band; windy hint at >4 m/s."""
    base = F.lit(18.0)
    est = (
        base
        - F.when(has_power, 8.0).otherwise(0.0)
        - F.when(has_hr, 2.0).otherwise(0.0)
        - F.when(has_gps, 2.0).otherwise(0.0)
        - F.when(has_weather, 2.0).otherwise(0.0)
    )
    est = F.least(F.greatest(est, F.lit(2.0)), F.lit(20.0))
    return {
        "estimated_error_pct": est,
        "error_band_low": F.greatest(est - 1.0, F.lit(2.0)),
        "error_band_high": F.least(est + 1.0, F.lit(20.0)),
        "hint_windy": wind_ms > 4.0,
    }
