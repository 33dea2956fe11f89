"""Driver-gate queries for the physics + session-metrics layers."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cyclegraph_spark.operators.queries import query
from cyclegraph_spark.tables import load


# --------------------------------------------------------------------------
# P5/P12 — wind projection + air density scalar surface
# --------------------------------------------------------------------------
@query(
    "physics_wind_density",
    oracle="""
    SELECT event_id,
           ROUND(
             LEAST(GREATEST(
               (1013.25 * 100 * POWER(GREATEST(1 - 0.0065 * GREATEST(value * 10, 0)
                                               / (15 + 273.15), 0.001),
                                      9.80665 / (287.05 * 0.0065)))
               / (287.05 * (15 + 273.15)), 0.6), 1.4), 4) AS rho,
           ROUND(GREATEST(5.0, 0) * COS(RADIANS(
             ((value * 7) % 360 - 135 % 360 + 360) % 360)), 4) AS wind_along,
           ROUND(GREATEST(value / 10.0 - GREATEST(5.0, 0) * COS(RADIANS(
             ((value * 7) % 360 - 135 % 360 + 360) % 360)), 0.1), 4) AS v_rel
    FROM events WHERE event_id % 5 = 0 ORDER BY event_id
    """,
)
def physics_wind_density(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P5 wind TO-convention projection + P12 barometric air density as
    pure column math (physics.rs:52-103) over synthesized inputs from
    the events table (altitude=value·10, heading=value·7 mod 360,
    wind 5 m/s toward 135°)."""
    from cyclegraph_spark.functions.physics import air_density, v_rel, wind_along

    ev = load(spark, sf_dir, "events").filter(F.col("event_id") % 5 == 0)
    heading = F.pmod(F.col("value") * 7, F.lit(360.0))
    alt = F.col("value") * 10
    return ev.select(
        "event_id",
        F.round(air_density(F.lit(15.0), F.lit(1013.25), alt), 4).alias("rho"),
        F.round(wind_along(heading, F.lit(135.0), F.lit(5.0)), 4).alias("wind_along"),
        F.round(v_rel(F.col("value") / 10.0, heading, F.lit(135.0), F.lit(5.0)), 4).alias(
            "v_rel"
        ),
    ).orderBy("event_id")


# --------------------------------------------------------------------------
# A8/W1/W2/A9/A10 — full session metric block (metrics.py) vs SQL oracle
# --------------------------------------------------------------------------
@query(
    "metrics_session_block",
    oracle="""
    WITH samples AS (
      SELECT user_id AS activity_id,
             epoch_us(ts) AS t,
             value AS watts,
             (value % 100) + 60 AS hr
      FROM events
    ), rolled AS (
      SELECT activity_id, watts, hr,
             AVG(watts) OVER (PARTITION BY activity_id ORDER BY t
                              ROWS BETWEEN 29 PRECEDING AND CURRENT ROW) AS roll
      FROM samples
    ), agg AS (
      SELECT activity_id,
             COUNT(*) AS n_samples,
             AVG(watts) AS avg_power,
             AVG(hr) AS avg_hr,
             POWER(AVG(POWER(roll, 4)), 0.25) AS np_windowed,
             QUANTILE_CONT(CASE WHEN hr > 0 THEN watts / hr END, 0.5) AS wpb_median,
             QUANTILE_CONT(watts - roll, 0.75) - QUANTILE_CONT(watts - roll, 0.25) AS iqr
      FROM rolled GROUP BY activity_id
    )
    SELECT activity_id,
           ROUND(avg_power, 2) AS avg_power,
           ROUND(CASE WHEN n_samples < 30 THEN avg_power ELSE np_windowed END, 2) AS np,
           ROUND(CASE WHEN avg_hr > 0 THEN avg_power / avg_hr ELSE 0 END, 2) AS w_per_beat,
           ROUND(CASE WHEN COALESCE(wpb_median,
                                    CASE WHEN avg_hr > 0 THEN avg_power / avg_hr ELSE 0 END) > 0
                 THEN (CASE WHEN avg_hr > 0 THEN avg_power / avg_hr ELSE 0 END)
                      / COALESCE(wpb_median,
                                 CASE WHEN avg_hr > 0 THEN avg_power / avg_hr ELSE 0 END)
                 ELSE 0 END, 2) AS pa_hr,
           ROUND(CASE WHEN ABS(iqr) > 0 THEN ABS(iqr) / 1.349 ELSE 0 END
                 / SQRT(LEAST(30, n_samples)), 4) AS precision_watt
    FROM agg ORDER BY activity_id
    """,
)
def metrics_session_block(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference session metric block (metrics.rs NP/PaHr/WpB/
    PrecisionWatt + round-2 contract) over events reshaped as samples —
    the flagship metrics operator under the DuckDB gate."""
    from cyclegraph_spark.operators.metrics import session_metrics

    ev = load(spark, sf_dir, "events")
    samples = ev.select(
        F.col("user_id").alias("activity_id"),
        F.unix_micros(F.col("ts").cast("timestamp")).alias("t"),
        F.col("value").alias("watts"),
        (F.pmod(F.col("value"), F.lit(100.0)) + 60).alias("hr"),
    )
    out = session_metrics(samples)
    return out.select(
        "activity_id", "avg_power", "np", "w_per_beat", "pa_hr", "precision_watt"
    ).orderBy("activity_id")
