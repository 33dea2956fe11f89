"""Report-level batch analytics — trend, 28-day baseline, T11 matrix.

Reference semantics:
- W4 trend last-3 (/root/reference/cli/analyze.py:241-252,
  cli/session.py:1024-1035): per report, average of the previous 3 CGS
  scores + delta% vs current, round-2.
- J4 28-day baseline (cli/session.py:995-1022): candidates = history
  where date ∈ (cur−28d, cur) and duration ∈ [0.75, 1.25]×cur;
  baseline = exact median w_per_beat.
- T11 matrix contract (server/analysis/t11_matrix.py:30-34,
  tests/test_t11_matrix_csv.py:5-22): fixed 12-column header, watt
  fields castable/non-empty.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

T11_COLUMNS = [
    "git_sha", "profile_version", "weather_source", "ride_id",
    "precision_watt", "drag_watt", "rolling_watt", "total_watt",
    "calibration_mae", "estimated_error_pct_min", "estimated_error_pct_max",
    "precision_quality_hint",
]


def with_trend(
    reports: DataFrame,
    score_col: str = "cgs",
    order_col: str = "report_date",
    key_cols: tuple[str, ...] = (),
) -> DataFrame:
    """W4: cgs_last3_avg + cgs_delta_vs_last3 per report, round-2."""
    w = (
        Window.partitionBy(*key_cols) if key_cols else Window.partitionBy(F.lit(1))
    ).orderBy(order_col).rowsBetween(-3, -1)
    last3 = F.avg(score_col).over(w)
    delta = F.when(
        last3 > 0, 100.0 * (F.col(score_col) - last3) / last3
    )
    return reports.withColumn("cgs_last3_avg", F.round(last3, 2)).withColumn(
        "cgs_delta_vs_last3", F.round(delta, 2)
    )


def with_baseline_28d(
    reports: DataFrame,
    date_col: str = "report_date",
    dur_col: str = "duration_s",
    wpb_col: str = "w_per_beat",
    key_cols: tuple[str, ...] = (),
) -> DataFrame:
    """J4: per report, exact-median w_per_beat over the prior 28 days
    within the ±25% duration band; NULL when no candidates (the
    reference returns None and skips the ratio)."""
    cur = reports
    hist = reports.select(
        *[F.col(k).alias(f"_h_{k}") for k in key_cols],
        F.col(date_col).alias("_h_date"),
        F.col(dur_col).alias("_h_dur"),
        F.col(wpb_col).alias("_h_wpb"),
        F.col("session_id").alias("_h_sid") if "session_id" in reports.columns else F.lit(None).alias("_h_sid"),
    )
    cond = (
        (F.col("_h_date") < F.col(date_col))
        & (F.col("_h_date") >= F.date_sub(F.col(date_col), 28))
        & (F.col("_h_dur") >= F.col(dur_col) * 0.75)
        & (F.col("_h_dur") <= F.col(dur_col) * 1.25)
    )
    for k in key_cols:
        cond = cond & (F.col(f"_h_{k}") == F.col(k))
    joined = cur.join(hist, cond, "left")
    group_cols = [c for c in cur.columns]
    agg = joined.groupBy(*group_cols).agg(
        F.round(F.percentile("_h_wpb", 0.5), 4).alias("baseline_wpb"),
        F.count("_h_wpb").alias("baseline_n"),
    )
    return agg.withColumn(
        "wpb_vs_baseline",
        F.when(
            F.col("baseline_wpb") > 0,
            F.round(F.col(wpb_col) / F.col("baseline_wpb"), 4),
        ),
    )


def with_badges_v22(
    reports: DataFrame,
    wpb_col: str = "w_per_beat",
    baseline_col: str = "baseline_wpb",
    dur_col: str = "duration_s",
    vi_col: str = "vi",
    pa_hr_col: str = "pa_hr",
    precision_col: str = "precision_watt",
    calibrated_col: str = "calibrated",
    samples_col: str = "n_samples",
) -> DataFrame:
    """Badges v2.2 (reference docs/CGS_v1.md "Badges (v2.2)"; apply hook
    cli/session.py:1941-1942) as three null-safe boolean flag columns:

    - **Big Engine**: WpB ≥ baseline × 1.06 AND duration ≥ 30 min.
      No baseline ("Ingen baseline" degrade rule) → no badge.
    - **Metronome**: VI ≤ 1.05 AND Pa:Hr ≤ 1.05.
    - **Dialed In** (v2.2): calibrated == true AND PrecisionWatt ≤ ±3 W
      AND samples ≥ 30.

    A NULL in any contributing metric never awards the badge (the
    reference's missing-HR / hr_only degrade rules skip the indicator).
    """

    def _flag(c):
        return F.coalesce(c, F.lit(False))

    big = (F.col(wpb_col) >= F.col(baseline_col) * 1.06) & (
        F.col(dur_col) >= 1800.0
    )
    metronome = (F.col(vi_col) <= 1.05) & (F.col(pa_hr_col) <= 1.05)
    dialed = (
        F.col(calibrated_col)
        & (F.col(precision_col) <= 3.0)
        & (F.col(samples_col) >= 30)
    )
    return (
        reports.withColumn("badge_big_engine", _flag(big))
        .withColumn("badge_metronome", _flag(metronome))
        .withColumn("badge_dialed_in", _flag(dialed))
    )


def t11_matrix(
    reports: DataFrame,
    git_sha: str = "spark",
    profile_version: str = "v1",
    weather_source: str = "frozen",
) -> DataFrame:
    """Project reports into the exact T11 12-column contract.

    drag_watt / rolling_watt come from the P7 physics decomposition when
    analyze_sessions computed them (session-average p_aero / p_roll);
    reports lacking the component columns fall back to zero. Note these
    are MODEL diagnostics (default profile + weather), not a partition of
    the measured total_watt — model-vs-measured mismatch is what
    calibration_mae quantifies."""
    cols = set(reports.columns)
    drag = F.col("drag_watt") if "drag_watt" in cols else F.lit(None).cast("double")
    roll = F.col("rolling_watt") if "rolling_watt" in cols else F.lit(None).cast("double")
    return reports.select(
        F.lit(git_sha).alias("git_sha"),
        F.lit(profile_version).alias("profile_version"),
        F.lit(weather_source).alias("weather_source"),
        F.col("session_id").alias("ride_id"),
        F.coalesce(F.col("precision_watt"), F.lit(0.0)).alias("precision_watt"),
        F.coalesce(drag, F.lit(0.0)).alias("drag_watt"),
        F.coalesce(roll, F.lit(0.0)).alias("rolling_watt"),
        F.coalesce(F.col("avg_power"), F.lit(0.0)).alias("total_watt"),
        F.lit(0.0).alias("calibration_mae"),
        F.lit(2.0).alias("estimated_error_pct_min"),
        F.lit(20.0).alias("estimated_error_pct_max"),
        F.when(F.col("precision_watt") < 3.0, "god").otherwise("ok").alias(
            "precision_quality_hint"
        ),
    )
