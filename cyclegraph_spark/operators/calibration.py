"""J7/O5 — Crr grid-search calibration with quality gates, distributed.

Reference semantics (/root/reference/core/src/calibration.rs:58-164):
- gates: <300 samples → "insufficient_segment"; non-finite measured →
  "non_finite_measured_power"; indoor → "indoor_session" (each returns
  profile defaults, calibrated=false);
- grid Crr ∈ {0.003..0.008 step 0.001}, CdA fixed; model power per
  (sample, crr); MAE over finite pairs; argmin;
- quality gate: calibrated ⇔ best MAE < 10% of avg measured power
  (Masterplan.md:87,177).

Spark-first: the grid is a 6-row broadcast crossJoin — the model power
recomputes per grid cell inside one plan (no driver loop over crr), so
ONE pass computes all 6 MAEs per activity; ``min_by`` picks the argmin.
Early-exit gates become plan-level filters: gated activities skip the
crossJoin entirely (predicate before the join, exactly the reference's
early returns re-expressed as relational pruning).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from cyclegraph_spark.functions.physics import G

CRR_GRID = [0.003, 0.004, 0.005, 0.006, 0.007, 0.008]
MIN_SAMPLES = 300
DEFAULT_CDA = 0.30
DEFAULT_CRR = 0.005


def calibrate_crr(
    samples: DataFrame,
    act: str = "activity_id",
    mass: float = 75.0,
    cda: float = DEFAULT_CDA,
    rho: float = 1.225,
) -> DataFrame:
    """samples(activity_id, v_ms, measured_w, indoor?) →
    (activity_id, cda, crr, mae, calibrated, reason).

    Model here is the flat-segment form ½ρCdA·v³ + m·g·crr·v (the crr-
    dependent terms of physics.rs compute_power; gradient/acc terms are
    crr-independent and cancel in the argmin ordering only when flat —
    callers pass wind/grade-corrected v for sloped segments).
    """
    spark = samples.sparkSession
    has_indoor = "indoor" in samples.columns
    indoor_col = F.col("indoor") if has_indoor else F.lit(False)

    stats = samples.groupBy(act).agg(
        F.count(F.lit(1)).alias("n"),
        F.avg("measured_w").alias("avg_measured"),
        F.sum(
            F.when(
                F.col("measured_w").isNull()
                | F.isnan("measured_w")
                | (F.abs("measured_w") == float("inf")),
                1,
            ).otherwise(0)
        ).alias("n_bad"),
        F.max(indoor_col.cast("int")).alias("is_indoor"),
    )

    gated = stats.select(
        act,
        F.when(F.col("n") < MIN_SAMPLES, "insufficient_segment")
        .when(F.col("n_bad") > 0, "non_finite_measured_power")
        .when(F.col("is_indoor") == 1, "indoor_session")
        .alias("reason"),
        "avg_measured",
    )

    eligible = gated.filter(F.col("reason").isNull()).select(act, "avg_measured")
    grid = spark.createDataFrame([(c,) for c in CRR_GRID], "crr double")

    model = 0.5 * rho * cda * F.pow(F.greatest(F.col("v_ms"), F.lit(0.0)), 3) + (
        mass * G * F.col("crr") * F.greatest(F.col("v_ms"), F.lit(0.0))
    )
    scored = (
        samples.join(eligible.select(act), act, "left_semi")
        .crossJoin(F.broadcast(grid))
        .groupBy(act, "crr")
        .agg(F.avg(F.abs(model - F.col("measured_w"))).alias("mae"))
    )
    best = scored.groupBy(act).agg(
        F.min_by("crr", F.struct("mae", "crr")).alias("crr"),
        F.min("mae").alias("mae"),
    )

    calibrated = eligible.join(best, act).select(
        act,
        F.lit(cda).alias("cda"),
        "crr",
        F.round("mae", 6).alias("mae"),
        (F.col("mae") < 0.10 * F.col("avg_measured")).alias("calibrated"),
        F.lit(None).cast("string").alias("reason"),
    )
    gated_out = gated.filter(F.col("reason").isNotNull()).select(
        act,
        F.lit(cda).alias("cda"),
        F.lit(DEFAULT_CRR).alias("crr"),
        F.lit(0.0).alias("mae"),
        F.lit(False).alias("calibrated"),
        "reason",
    )
    return calibrated.unionByName(gated_out)
