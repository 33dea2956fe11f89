"""P5-P12 physics column library vs the single-node twin (faithful port
of core/src/physics.rs semantics; see functions/physics.py citations)."""

import math

import pytest
from pyspark.sql import types as T

from cyclegraph_spark.functions.physics import (
    reference_power_series,
    with_power_model,
)

SCHEMA = T.StructType(
    [
        T.StructField("activity_id", T.StringType()),
        T.StructField("t", T.DoubleType()),
        T.StructField("v_ms", T.DoubleType()),
        T.StructField("altitude_m", T.DoubleType()),
        T.StructField("latitude", T.DoubleType()),
        T.StructField("longitude", T.DoubleType()),
    ]
)


def _ride(n=120, seed=3):
    rows = []
    for i in range(n):
        rows.append(
            {
                "t": float(i),
                "v_ms": 8.0 + 3.0 * math.sin(i / 11.0) + 0.5 * ((i * seed) % 5),
                "altitude_m": 100.0 + 10.0 * math.sin(i / 17.0) + (i % 7) * 0.3,
                "latitude": 59.91 + i * 1e-4,
                "longitude": 10.75 + i * 2e-4 * math.cos(i / 30.0),
            }
        )
    return rows


@pytest.mark.parametrize("wind_ms,wind_to", [(0.0, 0.0), (4.0, 135.0)])
def test_power_model_matches_twin(spark, wind_ms, wind_to):
    rows = _ride()
    df = spark.createDataFrame(
        [("a", r["t"], r["v_ms"], r["altitude_m"], r["latitude"], r["longitude"]) for r in rows],
        SCHEMA,
    )
    got = (
        with_power_model(df, wind_ms=wind_ms, wind_to_deg=wind_to)
        .orderBy("t")
        .select("power", "wind_rel", "v_rel")
        .collect()
    )
    exp = reference_power_series(rows, wind_ms=wind_ms, wind_to_deg=wind_to)
    assert len(got) == len(exp)
    for g, (p, wrel, vrel) in zip(got, exp):
        # Masterplan.md:86 golden stability: power series ±1-2 W
        assert abs(g.power - p) <= 1.0, (g.power, p)
        assert abs(g.wind_rel - wrel) <= 1e-6
        assert abs(g.v_rel - vrel) <= 1e-6


def test_wind_sign_sanity(spark):
    """physics.rs:531-565 analog: headwind raises aero power, tailwind
    lowers it (heading 0 due to no lat/lon movement northward)."""
    rows = [
        {"t": float(i), "v_ms": 10.0, "altitude_m": 50.0, "latitude": 59.0 + i * 1e-4, "longitude": 10.0}
        for i in range(40)
    ]
    df = spark.createDataFrame(
        [("a", r["t"], r["v_ms"], r["altitude_m"], r["latitude"], r["longitude"]) for r in rows],
        SCHEMA,
    )
    # wind blowing TOWARD 180° (southward) while riding north = headwind
    head = with_power_model(df, wind_ms=5.0, wind_to_deg=180.0).agg({"power": "avg"}).collect()[0][0]
    tail = with_power_model(df, wind_ms=5.0, wind_to_deg=0.0).agg({"power": "avg"}).collect()[0][0]
    calm = with_power_model(df, wind_ms=0.0).agg({"power": "avg"}).collect()[0][0]
    assert head > calm > tail


def test_crr_tire_keyword_classification(spark):
    """physics.rs:446-507 keyword table: unknown→base, training→+0.0004,
    race→−0.0003, cheap→+0.0003, clamp [0.0025, 0.0120]."""
    from cyclegraph_spark.functions.physics import crr_for_tire_quality
    from pyspark.sql import functions as F

    cases = [
        ("", 0.005), ("ukjent", 0.005), ("1.0", 0.005), ("???", 0.005),
        ("Gatorskin winter", 0.0054), ("Continental GP5000 TLR", 0.0047),
        ("cheap rubber", 0.0053), ("marathon racing", 0.0054),  # training wins
        ("exotic", 0.005),
    ]
    df = spark.createDataFrame([(c,) for c, _ in cases], "tq string")
    got = [
        round(r.crr, 6)
        for r in df.select(crr_for_tire_quality(F.col("tq")).alias("crr")).collect()
    ]
    assert got == [e for _, e in cases]


def test_determinism_across_partitions(spark):
    rows = _ride(200)
    data = [("a", r["t"], r["v_ms"], r["altitude_m"], r["latitude"], r["longitude"]) for r in rows]
    outs = []
    for parts in (1, 8):
        df = spark.createDataFrame(data, SCHEMA).repartition(parts)
        outs.append(
            [round(r.power, 9) for r in with_power_model(df).orderBy("t").collect()]
        )
    assert outs[0] == outs[1]
