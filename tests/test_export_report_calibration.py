"""S7 tolerant JSON, S12 deterministic export, P14-P16/A19 report
contract, J7 calibration gates."""

import json
import math

from pyspark.sql import functions as F
from pyspark.sql import types as T

from cyclegraph_spark.functions.report import (
    canonicalize_report_columns,
    estimated_error_pct,
    inject_schema_contract,
    loose_bool,
    precision_watt_numeric,
    weather_adjustment,
)
from cyclegraph_spark.operators.calibration import calibrate_crr
from cyclegraph_spark.plans.export import write_export_pack
from cyclegraph_spark.sources.json_tolerant import explode_samples, read_results_json


def test_tolerant_json_scan(spark, tmp_path):
    p = tmp_path / "results"
    p.mkdir()
    (p / "a.json").write_text(json.dumps({"ride_id": "r1", "samples": [
        {"t": 0, "watts": 100, "hr": 120}, {"t": 1, "watts": 110, "hr": 121}]}))
    (p / "b.json").write_text(json.dumps({"id": "r2", "records": [
        {"t": 0, "watts": 90, "hr": 110}]}))
    (p / "c.json").write_text("{ this is not json")
    res = read_results_json(spark, str(p))
    rows = {r.ride_id: r for r in res.collect()}
    assert rows["r1"].samples is not None
    assert rows["r2"].samples is not None  # alias 'records' discovered
    corrupt = [r for r in rows.values() if r.corrupt is not None]
    assert len(corrupt) == 1  # malformed doc survived as corrupt row
    flat = explode_samples(res).collect()
    assert len(flat) == 3
    assert {r.ride_id for r in flat} == {"r1", "r2"}


def test_export_pack_deterministic(spark, tmp_path):
    df = spark.read.parquet("/root/testdata/sf0.001/events.parquet").select(
        "event_id", "user_id", (F.col("value") / 3.0).alias("value")
    )
    m1 = write_export_pack(df.repartition(3), str(tmp_path / "e1"), ["event_id"])
    m2 = write_export_pack(df.repartition(8), str(tmp_path / "e2"), ["event_id"])
    assert m1["sha256"] == m2["sha256"]  # byte-stable across parallelism
    line = open(next((tmp_path / "e1" / "lines").glob("part-*.txt"))).readline()
    rec = json.loads(line)
    assert list(rec.keys()) == sorted(rec.keys())  # stable key order
    assert round(rec["value"], 6) == rec["value"]  # round-6 floats


def test_report_canonicalization(spark):
    df = spark.createDataFrame(
        [(200.0, 0.9, "±3,2 W", "yes")],
        T.StructType([
            T.StructField("avg_watt", T.DoubleType()),
            T.StructField("IF", T.DoubleType()),
            T.StructField("PrecisionWatt", T.StringType()),
            T.StructField("ok_flag", T.StringType()),
        ]),
    )
    out = canonicalize_report_columns(df)
    assert "avg_power" in out.columns and "if_" in out.columns
    row = out.select(
        precision_watt_numeric(F.col("precision_watt")).alias("pw"),
        loose_bool(F.col("ok_flag")).alias("b"),
    ).collect()[0]
    assert row.pw == 3.2 and row.b is True


def test_schema_injection_and_reason_rule(spark):
    df = spark.createDataFrame([(True,), (False,)], "calibrated boolean")
    out = inject_schema_contract(df).collect()
    by_cal = {r.calibrated: r for r in out}
    assert by_cal[True].reason is None
    assert by_cal[False].reason == "calibration_context_missing"
    assert all(r.schema_version == "0.7.0" for r in out)


def test_weather_adjustment_and_error_heuristic(spark):
    df = spark.createDataFrame(
        [(85.0, 26.0, 990.0, 5.0), (50.0, 20.0, 1013.0, 1.0)],
        "humidity double, temp_c double, pressure double, wind double",
    )
    out = df.select(
        F.round(
            weather_adjustment(F.col("humidity"), F.col("temp_c"), F.col("pressure")), 6
        ).alias("adj"),
        *[
            v.alias(k)
            for k, v in estimated_error_pct(
                F.lit(True), F.lit(True), F.lit(False), F.lit(False), F.col("wind")
            ).items()
        ],
    ).collect()
    assert out[0].adj == round(0.95 * 0.97 * 0.98, 6)
    assert out[1].adj == 1.0
    assert out[0].estimated_error_pct == 8.0  # 18 - 8 - 2
    assert out[0].hint_windy is True and out[1].hint_windy is False


def _cal_samples(spark, n, aid="a", indoor=False, bad=False):
    rows = []
    for i in range(n):
        v = 8.0 + 2.0 * math.sin(i / 9.0)
        crr_true = 0.006
        w = 0.5 * 1.225 * 0.30 * v**3 + 75.0 * 9.80665 * crr_true * v
        if bad and i == 5:
            w = float("nan")
        rows.append((aid, v, w, indoor))
    return spark.createDataFrame(
        rows, "activity_id string, v_ms double, measured_w double, indoor boolean"
    )


def test_calibration_recovers_crr_and_gates(spark):
    ok = _cal_samples(spark, 400)
    short = _cal_samples(spark, 100, aid="short")
    indoor = _cal_samples(spark, 400, aid="indoor", indoor=True)
    nanpow = _cal_samples(spark, 400, aid="nan", bad=True)
    allof = ok.unionByName(short).unionByName(indoor).unionByName(nanpow)
    out = {r.activity_id: r for r in calibrate_crr(allof).collect()}
    assert out["a"].crr == 0.006 and out["a"].calibrated  # argmin found truth
    assert out["a"].mae < 0.10 * 200
    assert out["short"].reason == "insufficient_segment"
    assert out["indoor"].reason == "indoor_session"
    assert out["nan"].reason == "non_finite_measured_power"
    assert all(not out[k].calibrated for k in ("short", "indoor", "nan"))
