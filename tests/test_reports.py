"""W4 trend / J4 baseline / T11 matrix contract on report rows."""

import datetime

from pyspark.sql import functions as F

from cyclegraph_spark.operators.reports import (
    T11_COLUMNS,
    t11_matrix,
    with_baseline_28d,
    with_trend,
)


def _reports(spark):
    base = datetime.date(2024, 3, 1)
    rows = []
    for i in range(10):
        rows.append(
            (
                f"s{i}",
                base + datetime.timedelta(days=i * 3),
                3600.0 + (i % 3) * 100,
                60.0 + i,  # cgs rising
                1.4 + 0.01 * i,
                2.5,
                200.0 + i,
            )
        )
    return spark.createDataFrame(
        rows,
        "session_id string, report_date date, duration_s double, cgs double, "
        "w_per_beat double, precision_watt double, avg_power double",
    )


def test_trend_last3(spark):
    df = with_trend(_reports(spark)).orderBy("report_date")
    rows = df.collect()
    assert rows[0].cgs_last3_avg is None  # no history yet
    # row 3: avg of cgs 60,61,62 = 61.0; delta = (63-61)/61*100
    assert rows[3].cgs_last3_avg == 61.0
    assert rows[3].cgs_delta_vs_last3 == round((63 - 61) / 61 * 100, 2)


def test_baseline_28d_band(spark):
    df = with_baseline_28d(_reports(spark))
    rows = {r.session_id: r for r in df.collect()}
    assert rows["s0"].baseline_n == 0 and rows["s0"].baseline_wpb is None
    # s9 (day 27): candidates = prior reports within 28 days and ±25% dur
    assert rows["s9"].baseline_n > 0
    assert rows["s9"].wpb_vs_baseline is not None
    # every baseline is an exact median of w_per_beat values (1.4-1.49)
    for r in rows.values():
        if r.baseline_wpb is not None:
            assert 1.39 < r.baseline_wpb < 1.5


def test_t11_matrix_contract(spark):
    """tests/test_t11_matrix_csv.py analog: exact 12-column header,
    exactly 5 rides, watt fields castable/non-empty."""
    m = t11_matrix(_reports(spark).limit(5))
    assert m.columns == T11_COLUMNS
    rows = m.collect()
    assert len(rows) == 5
    for r in rows:
        for col in ("precision_watt", "drag_watt", "rolling_watt", "total_watt"):
            v = r[col]
            assert v is not None and float(v) == v


def test_badges_v22_null_safety(spark):
    """Badges v2.2: NULL metrics (missing HR / no baseline degrade rules)
    never award a badge; thresholds are inclusive per docs/CGS_v1.md."""
    from cyclegraph_spark.operators.reports import with_badges_v22

    rows = [
        # wpb, baseline, dur_s, vi, pa_hr, precision, calibrated, n
        (2.13, 2.0, 1800.0, 1.05, 1.05, 3.0, True, 30),   # at/above every threshold
        # (2.0 * 1.06 is 2.1200000000000002 in binary — wpb 2.12 would
        # sit just BELOW the product; the fixture uses 2.13 to stay clear)
        (2.11, 2.0, 1800.0, 1.06, 1.05, 3.01, True, 30),  # big off by ratio, metro off by vi, dialed off by pw
        (None, 2.0, 1800.0, None, 1.0, None, True, 30),   # nulls -> never awarded
        (2.2, None, 4000.0, 1.0, 1.0, 1.0, False, 50),    # no baseline / not calibrated
    ]
    df = spark.createDataFrame(
        rows,
        "w_per_beat double, baseline_wpb double, duration_s double, vi double,"
        " pa_hr double, precision_watt double, calibrated boolean, n_samples int",
    )
    got = [
        (r.badge_big_engine, r.badge_metronome, r.badge_dialed_in)
        for r in with_badges_v22(df).collect()
    ]
    assert got == [
        (True, True, True),
        (False, False, False),
        (False, False, False),  # NULL wpb/vi/precision → nothing awarded
        (False, True, False),
    ]
