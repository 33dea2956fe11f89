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
