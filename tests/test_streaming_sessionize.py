"""Gap-sessionization: stream/batch parity + idle-timeout flush.

The streaming operator (applyInPandasWithState) must emit exactly the
closed sessions the batch twin computes — fed the same events, closed
either by a later same-user event exceeding the gap or by the
event-time watermark passing last_seen + gap.
"""

import datetime as dt

from pyspark.sql import functions as F

from cyclegraph_spark.streaming.sessionize import sessionize_batch, sessionize_stream

GAP_S = 21_600  # 6 h


def _phase1(spark):
    """A deterministic slice of the seeded events table (5 users)."""
    return (
        spark.read.parquet("/root/testdata/sf0.001/events.parquet")
        .filter(F.col("user_id") < 5)
        .select("user_id", F.col("ts").cast("timestamp").alias("ts"), "value")
    )


def _run_stream(spark, tmp_path, phases, watermark="1 minute"):
    """Feed parquet phases through the stream; return collected rows.

    Each phase is coalesced to ONE part file so it appears in the source
    directory atomically (a single rename). A multi-file append races
    with the already-running query's continuous triggers: a trigger can
    list a PARTIAL set of the phase's committed part files, and if the
    remainder lands in a later micro-batch out of time order, the
    operator's documented min/max late-merge folds events across a gap
    that an ordered delivery would split — a harness-induced disorder,
    seen as a rare in-suite-only mega-merged-session flake (r5). The
    operator's contract is order-tolerant only up to the watermark;
    these tests exercise IN-ORDER delivery, so delivery must be atomic.
    """
    src = str(tmp_path / "stream_src")
    sink = "sessions_out_" + tmp_path.name
    phases[0].coalesce(1).write.parquet(src)
    stream = spark.readStream.schema(phases[0].schema).parquet(src)
    q = (
        sessionize_stream(stream, gap_s=GAP_S, watermark=watermark)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName(sink)
        .start()
    )
    try:
        q.processAllAvailable()
        for ph in phases[1:]:
            ph.coalesce(1).write.mode("append").parquet(src)
            q.processAllAvailable()
        rows = spark.sql(f"SELECT * FROM {sink}").collect()
    finally:
        q.stop()
    return rows


def test_sessionize_stream_matches_batch(spark, tmp_path):
    p1 = _phase1(spark)
    # phase 2: one far-future "closer" event per user — each user's open
    # session closes via the in-batch gap rule, deterministically
    far = dt.datetime(2031, 1, 1)
    users = [r.user_id for r in p1.select("user_id").distinct().collect()]
    p2 = spark.createDataFrame(
        [(u, far, 0.0) for u in users], "user_id long, ts timestamp, value double"
    )

    got = {
        (r.user_id, r.session_start, r.session_end, r.n_events, round(r.total_value, 6))
        for r in _run_stream(spark, tmp_path, [p1, p2])
    }
    exp = {
        (r.user_id, r.session_start, r.session_end, r.n_events, round(r.total_value, 6))
        for r in sessionize_batch(p1, gap_s=GAP_S).collect()
    }
    assert got == exp, (
        f"missing={sorted(exp - got)[:3]} extra={sorted(got - exp)[:3]}"
    )
    assert len(exp) > len(users), "gap too wide — one session per user is no evidence"


def test_sessionize_late_event_merges_into_open_session(spark, tmp_path):
    """A late above-watermark event arriving in a LATER micro-batch must
    extend the open session with running min/max bounds — the old
    first/latest fold regressed last-seen below the true max and emitted
    a session with end < start (ADVICE r2)."""
    t0 = dt.datetime(2030, 1, 1, 12, 0, 0)
    p1 = spark.createDataFrame(
        [(1, t0 + dt.timedelta(minutes=10), 5.0),
         (1, t0 + dt.timedelta(minutes=20), 7.0)],
        "user_id long, ts timestamp, value double",
    )
    # late by 20 min but above the 30-min watermark → must reach state
    p2 = spark.createDataFrame(
        [(1, t0, 1.0)], "user_id long, ts timestamp, value double"
    )
    p3 = spark.createDataFrame(  # far-future closer
        [(1, dt.datetime(2031, 1, 1), 0.0)],
        "user_id long, ts timestamp, value double",
    )
    rows = [
        r
        for r in _run_stream(spark, tmp_path, [p1, p2, p3], watermark="30 minutes")
        if r.session_start < dt.datetime(2030, 6, 1)
    ]
    assert len(rows) == 1
    s = rows[0]
    assert s.session_start == t0
    assert s.session_end == t0 + dt.timedelta(minutes=20)
    assert s.n_events == 3 and abs(s.total_value - 13.0) < 1e-9


def test_sessionize_late_event_then_near_boundary_follower(spark, tmp_path):
    """Cross-batch disorder, the full adversarial shape: a late
    above-watermark event lands INSIDE the open session in a later
    micro-batch, then a follower arrives just under the gap from the
    TRUE last-seen (the session max). A fold that regressed last-seen to
    the late event's timestamp would measure follower − late > gap and
    wrongly split the session; the min/max fold must keep all four
    events in ONE session (regression pin for the r2 fold bug's
    split-side failure mode, not just the end < start symptom)."""
    t0 = dt.datetime(2030, 1, 1, 12, 0, 0)
    p1 = spark.createDataFrame(
        [(1, t0 + dt.timedelta(minutes=10), 5.0),
         (1, t0 + dt.timedelta(minutes=20), 7.0)],
        "user_id long, ts timestamp, value double",
    )
    # late by 20 min, above the 30-min watermark → reaches state
    p2 = spark.createDataFrame(
        [(1, t0, 1.0)], "user_id long, ts timestamp, value double"
    )
    # follower: gap-1min after the true max (t0+20min) — same session iff
    # last-seen was NOT regressed by the late event (t0 + gap would split)
    follower = t0 + dt.timedelta(minutes=20, seconds=GAP_S - 60)
    p3 = spark.createDataFrame(
        [(1, follower, 2.0)], "user_id long, ts timestamp, value double"
    )
    p4 = spark.createDataFrame(  # far-future closer
        [(1, dt.datetime(2031, 1, 1), 0.0)],
        "user_id long, ts timestamp, value double",
    )
    rows = [
        r
        for r in _run_stream(
            spark, tmp_path, [p1, p2, p3, p4], watermark="30 minutes"
        )
        if r.session_start < dt.datetime(2030, 6, 1)
    ]
    assert len(rows) == 1, f"session wrongly split: {rows}"
    s = rows[0]
    assert s.session_start == t0
    assert s.session_end == follower
    assert s.n_events == 4 and abs(s.total_value - 15.0) < 1e-9


def test_sessionize_stream_matches_batch_random_streams(spark, tmp_path):
    """Randomized stream/batch parity: seeded random event streams,
    delivered in timestamp order across a random number of micro-batch
    phases (so session state spans arbitrary batch boundaries), must
    close exactly the sessions the batch twin computes. Complements the
    fixed-shape parity test and the two adversarial late-event pins."""
    import random

    rng = random.Random(20260817)
    t0 = dt.datetime(2030, 1, 1)
    events = []
    for _ in range(300):
        events.append(
            (
                rng.randrange(4),
                t0
                + dt.timedelta(
                    # clusters 2×gap apart with up-to-2h jitter: occupied
                    # clusters become distinct sessions (many splits) while
                    # each holds several events (multi-event sessions)
                    seconds=rng.randrange(40) * GAP_S * 2
                    + rng.randrange(7200),
                    microseconds=rng.randrange(1_000_000),
                ),
                float(rng.randrange(-50, 50)),
            )
        )
    events.sort(key=lambda e: e[1])  # in-order delivery: no late drops
    cuts = sorted(rng.sample(range(1, len(events)), 3))
    phases = [
        spark.createDataFrame(
            events[a:b], "user_id long, ts timestamp, value double"
        )
        for a, b in zip([0] + cuts, cuts + [len(events)])
    ]
    far = dt.datetime(2031, 1, 1)
    closer = spark.createDataFrame(
        [(u, far, 0.0) for u in range(4)],
        "user_id long, ts timestamp, value double",
    )
    got = {
        (r.user_id, r.session_start, r.session_end, r.n_events, round(r.total_value, 6))
        for r in _run_stream(spark, tmp_path, phases + [closer])
        if r.session_start < dt.datetime(2030, 6, 1)
    }
    all_events = spark.createDataFrame(
        events, "user_id long, ts timestamp, value double"
    )
    exp = {
        (r.user_id, r.session_start, r.session_end, r.n_events, round(r.total_value, 6))
        for r in sessionize_batch(all_events, gap_s=GAP_S).collect()
    }
    assert got == exp, (
        f"missing={sorted(exp - got)[:3]} extra={sorted(got - exp)[:3]}"
    )
    assert len(exp) > 8, "degenerate corpus — too few sessions to be evidence"


def test_sessionize_idle_timeout_flush(spark, tmp_path):
    """A user who never comes back must still get their session emitted
    once the watermark (advanced by OTHER users' events) passes
    last_seen + gap — the EventTimeTimeout path."""
    t0 = dt.datetime(2030, 1, 1, 12, 0, 0)
    p1 = spark.createDataFrame(
        [(1, t0, 5.0), (1, t0 + dt.timedelta(minutes=10), 7.0)],
        "user_id long, ts timestamp, value double",
    )
    # sentinel user far past 1's gap — advances the global watermark
    p2 = spark.createDataFrame(
        [(999, t0 + dt.timedelta(days=2), 0.0)],
        "user_id long, ts timestamp, value double",
    )
    # a third phase gives the engine a trigger in which the (now passed)
    # timeout can fire
    p3 = spark.createDataFrame(
        [(999, t0 + dt.timedelta(days=2, minutes=1), 0.0)],
        "user_id long, ts timestamp, value double",
    )
    rows = _run_stream(spark, tmp_path, [p1, p2, p3])
    mine = [r for r in rows if r.user_id == 1]
    assert len(mine) == 1
    assert mine[0].n_events == 2 and abs(mine[0].total_value - 12.0) < 1e-9
    assert mine[0].session_start == t0
