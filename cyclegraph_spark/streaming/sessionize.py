"""Gap-based sessionization — batch twin + custom stateful streaming op.

The reference's incremental import groups samples into activity sessions
by inactivity gaps between timestamps (/root/reference/cli/
strava_import.py:289-313 resumes at the last-seen boundary; session
boundaries themselves are the reference's CSV-file granularity). At web
scale the same semantics become a streaming operator: events arrive
continuously per user, a session closes when the user is idle longer
than ``gap``.

Two implementations with identical closed-session output:

- ``sessionize_batch`` — pure DataFrame: lag(ts) over (user, ts),
  gap-exceeded marks start a new session, running sum of marks is the
  session ordinal, one groupBy aggregates the session row. Two shuffles
  (window + agg) both keyed on user_id, so AQE coalesces them into the
  same exchange where possible. This is the oracle-checkable path.
- ``sessionize_stream`` — Structured Streaming with
  ``applyInPandasWithState`` (arbitrary stateful processing, Arrow
  batches — the sanctioned vectorized-Python surface, no per-row
  Python): state is the one OPEN session per user; a batch's events
  fold into it, closing sessions whenever the gap is exceeded;
  event-time timeout (watermark passing last_seen + gap) flushes idle
  sessions. Emits each closed session exactly once (append mode).

State size is O(active users), not O(events) — the operator holds one
16-byte-ish tuple per user, so 10^9 users fit a modest cluster's state
store; the per-batch work is one shuffle on user_id.

Out-of-order caveat: the stream folds with running MIN(start)/MAX(end),
so a late above-watermark event that belongs INSIDE the open session
(within ``gap`` of the running max) merges correctly across
micro-batches. A late event older than the open session's start by more
than ``gap`` cannot retroactively split an already-open session the way
a batch recompute would — that is the inherent watermark trade-off;
choose ``watermark`` ≥ the tolerated disorder.
"""

from __future__ import annotations

from typing import Iterator

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

SESSION_SCHEMA = (
    "user_id bigint, session_start timestamp, session_end timestamp, "
    "n_events bigint, total_value double"
)
_STATE_SCHEMA = "start_us bigint, last_us bigint, n bigint, total double"


def sessionize_batch(
    events: DataFrame,
    gap_s: int = 21600,
    user_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """(user, session ordinal) rows with start/end/count/sum.

    Output: (user_id, sess_id, session_start, session_end, n_events,
    total_value); sess_id is the 1-based per-user session ordinal.
    """
    w = Window.partitionBy(user_col).orderBy(ts_col)
    prev = F.lag(ts_col).over(w)
    # microsecond-exact gap test: unix_timestamp() truncates to whole
    # seconds, so a gap of gap_s + 0.4s would NOT open a session while
    # any sub-second-aware twin (the streaming op, the DuckDB oracle)
    # says it does — found as an off-by-one-session at sf0.1
    new_sess = F.when(
        prev.isNull()
        | (
            F.unix_micros(F.col(ts_col).cast("timestamp"))
            - F.unix_micros(prev.cast("timestamp"))
            > gap_s * 1_000_000
        ),  # testdata carries TIMESTAMP_NTZ; session tz is pinned UTC
        F.lit(1),
    ).otherwise(F.lit(0))
    marked = events.select(
        F.col(user_col).alias("user_id"),
        F.col(ts_col).alias("ts"),
        F.col(value_col).alias("value"),
        new_sess.alias("new_s"),
    )
    sess = marked.withColumn(
        "sess_id",
        F.sum("new_s").over(
            Window.partitionBy("user_id").orderBy("ts").rowsBetween(
                Window.unboundedPreceding, 0
            )
        ),
    )
    return sess.groupBy("user_id", "sess_id").agg(
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
        F.count(F.lit(1)).alias("n_events"),
        F.sum("value").alias("total_value"),
    )


def sessionize_stream(
    events: DataFrame,
    gap_s: int = 21600,
    watermark: str = "10 minutes",
) -> DataFrame:
    """Streaming sessionization over events(user_id, ts, value).

    Returns an append-mode stream of CLOSED sessions
    (user_id, session_start, session_end, n_events, total_value).
    A session closes either because a later event of the same user
    exceeded the gap (emitted with that batch), or because the
    event-time watermark passed last_seen + gap (idle flush via
    ``GroupStateTimeout.EventTimeTimeout``).
    """
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    gap_us = gap_s * 1_000_000

    def fold(key, pdf_iter: Iterator, state: GroupState) -> Iterator:
        import pandas as pd

        (uid,) = key
        closed: list[dict] = []

        def emit(start_us: int, last_us: int, n: int, total: float) -> None:
            closed.append(
                {
                    "user_id": uid,
                    "session_start": pd.Timestamp(start_us, unit="us"),
                    "session_end": pd.Timestamp(last_us, unit="us"),
                    "n_events": n,
                    "total_value": total,
                }
            )

        if state.hasTimedOut:
            start_us, last_us, n, total = state.get
            emit(start_us, last_us, n, total)
            state.remove()
        else:
            cur = state.get if state.exists else None
            batch = pd.concat(list(pdf_iter), ignore_index=True)
            batch = batch.sort_values("ts", kind="mergesort")
            ts_us = (batch["ts"].astype("int64") // 1000).to_numpy()  # ns → us
            vals = batch["value"].to_numpy()
            for t, v in zip(ts_us.tolist(), vals.tolist()):
                if cur is None:
                    cur = (t, t, 1, float(v))
                elif t - cur[1] > gap_us:
                    emit(*cur)
                    cur = (t, t, 1, float(v))
                else:
                    # running MIN/MAX, not first/latest: a late
                    # (out-of-order, above-watermark) event from a later
                    # micro-batch must extend the open session's bounds
                    # without regressing last-seen below the true max —
                    # otherwise the gap test against a stale last_us
                    # mis-splits a following near-boundary event
                    cur = (
                        min(cur[0], t),
                        max(cur[1], t),
                        cur[2] + 1,
                        cur[3] + float(v),
                    )
            state.update(cur)
            # flush when the event-time watermark passes last_seen + gap
            state.setTimeoutTimestamp((cur[1] + gap_us) // 1000)  # ms
        yield pd.DataFrame(
            closed,
            columns=[
                "user_id", "session_start", "session_end", "n_events", "total_value"
            ],
        )

    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            fold,
            outputStructType=SESSION_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
