"""Sessionization: split per-user event streams into sessions on inactivity
gaps — the canonical custom stateful operator.

Two execution shapes over the same semantics (gap > timeout ⇒ new session):

- Batch: lag + cumulative-sum window — two passes over one shuffle on
  user_id, fully expressible in SQL (oracle-checkable, q35).
- Streaming: ``applyInPandasWithState`` with a per-user session state and
  event-time timeout — the Structured Streaming path for unbounded input
  (tested via the replay stream; not SQL-expressible by nature).
"""

from __future__ import annotations

import datetime as dt
from typing import Any, Iterator

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

DEFAULT_GAP_MINUTES = 30


def sessionize_batch(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    gap_minutes: int = DEFAULT_GAP_MINUTES,
    tiebreak: list[str] | None = None,
) -> DataFrame:
    """Assign session ids and aggregate one row per session.

    session boundary: this event starts a new session iff there is no
    previous event for the user within gap_minutes. The session id is the
    running count of boundaries (cumulative sum), so ids are 1..K per user
    in time order — deterministic given a (ts, tiebreak) ordering.
    """
    w_order = Window.partitionBy(user_col).orderBy(ts_col, *(tiebreak or []))
    prev_ts = F.lag(ts_col).over(w_order)
    # NTZ timestamps can't cast straight to double; go via TIMESTAMP (an
    # identity under the UTC session zone) to get epoch seconds with the
    # microsecond fraction intact — exact parity with an INTERVAL comparison.
    def secs(c):
        return c.cast("timestamp").cast("double")

    is_new = (
        prev_ts.isNull()
        | (secs(F.col(ts_col)) - secs(prev_ts) > gap_minutes * 60)
    ).cast("bigint")
    w_run = w_order.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    with_session = df.withColumn("session_id", F.sum(is_new).over(w_run))
    return (
        with_session.groupBy(user_col, "session_id")
        .agg(
            F.min(ts_col).alias("session_start"),
            F.max(ts_col).alias("session_end"),
            F.count(F.lit(1)).alias("n_events"),
        )
    )


SESSION_STATE_SCHEMA = "start timestamp, last timestamp, n bigint"
SESSION_OUTPUT_SCHEMA = (
    "user_id bigint, session_start timestamp, session_end timestamp, n_events bigint"
)


def sessionize_stream(
    df: DataFrame,
    gap_minutes: int = DEFAULT_GAP_MINUTES,
) -> DataFrame:
    """Streaming sessionization with applyInPandasWithState.

    State per user: (session start, last event ts, count). A session closes
    when the event-time watermark passes last+gap (state timeout), emitting
    one row. Requires a watermark on the input's ``ts`` column.
    """
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    gap = dt.timedelta(minutes=gap_minutes)

    def update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        closed: list[dict[str, Any]] = []
        if state.hasTimedOut:
            start, last, n = state.get
            closed.append(
                {
                    "user_id": user_id,
                    "session_start": start,
                    "session_end": last,
                    "n_events": n,
                }
            )
            state.remove()
        else:
            # A numpy gap scan was tried here (r13) and REVERTED: per-key
            # batches are ~20 rows in this workload, so the per-group
            # ndarray/DatetimeIndex setup cost more than the row loop it
            # replaced (measured ~+0.5 s on q99). The cheap wins stay:
            # skip the concat for the common single-chunk case, and skip
            # building an output frame when nothing closed.
            chunks = list(pdfs)
            events = chunks[0] if len(chunks) == 1 else pd.concat(chunks)
            events = events.sort_values("ts")
            start, last, n = state.get if state.exists else (None, None, 0)
            for ts in events["ts"]:
                ts = ts.to_pydatetime()
                if last is not None and ts - last > gap:
                    closed.append(
                        {
                            "user_id": user_id,
                            "session_start": start,
                            "session_end": last,
                            "n_events": n,
                        }
                    )
                    start, last, n = None, None, 0
                if start is None:
                    start = ts
                last, n = ts, n + 1
            state.update((start, last, n))
            state.setTimeoutTimestamp(
                int(last.timestamp() * 1000) + int(gap.total_seconds() * 1000)
            )
        if closed:
            yield pd.DataFrame(
                closed,
                columns=["user_id", "session_start", "session_end", "n_events"],
            )

    return df.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=SESSION_OUTPUT_SCHEMA,
        stateStructType=SESSION_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
