"""Custom stateful streaming operator: user sessionization with
``applyInPandasWithState``.

The batch engine sessionizes with a lag/cumsum window (gate query
``sessionize``); on an unbounded stream the same semantics need keyed
state: per user, an open session (start, last_ts, n_events) that closes
when the gap exceeds the timeout — emitted on close (or on state timeout
for stragglers). This is the ``applyInPandasWithState`` pattern from the
Structured Streaming guide: state schema + output schema + per-key pandas
batches.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

SESSION_OUTPUT_SCHEMA = (
    "user_id long, session_start timestamp, session_end timestamp, n_events long"
)
SESSION_STATE_SCHEMA = "start long, last long, n long"


def sessionize_stream(
    events: DataFrame,
    gap_seconds: int = 1800,
    ts_col: str = "ts",
    key_col: str = "user_id",
    straggler_timeout: bool = False,
) -> DataFrame:
    """Streaming sessionization: emits one row per CLOSED session.

    Sessions close when a later event for the same user arrives more than
    ``gap_seconds`` after the previous one. ``straggler_timeout=True``
    additionally emits open sessions after 60s of processing-time silence
    — for LONG-RUNNING deployments only: a processing-time timeout keeps
    the query permanently busy (each batch's timeouts schedule the next
    batch), so drain-style runs (availableNow + processAllAvailable) must
    leave it off or they never quiesce."""
    import pandas as pd

    gap_us = gap_seconds * 1_000_000

    def fn(key, pdfs, state: GroupState):
        (user_id,) = key
        if state.hasTimedOut:
            start, last, n = state.get
            state.remove()
            yield pd.DataFrame(
                {
                    "user_id": [user_id],
                    "session_start": [pd.Timestamp(start, unit="us")],
                    "session_end": [pd.Timestamp(last, unit="us")],
                    "n_events": [n],
                }
            )
            return

        ts_list = []
        for pdf in pdfs:
            ts_list.extend(pdf[ts_col].astype("datetime64[us]").astype("int64").tolist())
        ts_list.sort()

        if state.exists:
            start, last, n = state.get
        else:
            start, last, n = None, None, 0

        closed = []
        for t in ts_list:
            if start is None:
                start, last, n = t, t, 1
            elif t - last > gap_us:
                closed.append((start, last, n))
                start, last, n = t, t, 1
            else:
                last, n = t, n + 1
        state.update((start, last, n))
        if straggler_timeout:
            state.setTimeoutDuration(60_000)
        if closed:
            yield pd.DataFrame(
                {
                    "user_id": [user_id] * len(closed),
                    "session_start": [pd.Timestamp(s, unit="us") for s, _, _ in closed],
                    "session_end": [pd.Timestamp(e, unit="us") for _, e, _ in closed],
                    "n_events": [c for _, _, c in closed],
                }
            )

    return events.groupBy(key_col).applyInPandasWithState(
        fn,
        outputStructType=SESSION_OUTPUT_SCHEMA,
        stateStructType=SESSION_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=(
            GroupStateTimeout.ProcessingTimeTimeout
            if straggler_timeout
            else GroupStateTimeout.NoTimeout
        ),
    )
