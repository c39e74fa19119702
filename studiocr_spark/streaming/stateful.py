"""Custom stateful streaming operator: session windows via
``applyInPandasWithState``.

The batch engine sessionizes with lag+cumsum (see entry
``sessionize_events``); the streaming equivalent cannot — sessions span
micro-batches — so per-key state carries the open session across
triggers. A session CLOSES when a new event arrives more than
``gap_sec`` after the last one (the closed session is emitted and a new
one opens) or when the state times out (no events for the processing-
time timeout → emit and clear).

This is the ``applyInPandasWithState`` shape from the Structured
Streaming docs: func(key, batch_iter, GroupState) -> Iterator[pdf],
output mode "append", ProcessingTimeTimeout.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = (
    "user_id long, session_start timestamp, session_end timestamp, "
    "n_events long, total_value double"
)
STATE_SCHEMA = "start long, last long, n long, total double"


def sessionize_stateful(
    events: DataFrame,
    gap_sec: int = 1800,
    timeout_ms: int = 30000,
) -> DataFrame:
    """events(user_id, ts, value, ...) stream -> closed-session rows."""

    def fn(
        key: tuple,
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        closed: list[tuple] = []

        if state.hasTimedOut:
            if state.exists:
                start, last, n, total = state.get
                closed.append((user_id, start, last, n, total))
                state.remove()
        else:
            if state.exists:
                start, last, n, total = state.get
                cur = (start, last, n, total)
            else:
                cur = None
            rows = pd.concat(list(pdfs), ignore_index=True)
            if len(rows):
                rows = rows.sort_values("ts")
                for ts, value in zip(rows["ts"], rows["value"]):
                    t = int(pd.Timestamp(ts).value // 1_000_000_000)
                    if cur is None:
                        cur = (t, t, 1, float(value))
                    elif t - cur[1] > gap_sec:
                        closed.append((user_id, *cur))
                        cur = (t, t, 1, float(value))
                    else:
                        cur = (cur[0], t, cur[2] + 1, cur[3] + float(value))
            if cur is not None:
                state.update(cur)
                state.setTimeoutDuration(timeout_ms)

        if closed:
            out = pd.DataFrame(
                closed,
                columns=[
                    "user_id", "session_start", "session_end",
                    "n_events", "total_value",
                ],
            )
            out["session_start"] = pd.to_datetime(out["session_start"], unit="s")
            out["session_end"] = pd.to_datetime(out["session_end"], unit="s")
            yield out

    return (
        events.select("user_id", "ts", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            fn,
            OUTPUT_SCHEMA,
            STATE_SCHEMA,
            "append",
            GroupStateTimeout.ProcessingTimeTimeout,
        )
    )
