"""Custom stateful session windows with EVENT-TIME TIMEOUT — the arbitrary-
state streaming pattern built-in session_window() cannot express (per-key
state that must finalize by TIMER when a user simply stops sending events,
not only when a later event closes the gap).

Operator contract (applyInPandasWithState, GroupStateTimeout.EventTimeTimeout):
- per user, maintain the open session (start_us, last_us, n);
- an in-batch event more than GAP after last_us CLOSES the open session
  (emitted immediately) and opens a new one;
- a user going quiet closes their session by TIMEOUT: we arm the timer at
  last_us + GAP, and Spark invokes the function with hasTimedOut once the
  event-time watermark passes it — bounded state with no poison-pill keys.

Determinism: within a batch events are sorted by (ts_us, event_id); across
batches the harness splits the file by time, so state continuation across
the batch boundary is exercised (a session spanning the split stays one
session).  The emitted set is exactly SQL-expressible: every gaps-and-
islands session EXCEPT each user's last, plus the last where
last_us + GAP <= final watermark — which is the DuckDB oracle in
queries_stream.q_stream_session_timeout.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

GAP_US = 5 * 60 * 1_000_000

OUT_SCHEMA = (
    "user_id bigint, session_start_us bigint, session_end_us bigint, n bigint"
)
STATE_SCHEMA = "start_us bigint, last_us bigint, n bigint"


def _session_update(
    key: tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    uid = int(key[0])
    closed: list[tuple[int, int, int, int]] = []

    if state.hasTimedOut:
        start, last, n = state.get
        closed.append((uid, start, last, n))
        state.remove()
        yield pd.DataFrame(
            closed,
            columns=["user_id", "session_start_us", "session_end_us", "n"],
        )
        return

    ts_all: list[int] = []
    for pdf in pdfs:
        ts_all.extend(int(v) for v in pdf["ts_us"])
    ts_all.sort()

    start, last, n = state.get if state.exists else (None, None, 0)
    for ts in ts_all:
        if start is None:
            start, last, n = ts, ts, 1
        elif ts - last < GAP_US:
            # min/max guards: a cross-batch out-of-order event (admitted —
            # it is above the watermark) must never move the session END
            # backwards (that would split the session on the next event and
            # arm the timeout timer too early) nor leave the START after it
            start, last, n = min(start, ts), max(last, ts), n + 1
        else:
            closed.append((uid, start, last, n))
            start, last, n = ts, ts, 1
    if start is not None:
        state.update((start, last, n))
        # arm the event-time timer: fires once the watermark passes the gap
        state.setTimeoutTimestamp(last // 1000 + GAP_US // 1000)
    yield pd.DataFrame(
        closed, columns=["user_id", "session_start_us", "session_end_us", "n"]
    )


def session_timeout_totals(events: DataFrame) -> DataFrame:
    """Apply the timeout-closed session operator; ``events`` must be a
    watermarked stream_events() frame (EventTimeTimeout requires it)."""
    from ..shipping import ensure_pkg_shipped

    ensure_pkg_shipped(events.sparkSession)
    return (
        events.select("user_id", "ts_us", "ts")
        .groupBy("user_id")
        .applyInPandasWithState(
            _session_update,
            outputStructType=OUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


def run_sessions_to_memory(spark, events_dir: str, name: str) -> DataFrame:
    """Drive the operator with one file per micro-batch (time-split files =
    sessions span batch boundaries) and return the emitted closed sessions."""
    from .windows import stream_events

    ev = stream_events(spark, events_dir, watermark="30 minutes",
                       max_files_per_trigger=1)
    q = (
        session_timeout_totals(ev)
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.table(name)
