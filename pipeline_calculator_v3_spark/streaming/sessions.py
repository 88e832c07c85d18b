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

Determinism: within a batch events are sorted; across batches the harness
splits the file by time, so state continuation across the batch boundary is
exercised (a session spanning the split stays one session).  The emitted
set is exactly SQL-expressible: every gaps-and-islands session EXCEPT each
user's last, plus the last where the timer fired — the DuckDB oracle in
queries_stream.q_stream_session_timeout.

Out-of-order contract (r04): each batch merges its events with the open
session by interval gaps-and-islands, so an admitted straggler lands
correctly before, inside, or after the open session.  Sessions separated
from the open one by >= GAP finalize at arrival time; a LATER batch whose
stragglers would retroactively bridge an already-finalized session into the
open one is out of contract (exact replay there requires deferring every
emission until the watermark passes it — the production extension would
keep a pending-session list in state and emit on timer only).  Spark does
NOT pre-filter late input for stateful functions (measured in r04 for
aggregations too); callers needing a hard lateness gate filter
``ts < watermark`` themselves before the groupBy.
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

    # Gaps-and-islands over intervals: each new event is a [ts, ts] point;
    # the open session from state is an opaque [start, last] interval whose
    # INTERIOR gaps are already < GAP (invariant of how it was built), so
    # two sorted items merge iff next.start - cur.end < GAP.  This is
    # correct for ANY admitted out-of-order arrival — before the open
    # session, inside it, or after it (the r04 review found the naive
    # `ts - last < GAP` comparison merged arbitrarily-early stragglers).
    items: list[list[int]] = [[int(v), int(v), 1] for pdf in pdfs
                              for v in pdf["ts_us"]]
    if state.exists:
        s0, l0, n0 = state.get
        items.append([s0, l0, n0])
    items.sort()

    merged: list[list[int]] = []
    for it in items:
        if merged and it[0] - merged[-1][1] < GAP_US:
            merged[-1][1] = max(merged[-1][1], it[1])
            merged[-1][2] += it[2]
        else:
            merged.append(it)
    closed.extend((uid, s, l, n) for s, l, n in merged[:-1])
    if merged:
        start, last, n = merged[-1]
        timeout_ms = last // 1000 + GAP_US // 1000
        wm = state.getCurrentWatermarkMs()
        # An admitted straggler can merge into a session whose end already
        # trails the watermark by more than GAP.  Spark rejects timer
        # timestamps <= watermark with IllegalArgumentException (failing the
        # whole query), so a session STRICTLY below the watermark closes
        # immediately — exactly when its timer would have fired had it
        # been armable (timers fire on wm STRICTLY past the timestamp).
        # At exact equality the timer has NOT notionally fired yet, so the
        # session stays open, armed at wm + 1 — the earliest armable
        # instant (review r11: the <= guard closed the equality case one
        # advance early, diverging from the measured timer semantics the
        # oracle pins).  Under the same strictly-greater fire rule that
        # wm+1 timer fires once the watermark passes wm+1, i.e. after an
        # advance of >= 2 ms; a 1 ms advance leaves the session pending
        # one extra trigger (ADVICE r11).  That bounded extra-millisecond
        # latency is accepted: closing at equality instead would fire the
        # timer at an instant Spark's own rule says has not arrived.
        if timeout_ms < wm:
            closed.append((uid, start, last, n))
            if state.exists:
                state.remove()
        else:
            state.update((start, last, n))
            # arm the event-time timer: fires once the watermark passes it
            state.setTimeoutTimestamp(max(timeout_ms, wm + 1))
    yield pd.DataFrame(
        closed, columns=["user_id", "session_start_us", "session_end_us", "n"]
    )


def session_timeout_totals(events: DataFrame) -> DataFrame:
    """Apply the timeout-closed session operator; ``events`` must be a
    watermarked stream_events() frame (EventTimeTimeout requires it).

    Contract: event time must be post-1970.  Spark's event-time watermark
    is floored at zero and timers below it are unarmable, so a
    negative-epoch session closes at first sight — Spark engine behavior,
    not a tunable (review r13; the batch oracle's unfloored max(ts)-delay
    would diverge on such fixtures; every shipped fixture is
    positive-epoch)."""
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

    from .drain import drain_to_memory

    ev = stream_events(spark, events_dir, watermark="30 minutes",
                       max_files_per_trigger=1)
    return drain_to_memory(session_timeout_totals(ev), name)
