"""Event-time-timeout session operator (streaming/sessions.py): cross-batch
session continuation, timer-fired closes, and watermark-withheld tails —
asserted on a hand-built two-batch scenario with exact expected sessions."""

from __future__ import annotations

import os
import time

import pandas as pd

from pipeline_calculator_v3_spark.streaming.sessions import run_sessions_to_memory

US = 1_000_000
MIN = 60 * US
T0 = 1_704_067_200 * US  # 2024-01-01 00:00:00 UTC, aligned for readability


def _write(path, rows, mtime):
    """rows: list of (user_id, ts_us)."""
    pd.DataFrame(
        {
            "event_id": range(len(rows)),
            "ts": pd.to_datetime(
                [t for _, t in rows], unit="us"
            ).astype("datetime64[us]"),
            "user_id": [u for u, _ in rows],
            "event_type": ["click"] * len(rows),
            "value": [1.0] * len(rows),
            "props": ["{}"] * len(rows),
        }
    ).to_parquet(path, index=False)
    os.utime(path, (mtime, mtime))


def test_sessions_span_batches_and_close_by_timer(spark, tmp_path):
    d = str(tmp_path / "sess")
    os.makedirs(d)
    HOUR = 60 * MIN
    split = T0 + 3 * HOUR
    # u1: session SPANNING the batch boundary (4 events, gaps < 5min),
    #     then nothing -> must close by TIMER as ONE session of 4
    u1 = [(1, split - 4 * MIN), (1, split - 1 * MIN),
          (1, split + 2 * MIN), (1, split + 4 * MIN)]
    # u2: batch-1-only session, quiet forever -> closed by timer
    u2 = [(2, T0), (2, T0 + 3 * MIN)]
    # u3: three sessions in batch 2 — {30,32min} closes IN-BATCH (20min gap),
    #     {52min} closes by timer, {end} is withheld by the final watermark
    end = split + 2 * HOUR
    u3 = [(3, split + 30 * MIN), (3, split + 32 * MIN),
          (3, split + 52 * MIN), (3, end)]
    now = time.time()
    _write(f"{d}/a.parquet", [r for r in u1 + u2 if r[1] < split], now - 60)
    _write(f"{d}/b.parquet", [r for r in u1 + u3 if r[1] >= split], now)

    got = sorted(
        (r.user_id, r.session_start_us, r.session_end_us, r.n)
        for r in run_sessions_to_memory(spark, d, "sess_unit").collect()
    )
    # final watermark = end - 30min; u3's last session (ends at `end`)
    # cannot time out; everything else closes (in-batch or by timer)
    expected = sorted(
        [
            (1, split - 4 * MIN, split + 4 * MIN, 4),
            (2, T0, T0 + 3 * MIN, 2),
            (3, split + 30 * MIN, split + 32 * MIN, 2),
            (3, split + 52 * MIN, split + 52 * MIN, 1),
        ]
    )
    assert got == expected, (got, expected)


def test_out_of_order_event_does_not_split_session(spark, tmp_path):
    """Regression: a cross-batch out-of-order event (above the watermark,
    within the gap) must extend the session backwards — never regress its
    END (which would split the session on the next event and arm the timer
    too early)."""
    d = str(tmp_path / "ooo")
    os.makedirs(d)
    now = time.time()
    HOUR = 60 * MIN
    # batch 1: u1 at T+100s
    _write(f"{d}/a.parquet", [(1, T0 + 100 * US)], now - 60)
    # batch 2: u1 at T+90s (out-of-order, within gap of 100s) and T+395s
    # (within gap of the TRUE last=100s: 295s < 300s) + a bump event that
    # advances the watermark far enough to time the session out
    _write(
        f"{d}/b.parquet",
        [(1, T0 + 90 * US), (1, T0 + 395 * US), (2, T0 + 2 * HOUR)],
        now,
    )
    got = [
        (r.user_id, r.session_start_us, r.session_end_us, r.n)
        for r in run_sessions_to_memory(spark, d, "sess_ooo").collect()
        if r.user_id == 1
    ]
    # ONE session covering all three events — a last-regression bug would
    # emit two (one ending at T+90s, before its own start)
    assert got == [(1, T0 + 90 * US, T0 + 395 * US, 3)], got


def test_straggler_behind_watermark_closes_immediately(spark, tmp_path):
    """Regression (r04 advice, medium): Spark rejects timer timestamps at or
    below the current watermark with IllegalArgumentException, failing the
    whole query.  A straggler whose session end already trails the watermark
    by more than GAP therefore cannot arm a timer — the session must close
    immediately (exactly when its timer would have fired)."""
    d = str(tmp_path / "clamp")
    os.makedirs(d)
    now = time.time()
    HOUR = 60 * MIN
    # batch 1: watermark bump only -> wm for batch 2 = T0+90min
    _write(f"{d}/a.parquet", [(2, T0 + 2 * HOUR)], now - 60)
    # batch 2: u1 straggler at T0+1min — its timeout (T0+6min) is far behind
    # the T0+90min watermark, so the timer is un-armable by contract
    _write(f"{d}/b.parquet", [(1, T0 + 1 * MIN)], now)
    got = [
        (r.session_start_us, r.session_end_us, r.n)
        for r in run_sessions_to_memory(spark, d, "sess_clamp").collect()
        if r.user_id == 1
    ]
    assert got == [(T0 + 1 * MIN, T0 + 1 * MIN, 1)], got


def test_straggler_beyond_gap_forms_own_session(spark, tmp_path):
    """Regression (r04 review): an admitted out-of-order event more than GAP
    BEFORE the open session must form its own earlier session — the naive
    `ts - last < GAP` comparison is true for ANY earlier timestamp and
    merged it."""
    d = str(tmp_path / "straggle")
    os.makedirs(d)
    now = time.time()
    HOUR = 60 * MIN
    # batch 1: u1 at T+2000s (opens the session; watermark still low)
    _write(f"{d}/a.parquet", [(1, T0 + 2000 * US)], now - 60)
    # batch 2: u1 straggler at T+1000s (1000s before start, >= 300s gap)
    #          + bump to advance the watermark so both sessions time out
    _write(f"{d}/b.parquet", [(1, T0 + 1000 * US), (2, T0 + 2 * HOUR)], now)
    got = sorted(
        (r.session_start_us, r.session_end_us, r.n)
        for r in run_sessions_to_memory(spark, d, "sess_straggle").collect()
        if r.user_id == 1
    )
    assert got == [
        (T0 + 1000 * US, T0 + 1000 * US, 1),
        (T0 + 2000 * US, T0 + 2000 * US, 1),
    ], got
