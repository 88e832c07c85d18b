"""Watermark semantics of append-mode windowed aggregation — asserting what
Spark 4.1 ACTUALLY does, measured on this exact engine version (r04):

1. Windows are FINALIZED (emitted) once the watermark passes their end;
   trailing windows are withheld — the bounded-state half of the contract.
2. Late input rows are NOT rejected: a row arriving after the watermark has
   passed its window is still admitted into state (even creating a brand-new
   state entry) and finalizes at the next watermark check.  The previous
   version of this test believed the late row was dropped — it only passed
   because the unaligned epoch base put the late row in a different window
   than the one asserted.  Hard input rejection is the contract of
   dropDuplicatesWithinWatermark / stream-stream join state, not of
   append-mode aggregation.
"""

from __future__ import annotations

import os
import time

import pandas as pd
from pyspark.sql import functions as F

US = 1_000_000
T0 = 1_700_000_000 * US  # arbitrary whole-second epoch base (NOT 5-min aligned)
W5 = 5 * 60 * US


def _write_events(path, rows, mtime):
    pd.DataFrame(
        {
            "event_id": range(len(rows)),
            "ts": [r * 1000 for r in rows],  # ns
            "user_id": [1] * len(rows),
            "event_type": ["click"] * len(rows),
            "value": [1.0] * len(rows),
            "props": ["{}"] * len(rows),
        }
    ).to_parquet(path, index=False)
    os.utime(path, (mtime, mtime))


def _window_start(ts_us: int) -> int:
    return (ts_us // W5) * W5


def test_append_mode_watermark_semantics(spark, tmp_path):
    d = str(tmp_path / "stream")
    os.makedirs(d)
    now = time.time()
    # batch 1: 10:00:00, 10:01:00, 10:30:00 -> watermark advances to 10:20
    b1 = [T0, T0 + 60 * US, T0 + 30 * 60 * US]
    _write_events(f"{d}/b1.parquet", b1, now - 60)
    # batch 2: 10:02:00 (late: its window end is far below the 10:20
    #          watermark — still ADMITTED, finalizes immediately)
    #          10:40:00 (advances watermark to 10:30)
    late, bump = T0 + 2 * 60 * US, T0 + 40 * 60 * US
    _write_events(f"{d}/b2.parquet", [late, bump], now)

    schema = (
        "event_id bigint, ts bigint, user_id bigint, event_type string, "
        "value double, props string"
    )
    raw = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .option("latestFirst", "false")
        .parquet(d)
    )
    ev = raw.withColumn("ts", F.expr("timestamp_micros(CAST(ts DIV 1000 AS BIGINT))"))
    agg = (
        ev.withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "5 minutes").alias("w"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
        .select(F.unix_micros(F.col("w.start")).alias("ws"), "n")
    )
    q = (
        agg.writeStream.format("memory")
        .queryName("wm_test")
        .outputMode("append")
        .start()
    )
    q.processAllAvailable()
    q.stop()
    got = sorted((r.ws, r.n) for r in spark.table("wm_test").collect())

    # Final watermark = 10:40 - 10min = 10:30.  Expected emissions:
    # - window(10:00, 10:01) finalized with n=2
    # - the LATE 10:02 row's window — admitted in batch 2, finalized at the
    #   same watermark check (T0 is not 5-min aligned, so 10:02 shares the
    #   10:00/10:01 window only if their floor matches; compute exactly)
    # - 10:30 and 10:40 windows withheld (their ends exceed the watermark)
    from collections import Counter

    expected = Counter()
    wm_final = bump - 10 * 60 * US
    for ts in b1 + [late]:
        if _window_start(ts) + W5 <= wm_final:
            expected[_window_start(ts)] += 1
    assert got == sorted(expected.items()), (got, sorted(expected.items()))
