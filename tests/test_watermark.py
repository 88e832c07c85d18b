"""Watermark semantics: a late event arriving after the watermark has passed
its window must be DROPPED from append-mode windowed aggregation — the state
eviction contract that makes unbounded streams bounded-memory."""

from __future__ import annotations

import os
import time

import pandas as pd
import pytest
from pyspark.sql import functions as F

US = 1_000_000
T0 = 1_700_000_000 * US  # an arbitrary whole-second epoch base


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


def test_late_event_dropped_by_watermark(spark, tmp_path):
    d = str(tmp_path / "stream")
    os.makedirs(d)
    now = time.time()
    # batch 1: 10:00:00, 10:01:00, 10:30:00 -> watermark advances to 10:20
    _write_events(
        f"{d}/b1.parquet",
        [T0, T0 + 60 * US, T0 + 30 * 60 * US],
        now - 60,
    )
    # batch 2: 10:02:00 (LATE: before the 10:20 watermark -> dropped)
    #          10:40:00 (advances watermark further)
    _write_events(
        f"{d}/b2.parquet",
        [T0 + 2 * 60 * US, T0 + 40 * 60 * US],
        now,
    )

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
    got = {r.ws: r.n for r in spark.table("wm_test").collect()}

    # the 10:00 window must have been finalized with 2 events — the late
    # 10:02 event from batch 2 arrived after the watermark and was dropped
    w0 = (T0 // (5 * 60 * US)) * 5 * 60 * US
    assert got.get(w0) == 2, got
