"""Streaming window transformations, built batch-first.

The reference has no streaming semantics (SURVEY.md §1.4) — `events` is our
Structured Streaming surface.  Each transformation is ONE function applied to
either a batch DataFrame (oracle-checkable by DuckDB) or a readStream
DataFrame (with watermark) — the same code path, which is the whole point of
the Spark unified model.

Timestamps: events.ts is ns-parquet; the batch reader maps it to epoch-µs
(queries.events_t).  Outputs are epoch-µs longs for cross-engine parity.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

TUMBLE = "5 minutes"
SLIDE_SIZE = "10 minutes"
SLIDE_STEP = "5 minutes"
SESSION_GAP = "5 minutes"


def tumbling_counts(events: DataFrame) -> DataFrame:
    """5-minute tumbling windows per event_type: count + sum(value)."""
    return (
        events.groupBy(F.window("ts", TUMBLE).alias("w"), F.col("event_type"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum("value").alias("sum_value"),
        )
        .select(
            F.unix_micros(F.col("w.start")).alias("window_start_us"),
            "event_type", "n", "sum_value",
        )
    )


def sliding_counts(events: DataFrame) -> DataFrame:
    """10-minute windows sliding every 5: each event lands in 2 windows."""
    return (
        events.groupBy(F.window("ts", SLIDE_SIZE, SLIDE_STEP).alias("w"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.avg("value").alias("avg_value"),
        )
        .select(
            F.unix_micros(F.col("w.start")).alias("window_start_us"),
            "n", "avg_value",
        )
    )


def session_counts(events: DataFrame) -> DataFrame:
    """Per-user session windows with a 5-minute inactivity gap."""
    return (
        events.groupBy(F.session_window("ts", SESSION_GAP).alias("w"), F.col("user_id"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
        .select(
            "user_id",
            F.unix_micros(F.col("w.start")).alias("session_start_us"),
            "n",
        )
    )


def stream_events(spark, events_dir: str, watermark: str = "30 minutes",
                  max_files_per_trigger: int | None = None) -> DataFrame:
    """readStream twin of queries.events_t: ns-parquet -> µs timestamp +
    watermark for state eviction.

    The explicit user schema (``ts bigint``) makes the legacy nanos conf
    unnecessary — only footer INFERENCE rejects TIMESTAMP(NANOS); a
    requested bigint reads the physical INT64 directly.  The conf-set this
    replaced leaked session-wide and masked raw `events` reads elsewhere
    into depending on it (same leak class as VERDICT r02 #4)."""
    schema = (
        "event_id bigint, ts bigint, user_id bigint, event_type string, "
        "value double, props string"
    )
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    raw = reader.parquet(events_dir)
    return (
        raw.withColumn("ts_us", F.expr("CAST(ts DIV 1000 AS BIGINT)"))
        .withColumn("ts", F.expr("timestamp_micros(ts_us)"))
        .withWatermark("ts", watermark)
    )


def run_stream_to_memory(spark, events_dir: str, transform, name: str) -> DataFrame:
    """Drive a windowed transform over the event stream into a memory sink
    (complete mode) until all available data is processed; returns the
    result as a batch DataFrame."""
    q = (
        transform(stream_events(spark, events_dir))
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .start()
    )
    q.processAllAvailable()
    q.stop()
    return spark.table(name)
