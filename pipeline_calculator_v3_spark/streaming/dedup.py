"""Streaming dedup-on-ingest: exactly-once document/event identity across
micro-batches.

A training-data ingest stream re-delivers records (at-least-once sources,
backfills, retried uploads); deduplicating AT INGEST keeps every downstream
stage from re-paying the duplicate volume.  The Spark-native operator is
``dropDuplicatesWithinWatermark``: like ``dropDuplicates`` it keeps the
first arrival per key, but its state store only retains keys YOUNGER than
the event-time watermark — bounded state, which is the only form that
survives an unbounded 100 TB/day stream (plain ``dropDuplicates`` on a
stream accumulates every key ever seen and OOMs the state store).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def dedup_within_watermark(stream: DataFrame, key_cols: list[str]) -> DataFrame:
    """First-arrival-wins dedup over ``key_cols`` with watermark-bounded
    state.  ``stream`` must already carry ``withWatermark`` (the watermark
    defines both lateness admission and state retention)."""
    return stream.dropDuplicatesWithinWatermark(key_cols)


def run_dedup_to_memory(spark, events_dir: str, name: str) -> DataFrame:
    """Drive dedup over the event files (each file its own micro-batch via
    maxFilesPerTrigger=1, so duplicate deliveries in LATER batches exercise
    cross-batch state) and return the per-type counts of the deduped
    stream's append output."""
    from pyspark.sql import functions as F

    from .windows import stream_events

    # schema'd read + µs ts + watermark; one file per micro-batch so the
    # duplicate file replays through cross-batch dedup state
    ev = stream_events(spark, events_dir, max_files_per_trigger=1)
    deduped = dedup_within_watermark(ev, ["event_id"])
    from .drain import drain_to_memory

    return (
        drain_to_memory(deduped, name)
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_events"))
    )
