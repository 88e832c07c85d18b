"""applyInPandasWithState: per-user running totals must match the batch
aggregate, including when the stream is split into multiple micro-batches
(state carried through the state store)."""

from __future__ import annotations

import os
import shutil

import pytest
from pyspark.sql import functions as F

from pipeline_calculator_v3_spark.queries import events_t
from pipeline_calculator_v3_spark.streaming.stateful import run_stateful_to_memory

from .compare import assert_frames_match


@pytest.fixture()
def split_events_dir(spark, sf_dir, tmp_path):
    """Events split into two parquet files (two micro-batches with
    maxFilesPerTrigger=1)."""
    ev = events_t(spark, sf_dir)
    half = ev.where(F.col("event_id") % 2 == 0)
    other = ev.where(F.col("event_id") % 2 == 1)
    d = str(tmp_path / "ev")
    os.makedirs(d, exist_ok=True)
    # write raw-shaped files (ts as TIMESTAMP(MICROS) ntz like the source data)
    for i, part in enumerate([half, other]):
        pdf = part.select(
            "event_id", "ts", "user_id", "event_type", "value", "props",
        ).toPandas()
        pdf["ts"] = pdf["ts"].astype("datetime64[us]")
        pdf.to_parquet(os.path.join(d, f"part{i}.parquet"), index=False)
    return d


def _expected(spark, sf_dir):
    return (
        events_t(spark, sf_dir)
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_events"),
            F.sum("value").alias("total_value"),
            F.max("ts_us").alias("last_ts_us"),
        )
    )


def test_stateful_totals_single_batch(spark, sf_dir, split_events_dir):
    got = run_stateful_to_memory(spark, split_events_dir, "stateful_one").toPandas()
    assert_frames_match(got, _expected(spark, sf_dir).toPandas())


def test_stateful_totals_across_microbatches(spark, sf_dir, split_events_dir):
    got = run_stateful_to_memory(
        spark, split_events_dir, "stateful_two", max_files_per_trigger=1
    ).toPandas()
    # two micro-batches; final state must equal the full-batch aggregate
    assert_frames_match(got, _expected(spark, sf_dir).toPandas())
