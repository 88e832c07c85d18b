"""foreachBatch parquet sink: streamed window aggregates land as parquet and
reproduce the batch result (update mode -> latest row per key wins)."""

from __future__ import annotations

import os
import shutil

from pyspark.sql import Window
from pyspark.sql import functions as F

from pipeline_calculator_v3_spark.queries import events_t
from pipeline_calculator_v3_spark.streaming import windows
from pipeline_calculator_v3_spark.streaming.file_sink import read_sink, stream_to_parquet

from .compare import assert_frames_match


def test_stream_lands_in_parquet(spark, sf_dir, tmp_path):
    src = str(tmp_path / "src")
    os.makedirs(src)
    shutil.copy(os.path.join(sf_dir, "events.parquet"), f"{src}/events.parquet")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    q = stream_to_parquet(
        windows.tumbling_counts(windows.stream_events(spark, src)), out, ckpt
    )
    q.processAllAvailable()
    q.stop()

    landed = read_sink(spark, out)
    # update mode: keep the last emission per (window, event_type)
    w = Window.partitionBy("window_start_us", "event_type").orderBy(F.desc("batch_id"))
    latest = (
        landed.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .drop("rn", "batch_id")
    )
    batch = windows.tumbling_counts(events_t(spark, sf_dir))
    assert_frames_match(latest.toPandas(), batch.toPandas())
    # files actually exist on disk under batch dirs
    assert any(d.startswith("batch_id=") for d in os.listdir(out))
