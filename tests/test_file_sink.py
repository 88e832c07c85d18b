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


def test_restart_from_checkpoint_exactly_once(spark, sf_dir, tmp_path):
    """Kill the query, add a second input file, RESTART with the same
    checkpoint: recovery must process only the new file (offsets come from
    the checkpoint, not the sink) and the reconciled sink must equal the
    full-input batch result — the exactly-once contract across restarts."""
    import pyarrow.parquet as pq

    src = str(tmp_path / "src")
    os.makedirs(src)
    # split on EVENT TIME, not physical row order: recovery re-arms the
    # watermark from the checkpoint (~max ts of file A minus the delay), so
    # an unsorted fixture would put late rows in file B that streaming
    # correctly drops — a spurious mismatch the ts sort rules out
    tbl = (
        pq.read_table(os.path.join(sf_dir, "events.parquet"))
        .sort_by([("ts", "ascending")])
    )
    half = tbl.num_rows // 2
    pq.write_table(tbl.slice(0, half), f"{src}/a.parquet")

    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    q1 = stream_to_parquet(
        windows.tumbling_counts(windows.stream_events(spark, src)), out, ckpt,
        query_name="t_restart_1",
    )
    q1.processAllAvailable()
    q1.stop()
    batches_before = {d for d in os.listdir(out) if d.startswith("batch_id=")}

    pq.write_table(tbl.slice(half), f"{src}/b.parquet")
    q2 = stream_to_parquet(
        windows.tumbling_counts(windows.stream_events(spark, src)), out, ckpt,
        query_name="t_restart_2",
    )
    q2.processAllAvailable()
    q2.stop()

    batches_after = {d for d in os.listdir(out) if d.startswith("batch_id=")}
    new_batches = batches_after - batches_before
    assert new_batches, "restart produced no new micro-batch"
    assert batches_before < batches_after, "restart must not rewrite old batches"

    landed = read_sink(spark, out)
    w = Window.partitionBy("window_start_us", "event_type").orderBy(F.desc("batch_id"))
    latest = (
        landed.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .drop("rn", "batch_id")
    )
    batch = windows.tumbling_counts(events_t(spark, sf_dir))
    assert_frames_match(latest.toPandas(), batch.toPandas())
