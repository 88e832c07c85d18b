"""Structured Streaming wrappers: readStream over the same events data must
reproduce the batch window results exactly (complete mode, all data)."""

from __future__ import annotations

import os
import shutil

import pytest

from pipeline_calculator_v3_spark.queries import events_t
from pipeline_calculator_v3_spark.streaming import windows

from .compare import assert_frames_match


@pytest.fixture(scope="module")
def events_stream_dir(sf_dir, tmp_path_factory):
    d = tmp_path_factory.mktemp("events_stream")
    shutil.copy(os.path.join(sf_dir, "events.parquet"), d / "events.parquet")
    return str(d)


@pytest.mark.parametrize(
    "transform,name",
    [
        (windows.tumbling_counts, "t_tumbling"),
        (windows.sliding_counts, "t_sliding"),
        (windows.session_counts, "t_session"),
    ],
)
def test_stream_matches_batch(spark, sf_dir, events_stream_dir, transform, name):
    batch = transform(events_t(spark, sf_dir)).toPandas()
    streamed = windows.run_stream_to_memory(
        spark, events_stream_dir, transform, name
    ).toPandas()
    assert_frames_match(streamed, batch)


def test_stream_dedup_across_batches(spark, sf_dir, tmp_path):
    """Duplicate file deliveries in SEPARATE micro-batches collapse to one
    copy per event_id (cross-batch state), not just within-batch dedup."""
    import shutil

    from pipeline_calculator_v3_spark.streaming.dedup import run_dedup_to_memory

    d = tmp_path / "dup_events"
    d.mkdir()
    shutil.copy(f"{sf_dir}/events.parquet", d / "a.parquet")
    shutil.copy(f"{sf_dir}/events.parquet", d / "b.parquet")
    out = run_dedup_to_memory(spark, str(d), "t_dedup_batches")
    got = {r.event_type: r.n_events for r in out.collect()}
    expect = {
        r.event_type: r.n
        for r in spark.read.schema(
            "event_id bigint, ts bigint, user_id bigint, event_type string, "
            "value double, props string"
        )
        .parquet(f"{sf_dir}/events.parquet")
        .groupBy("event_type")
        .count()
        .withColumnRenamed("count", "n")
        .collect()
    }
    assert got == expect  # 2x delivery, 1x output


def test_stream_stream_interval_join_equals_batch(spark, sf_dir, tmp_path):
    """REAL stream-stream join (two readStream sources, watermarks both
    sides) must equal the batch interval join on identical input."""
    import shutil

    from pipeline_calculator_v3_spark.queries import QUERIES
    from pipeline_calculator_v3_spark.streaming.joins import (
        run_stream_join_to_memory,
    )

    d = tmp_path / "join_events"
    d.mkdir()
    shutil.copy(f"{sf_dir}/events.parquet", d / "events.parquet")
    got = {
        (r.a_type, r.b_type): r.n_pairs
        for r in run_stream_join_to_memory(spark, str(d), "t_ssjoin").collect()
    }
    expect = {
        (r.a_type, r.b_type): r.n_pairs
        for r in QUERIES["q_stream_join"](spark, sf_dir).collect()
    }
    assert got == expect and sum(expect.values()) > 0


def test_stream_static_join_equals_batch(spark, sf_dir, tmp_path):
    """REAL stream-static join: readStream events x batch customer dim must
    equal the batch join+rollup on identical input, across a two-file
    split (the static side is re-planned per micro-batch)."""
    import pyarrow.parquet as pq

    from pipeline_calculator_v3_spark.queries import events_t
    from pipeline_calculator_v3_spark.streaming.enrich import enrich_rollup
    from pipeline_calculator_v3_spark.streaming.windows import (
        run_stream_to_memory,
    )

    d = tmp_path / "enrich_events"
    d.mkdir()
    tbl = pq.read_table(f"{sf_dir}/events.parquet")
    half = tbl.num_rows // 2
    pq.write_table(tbl.slice(0, half), d / "a.parquet")
    pq.write_table(tbl.slice(half), d / "b.parquet")

    customer = spark.read.parquet(f"{sf_dir}/customer.parquet")
    batch = enrich_rollup(events_t(spark, sf_dir), customer).toPandas()
    streamed = run_stream_to_memory(
        spark, str(d), lambda ev: enrich_rollup(ev, customer),
        "t_stream_static",
    ).toPandas()
    assert_frames_match(streamed, batch)


def test_stream_outer_join_equals_batch_under_horizon(spark, sf_dir, tmp_path):
    """REAL left-outer stream-stream join: matched pairs must equal the
    batch join exactly; null-padded rows must appear for EXACTLY the
    unmatched left rows whose join horizon (a_ts + 5min) expired below the
    final watermark (max ts - 30min) — later unmatched rows are withheld
    because a match could still arrive."""
    import shutil

    from pyspark.sql import functions as F

    from pipeline_calculator_v3_spark.queries import events_t
    from pipeline_calculator_v3_spark.streaming.joins import (
        FOLLOWUP_US,
        followup_pairs_outer,
        run_stream_outer_join_to_memory,
    )

    d = tmp_path / "outer_events"
    d.mkdir()
    shutil.copy(f"{sf_dir}/events.parquet", d / "events.parquet")
    streamed = run_stream_outer_join_to_memory(spark, str(d), "t_ssouter")

    import datetime

    ev = events_t(spark, sf_dir)
    # ts is TIMESTAMP_NTZ: compute the final watermark driver-side and
    # compare as timestamps (unix_micros rejects NTZ input)
    max_ts = ev.agg(F.max("ts")).collect()[0][0]
    horizon = (
        max_ts
        - datetime.timedelta(minutes=30)          # watermark delay
        - datetime.timedelta(microseconds=FOLLOWUP_US)  # join upper bound
    )
    batch = followup_pairs_outer(ev, ev)
    # matched rows: identical sets (streaming emits every one)
    got_m = {
        (r.a_user, r.a_ts, r.b_ts)
        for r in streamed.where(F.col("b_ts").isNotNull()).collect()
    }
    exp_m = {
        (r.a_user, r.a_ts, r.b_ts)
        for r in batch.where(F.col("b_ts").isNotNull()).collect()
    }
    assert got_m == exp_m and len(exp_m) > 0
    # null rows: exactly the horizon-expired unmatched left rows
    got_n = {
        (r.a_user, r.a_ts)
        for r in streamed.where(F.col("b_ts").isNull()).collect()
    }
    exp_n = {
        (r.a_user, r.a_ts)
        for r in batch.where(F.col("b_ts").isNull())
        .where(F.col("a_ts") < F.lit(horizon))
        .collect()
    }
    assert got_n == exp_n and len(exp_n) > 0
