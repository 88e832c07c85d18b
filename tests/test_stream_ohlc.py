"""Streaming OHLC (streaming/windows.py::ohlc_candles, r09-staged): the
same function over batch and stream must agree, and both must agree with
the batch operator (operators/resample.ohlc_downsample) — window(ts)
bucketing equals the integer ts - pmod(ts, w) edges for epoch-aligned
widths on positive timestamps."""

from __future__ import annotations

import os
import shutil

import pytest

from pipeline_calculator_v3_spark.operators.resample import ohlc_downsample
from pipeline_calculator_v3_spark.queries import events_t
from pipeline_calculator_v3_spark.streaming import windows

from .compare import assert_frames_match

_HOUR_US = 3_600_000_000


@pytest.fixture(scope="module")
def events_stream_dir(sf_dir, tmp_path_factory):
    d = tmp_path_factory.mktemp("events_ohlc_stream")
    shutil.copy(os.path.join(sf_dir, "events.parquet"), d / "events.parquet")
    return str(d)


def test_stream_matches_batch(spark, sf_dir, events_stream_dir):
    batch = windows.ohlc_candles(events_t(spark, sf_dir)).toPandas()
    streamed = windows.run_stream_to_memory(
        spark, events_stream_dir, windows.ohlc_candles, "t_ohlc"
    ).toPandas()
    assert len(batch) > 0
    assert_frames_match(streamed, batch)


def test_batch_face_matches_operator(spark, sf_dir):
    """window(ts).start == the operator's integer bucket edge, value for
    value across every candle column."""
    cand = windows.ohlc_candles(events_t(spark, sf_dir)).toPandas()
    op = ohlc_downsample(
        events_t(spark, sf_dir), "ts_us", "value", _HOUR_US,
        key_cols=["event_type"], tiebreak_col="event_id",
    ).toPandas()
    assert_frames_match(
        cand.sort_index(axis=1), op.sort_index(axis=1)
    )
