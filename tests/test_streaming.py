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
