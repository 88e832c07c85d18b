"""Randomized property tests (hypothesis) for the r04 operators: the binned
interval join must equal the naive theta join for ANY bin width, and chunk
geometry must tile every document for ANY (max_len, stride)."""

from __future__ import annotations

import math

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F

from pipeline_calculator_v3_spark.operators.chunking import chunk_tokens
from pipeline_calculator_v3_spark.operators.intervals import interval_bin_join

_SLOW = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@given(
    bin_width=st.floats(min_value=5.0, max_value=500.0),
    seed=st.integers(min_value=0, max_value=10_000),
)
@_SLOW
def test_interval_bin_join_equals_naive_any_width(spark, bin_width, seed):
    pts = spark.range(0, 120).select(
        ((F.col("id") * 37 + seed) % 997 * 1.37).alias("v")
    )
    iv = spark.range(0, 15).select(
        F.col("id").alias("ivid"),
        (((F.col("id") * 61 + seed) % 701) * 1.9).alias("lo"),
    ).withColumn("hi", F.col("lo") + (seed % 97) + 3.0)
    got = sorted(
        (round(r.v, 6), r.ivid)
        for r in interval_bin_join(pts, iv, "v", "lo", "hi", bin_width).collect()
    )
    naive = sorted(
        (round(r.v, 6), r.ivid)
        for r in pts.join(
            iv, (F.col("v") >= F.col("lo")) & (F.col("v") <= F.col("hi"))
        ).collect()
    )
    assert got == naive


@given(
    n_tokens=st.integers(min_value=0, max_value=90),
    max_len=st.integers(min_value=1, max_value=40),
    stride=st.integers(min_value=1, max_value=40),
)
@_SLOW
def test_chunks_tile_document(spark, n_tokens, max_len, stride):
    text = " ".join(f"t{i}" for i in range(n_tokens))
    docs = spark.createDataFrame([(1, text)], "doc_id bigint, text string")
    rows = sorted(
        chunk_tokens(docs, max_len=max_len, stride=stride).collect(),
        key=lambda r: r.chunk_idx,
    )
    if n_tokens == 0:
        assert rows == []
        return
    # starts are 0, stride, 2*stride, ... < n_tokens — dense chunk_idx
    expected_starts = list(range(0, n_tokens, stride))
    assert [r.chunk_idx for r in rows] == list(range(len(expected_starts)))
    for r, s in zip(rows, expected_starts):
        assert r.n_tokens == min(max_len, n_tokens - s)
        assert r.first_token == f"t{s}"
        assert r.last_token == f"t{min(s + max_len, n_tokens) - 1}"
    # coverage: windows reach the last token iff stride <= max_len
    if stride <= max_len:
        covered = max(s + min(max_len, n_tokens - s) for s in expected_starts)
        assert covered == n_tokens
