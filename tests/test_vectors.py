"""Direct unit tests for the embedding-vector Column math — the zero-vector
guard and agreement with numpy."""

from __future__ import annotations

import math

import numpy as np

from pyspark.sql import functions as F

from pipeline_calculator_v3_spark.functions.vectors import cosine, dot, norm


def test_zero_vector_cosine_is_null_not_a_crash(spark):
    df = spark.createDataFrame(
        [([0.0, 0.0], [1.0, 2.0]), ([1.0, 0.0], [1.0, 0.0])],
        "a array<float>, b array<float>",
    )
    got = [r[0] for r in df.select(cosine(F.col("a"), F.col("b"))).collect()]
    assert got[0] is None
    assert math.isclose(got[1], 1.0, rel_tol=1e-12)


def test_dot_norm_cosine_match_numpy(spark):
    rng = np.random.RandomState(7)
    rows = [
        (rng.randn(8).astype("float32").tolist(),
         rng.randn(8).astype("float32").tolist())
        for _ in range(20)
    ]
    df = spark.createDataFrame(rows, "a array<float>, b array<float>")
    out = df.select(
        dot(F.col("a"), F.col("b")).alias("d"),
        norm(F.col("a")).alias("n"),
        cosine(F.col("a"), F.col("b")).alias("c"),
    ).collect()
    for (a, b), r in zip(rows, out):
        av, bv = np.array(a, dtype="float64"), np.array(b, dtype="float64")
        assert math.isclose(r["d"], float(av @ bv), rel_tol=1e-12)
        assert math.isclose(r["n"], float(np.linalg.norm(av)), rel_tol=1e-12)
        expect_c = float(
            av @ bv / (np.linalg.norm(av) * np.linalg.norm(bv))
        )
        assert math.isclose(r["c"], expect_c, rel_tol=1e-9)
