"""functions/vectors.py — unit_normalize (r09-staged ingest-time form of
the norm hoists) and its cosine identity."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from pipeline_calculator_v3_spark.functions.vectors import (
    cosine,
    dot,
    norm,
    unit_normalize,
)

VECS = [
    (0, [3.0, 4.0]),
    (1, [1.0, 0.0]),
    (2, [-2.0, 2.0]),
    (3, [0.0, 0.0]),   # zero vector -> NULL (quarantine rule)
]


@pytest.fixture(scope="module")
def frame(spark):
    return spark.createDataFrame(VECS, "vid long, v array<double>")


def test_unit_norm_is_one(frame):
    rows = frame.select(
        "vid", norm(unit_normalize(F.col("v"))).alias("n")
    ).collect()
    got = {r.vid: r.n for r in rows}
    for vid in (0, 1, 2):
        assert got[vid] == pytest.approx(1.0, abs=1e-12)
    assert got[3] is None


def test_zero_vector_quarantined(frame):
    rows = frame.select("vid", unit_normalize(F.col("v")).alias("u")).collect()
    assert {r.vid: r.u for r in rows}[3] is None


def test_cosine_equals_dot_of_units(spark):
    # pairwise identity over a planted set: cosine(a,b) == dot(u(a), u(b))
    # to double tolerance (reassociated rounding — see the docstring)
    import itertools
    vecs = [v for _, v in VECS[:3]]
    pairs = [
        (i, j, a, b)
        for (i, a), (j, b) in itertools.combinations(enumerate(vecs), 2)
    ]
    df = spark.createDataFrame(
        pairs, "i long, j long, a array<double>, b array<double>"
    )
    rows = df.select(
        cosine(F.col("a"), F.col("b")).alias("c"),
        dot(unit_normalize(F.col("a")), unit_normalize(F.col("b"))).alias("d"),
    ).collect()
    for r in rows:
        assert r.d == pytest.approx(r.c, rel=1e-12)
        assert -1.0 - 1e-12 <= r.d <= 1.0 + 1e-12


def test_matches_numpy(frame):
    import numpy as np

    rows = frame.where(F.col("vid") < 3).select(
        "vid", unit_normalize(F.col("v")).alias("u")
    ).collect()
    for r in rows:
        v = np.array(dict(VECS)[r.vid], dtype=np.float64)
        assert np.allclose(np.array(r.u), v / np.linalg.norm(v), atol=1e-15)


def test_norm_evaluated_outside_element_lambda(frame):
    """Advice r09: an aggregate referenced inside a HOF lambda re-evaluates
    per element (O(d^2) per row).  The fix fans the scalar out via
    array_repeat, so the optimized plan's element lambda (the LAST
    lambdafunction — the division) must contain no aggregate."""
    plan = (
        frame.select(unit_normalize(F.col("v")).alias("u"))
        ._jdf.queryExecution().optimizedPlan().toString()
    )
    assert "array_repeat" in plan
    tail = plan.rsplit("lambdafunction", 1)[1]
    assert "aggregate(" not in tail
