"""The normalized-ingest fast path (r10, VERDICT r09 #4):
``knn_graph(assume_unit=True)`` over a ``unit_normalize``-d corpus must
(a) produce the same graph as the cosine path over the raw corpus —
cosine is scale-invariant, so normalizing then taking bare dots is the
same ranking — and (b) actually DROP the norm machinery from the plan:
no ``nrm`` column in the pair-stage shuffle, no sqrt pass.  The measured
shuffle-width delta is recorded in PLANS.md ("knn_graph normalized
ingest")."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pipeline_calculator_v3_spark.functions.vectors import unit_normalize
from pipeline_calculator_v3_spark.operators.similarity import knn_graph

ROWS = [
    (10, [1.0, 0.0, 0.5, 0.5]),
    (11, [1.0, 0.01, 0.5, 0.5]),
    (12, [0.0, 1.0, 0.5, 0.5]),
    (13, [0.1, 1.0, 0.0, 0.0]),
    (14, [0.9, 0.2, 0.4, 0.6]),
    (20, [-1.0, -1.0, -1.0, -1.0]),
]


@pytest.fixture(scope="module")
def corpus(spark):
    return spark.createDataFrame(
        ROWS, "vec_id long, embedding array<double>"
    )


@pytest.fixture(scope="module")
def normalized(spark, corpus):
    # materialize the normalize step (the ingest contract is normalize AT
    # WRITE TIME) — keeping it lazy would leave unit_normalize's own sqrt
    # in the query lineage and defeat the plan gate below
    rows = corpus.select(
        "vec_id", unit_normalize(F.col("embedding")).alias("embedding")
    ).collect()
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<double>"
    )


def test_unit_path_matches_cosine_path(corpus, normalized):
    """Same (src, dst, rank) graph, cosines equal to float tolerance.

    Not bit-identity: unit_normalize divides BEFORE the dot, reassociating
    the rounding (the documented reason oracle faces keep dot/(na*nb));
    the planted corpus has no near-ties inside that tolerance."""
    ref = {
        (r.src, r.rank): (r.dst, r.cos_sim)
        for r in knn_graph(corpus, k=2, sign_dims=4).collect()
    }
    fast = {
        (r.src, r.rank): (r.dst, r.cos_sim)
        for r in knn_graph(
            normalized, k=2, sign_dims=4, assume_unit=True
        ).collect()
    }
    assert set(ref) == set(fast)
    for key, (dst, cos) in ref.items():
        assert fast[key][0] == dst, key
        assert fast[key][1] == pytest.approx(cos, abs=1e-9), key


def test_unit_path_plan_has_no_norm(corpus, normalized):
    """The claim worth a plan gate: assume_unit removes the ``nrm``
    column (and its SQRT) from the pair stage entirely, while the cosine
    path carries it through the shuffle."""
    fast_plan = knn_graph(
        normalized, k=2, sign_dims=4, assume_unit=True
    )._jdf.queryExecution().toString()
    assert "nrm" not in fast_plan
    assert "SQRT" not in fast_plan.upper()

    ref_plan = (
        knn_graph(corpus, k=2, sign_dims=4)
        ._jdf.queryExecution()
        .toString()
    )
    assert "nrm" in ref_plan, "cosine path should still hoist norms"


def test_unit_path_zero_vector_rows_drop_at_normalize(spark):
    """unit_normalize maps the zero vector to NULL; the ingest contract is
    to drop such rows BEFORE indexing (a zero vector has no direction).
    The fast path must not fabricate neighbors for a NULL embedding."""
    rows = [(1, [1.0, 0.0]), (2, [0.8, 0.1]), (3, [0.0, 0.0])]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    norm_df = df.select(
        "vec_id", unit_normalize(F.col("embedding")).alias("embedding")
    ).where(F.col("embedding").isNotNull())
    out = knn_graph(norm_df, k=1, sign_dims=2, assume_unit=True).collect()
    assert {r.src for r in out} == {1, 2}
