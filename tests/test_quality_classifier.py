"""Planted-fixture gates for the frozen linear quality classifier
(operators/classifier.py) — the model itself, not just the plumbing:
natural prose must score above junk, and the margin decision must match
the sigmoid threshold it stands in for."""

from __future__ import annotations

import math

import pytest

from pipeline_calculator_v3_spark.operators.classifier import (
    QUALITY_BIAS,
    QUALITY_WEIGHTS,
    classify_quality,
)

PROSE = (
    "the expedition set out at dawn and the river was calm for a time "
    "as the crew worked in silence with a steady wind at their backs"
)
REPETITIVE = "buy now " * 30
DIGIT_DUMP = "4821 9937 1002 8457 3321 9984 1273 5538 0091 7265 4410 882"


@pytest.fixture(scope="module")
def scored(spark):
    docs = spark.createDataFrame(
        [(1, PROSE), (2, REPETITIVE), (3, DIGIT_DUMP), (4, "   "), (5, "")],
        "doc_id long, text string",
    )
    return {r.doc_id: r for r in classify_quality(docs).collect()}


def test_prose_beats_junk_and_junk_is_dropped(scored):
    assert scored[1].keep, "natural prose must be kept"
    assert scored[1].score > scored[2].score > 0.0
    assert scored[1].score > scored[3].score
    assert not scored[3].keep, "digit dump must be dropped"
    assert not scored[2].keep, "30x-repeated bigram must be dropped"


def test_empty_and_whitespace_docs_emit_no_row(scored):
    assert set(scored) == {1, 2, 3}


def test_score_is_sigmoid_of_margin(scored):
    for r in scored.values():
        assert r.score == pytest.approx(
            1.0 / (1.0 + math.exp(-r.z)), abs=2e-6
        )
        assert r.keep == (r.z >= 0)


def test_weight_table_is_the_contract():
    # the oracle SQL is generated from this exact table — a drive-by edit
    # to the model must be a deliberate, test-visible act
    assert QUALITY_BIAS == -6.0
    assert [n for n, _ in QUALITY_WEIGHTS] == [
        "f_log_tokens", "f_stopword", "f_avg_token_len",
        "f_uniq", "f_punct", "f_digit",
    ]


def test_best_quality_cluster_representative(spark):
    """dedup_clusters_best: in a near-dup cluster the HIGHER-quality doc
    survives even with the higher id (the min-id rule would pick the
    other); singletons always keep themselves."""
    from pyspark.sql import functions as F

    from pipeline_calculator_v3_spark.operators.clusters import (
        dedup_clusters_best,
    )

    docs = spark.createDataFrame(
        [(1,), (2,), (9,)], "doc_id long"
    )
    pairs = spark.createDataFrame([(1, 2)], "id1 long, id2 long")
    scores = spark.createDataFrame(
        [(1, -1.0), (2, 3.0)], "doc_id long, z double"
    )  # doc 9 unscored -> -1e9 fill, still keeps its singleton
    out = {
        r.doc_id: (r.cluster, r.keep)
        for r in dedup_clusters_best(docs, pairs, scores).collect()
    }
    assert out == {1: (1, False), 2: (1, True), 9: (9, True)}


def test_extra_cols_reserved_guard(spark):
    """Advice r09: extra_cols colliding with the scan's working columns
    (doc_id/text/tok/z/score/keep) must raise, like the sibling gates."""
    import pytest as _pytest

    df = spark.createDataFrame(
        [(1, "some text here", "web")], "doc_id long, text string, source string"
    )
    with _pytest.raises(ValueError, match="reserved"):
        classify_quality(df, extra_cols=["score", "source"])
    # non-colliding names still pass through
    assert "source" in classify_quality(df, extra_cols=["source"]).columns
