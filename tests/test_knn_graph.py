"""Planted-neighbor gates for operators/similarity.py::knn_graph."""

from __future__ import annotations

import pytest

from pipeline_calculator_v3_spark.operators.similarity import knn_graph


@pytest.fixture(scope="module")
def graph(spark):
    # four vectors in the all-positive block: 10/11 are a planted
    # near-identical pair, 12 is oblique, 13 orthogonal-ish to 10;
    # 20 sits alone in a different sign block -> isolated (no rows).
    rows = [
        (10, [1.0, 0.0, 0.5, 0.5]),
        (11, [1.0, 0.01, 0.5, 0.5]),
        (12, [0.0, 1.0, 0.5, 0.5]),
        (13, [0.1, 1.0, 0.0, 0.0]),
        (20, [-1.0, -1.0, -1.0, -1.0]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = knn_graph(df, k=2, sign_dims=4).collect()
    return {(r.src, r.rank): (r.dst, r.cos_sim) for r in out}


def test_planted_pair_is_mutual_rank_one(graph):
    assert graph[(10, 1)][0] == 11
    assert graph[(11, 1)][0] == 10
    assert graph[(10, 1)][1] == pytest.approx(1.0, abs=1e-4)


def test_k_caps_and_isolated_node_absent(graph):
    srcs = {s for s, _ in graph}
    assert srcs == {10, 11, 12, 13}, "blockless node 20 must be isolated"
    assert max(r for _, r in graph) == 2, "k=2 must cap the rank"


def test_neighbors_ordered_by_cosine(graph):
    for src in (10, 11, 12, 13):
        assert graph[(src, 1)][1] >= graph[(src, 2)][1]
