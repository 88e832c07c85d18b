"""PageRank invariants: mass conservation, the closed-form uniform
solution on a regular graph, directed asymmetry, and the dangling-mass
correction."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pipeline_calculator_v3_spark.operators.pagerank import pagerank


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src bigint, dst bigint")


def test_uniform_on_complete_graph(spark):
    # K5 both directions: every vertex symmetric -> rank exactly uniform
    n = 5
    pairs = [(a, b) for a in range(n) for b in range(n) if a != b]
    out = {r.id: r.rank for r in pagerank(_edges(spark, pairs), iterations=8).collect()}
    assert len(out) == n
    for v in out.values():
        assert v == pytest.approx(1.0, rel=1e-9)


def test_rank_mass_conserved_with_dangling(spark):
    # 0->1->2, 2 dangling: without redistribution the sum decays
    out = pagerank(_edges(spark, [(0, 1), (1, 2)]), iterations=12).collect()
    total = sum(r.rank for r in out)
    assert total == pytest.approx(3.0, rel=1e-9)
    ranks = {r.id: r.rank for r in out}
    assert ranks[2] > ranks[1] > ranks[0]  # downstream accumulates


def test_hub_attracts_rank(spark):
    # star: everyone points at 9
    pairs = [(i, 9) for i in range(9)]
    ranks = {r.id: r.rank for r in pagerank(_edges(spark, pairs), iterations=12).collect()}
    assert ranks[9] > 4.0  # hub dominates (10 vertices, equilibrium ~4.74)
    spokes = [v for k, v in ranks.items() if k != 9]
    assert max(spokes) == pytest.approx(min(spokes), rel=1e-9)


def test_bad_args_raise(spark):
    with pytest.raises(ValueError):
        pagerank(_edges(spark, [(0, 1)]), iterations=0)
