"""Connected components vs a pure-Python union-find, including chain graphs
(worst case for label propagation) and the full dedup-cluster decision."""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pipeline_calculator_v3_spark.operators.clusters import (
    connected_components,
    dedup_clusters,
)


def union_find(edges):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {x: find(x) for x in parent}


def test_chain_converges(spark):
    # 0-1-2-...-15 chain: all one component labeled 0
    edges = [(i, i + 1) for i in range(15)]
    df = spark.createDataFrame(edges, "id1 long, id2 long")
    got = {r.id: r.component for r in connected_components(df).collect()}
    assert got == {i: 0 for i in range(16)}


def test_10k_chain_round_budget(spark):
    """Pointer-jumping makes a diameter-10k chain converge in O(log D)
    rounds — plain one-hop propagation would need ~10,000."""
    n = 10_000
    df = spark.range(n - 1).selectExpr("id AS id1", "id + 1 AS id2")
    stats = {}
    labels = connected_components(df, stats=stats)
    assert stats["rounds"] <= 16
    assert labels.where("component != 0").count() == 0
    assert labels.count() == n


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    st.lists(
        st.tuples(st.integers(0, 25), st.integers(0, 25)).filter(lambda t: t[0] != t[1]),
        min_size=1, max_size=40,
    )
)
def test_components_match_union_find(spark, edges):
    df = spark.createDataFrame(edges, "id1 long, id2 long")
    got = {r.id: r.component for r in connected_components(df).collect()}
    assert got == union_find(edges)


def test_dedup_clusters_keep_rule(spark):
    docs = spark.createDataFrame([(i,) for i in range(8)], "doc_id long")
    pairs = spark.createDataFrame([(1, 3), (3, 5), (6, 7)], "id1 long, id2 long")
    rows = {r.doc_id: (r.cluster, r.keep) for r in dedup_clusters(docs, pairs).collect()}
    # {1,3,5} -> cluster 1, keep only 1; {6,7} -> cluster 6, keep 6;
    # singletons keep themselves
    assert rows[1] == (1, True) and rows[3] == (1, False) and rows[5] == (1, False)
    assert rows[6] == (6, True) and rows[7] == (6, False)
    for s in (0, 2, 4):
        assert rows[s] == (s, True)


def test_nonconvergence_raises_not_returns_partial(spark):
    """Review r06: exhausting max_iter used to silently return
    still-propagating labels (multiple survivors per cluster, partition
    dependent).  A long chain that cannot converge in one round must
    raise."""
    import pytest

    from pipeline_calculator_v3_spark.operators.clusters import (
        connected_components,
    )

    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(64)], "id1 long, id2 long"
    )
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(chain, max_iter=1)
