"""operators/sampling.py::sample_k_per_key — deterministic exact-k-per-group
sampling with the WindowGroupLimit pre-shuffle prune."""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest

from pipeline_calculator_v3_spark.operators.sampling import sample_k_per_key

# (doc_id, source): sizes 5 / 2 / 1 — exercises k<n, k==n, k>n in one pass
ROWS = [(i, "a") for i in range(5)] + [(10, "b"), (11, "b")] + [(20, "c")]
K = 2


@pytest.fixture(scope="module")
def picked(spark):
    df = spark.createDataFrame(ROWS, "doc_id long, source string")
    out = sample_k_per_key(df, ["source"], K, "doc_id").collect()
    return sorted((r.source, r.doc_id) for r in out)


def test_group_sizes(picked):
    by_src: dict[str, list[int]] = {}
    for s, i in picked:
        by_src.setdefault(s, []).append(i)
    assert len(by_src["a"]) == K          # k < n: exactly k
    assert sorted(by_src["b"]) == [10, 11]  # k == n: all
    assert by_src["c"] == [20]            # k > n: the whole group


def test_deterministic_under_repartition(spark, picked):
    df = spark.createDataFrame(ROWS, "doc_id long, source string").repartition(7)
    again = sorted(
        (r.source, r.doc_id)
        for r in sample_k_per_key(df, ["source"], K, "doc_id").collect()
    )
    assert again == picked


def test_k_guard(spark):
    df = spark.createDataFrame(ROWS, "doc_id long, source string")
    with pytest.raises(ValueError):
        sample_k_per_key(df, ["source"], 0, "doc_id")


def test_reserved_column_guard(spark):
    # review r08: withColumn('_rn') would silently destroy the caller's
    # column of the same name
    df = spark.createDataFrame(
        [(1, "a", 9)], "doc_id long, source string, _rn long"
    )
    with pytest.raises(ValueError):
        sample_k_per_key(df, ["source"], 1, "doc_id")


def test_window_group_limit_prunes_before_shuffle(spark):
    df = spark.createDataFrame(ROWS, "doc_id long, source string")
    plan = (
        sample_k_per_key(df, ["source"], K, "doc_id")
        ._jdf.queryExecution().executedPlan().toString()
    )
    # the rank filter must push a PARTIAL WindowGroupLimit below the
    # exchange — map tasks pre-prune to local top-k.  The plan prints
    # top-down (Final above the Exchange, Partial below it), so the test
    # must anchor on the LAST occurrence: index() matched the Final node,
    # which sits above the Exchange in every plan, making the assertion
    # vacuous (review r08)
    assert plan.count("WindowGroupLimit") == 2
    assert plan.rindex("WindowGroupLimit") > plan.index("Exchange")
    assert "Partial" in plan[plan.rindex("WindowGroupLimit"):].split("\n")[0]


def test_duckdb_replay_agrees(picked):
    """The exact SQL intended as the r09 registry oracle."""
    con = duckdb.connect()
    con.register("docs", pd.DataFrame(ROWS, columns=["doc_id", "source"]))
    sql = f"""
SELECT source, doc_id FROM (
    SELECT source, doc_id,
           row_number() OVER (PARTITION BY source
                              ORDER BY md5(CAST(doc_id AS VARCHAR)),
                                       doc_id) AS rn
    FROM docs
) WHERE rn <= {K}
"""
    oracle = sorted((r[0], int(r[1])) for r in con.execute(sql).fetchall())
    assert oracle == picked
