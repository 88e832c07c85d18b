"""operators/dedup.py::source_copy_matrix — cross-source duplication rollup
over any pair face (planted pairs + DuckDB replay, staged for r09)."""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest

from pipeline_calculator_v3_spark.operators.dedup import source_copy_matrix

DOCS = [(0, "web"), (1, "web"), (2, "books"), (3, "books"), (4, "wiki")]
# near-dup pairs: web<->books twice (one each direction — canonical ordering
# must merge them), one intra-web, one web<->wiki
PAIRS = [(0, 2), (3, 1), (0, 1), (4, 0)]


@pytest.fixture(scope="module")
def result(spark):
    docs = spark.createDataFrame(DOCS, "doc_id long, source string")
    pairs = spark.createDataFrame(PAIRS, "id1 long, id2 long")
    rows = source_copy_matrix(docs, pairs).collect()
    return {(r.source_a, r.source_b): (r.n_pairs, r.intra_source) for r in rows}


def test_matrix_cells(result):
    assert result[("books", "web")] == (2, False)  # both directions merged
    assert result[("web", "web")] == (1, True)     # the diagonal
    assert result[("web", "wiki")] == (1, False)
    assert len(result) == 3


def test_duckdb_replay_agrees(result):
    """The exact SQL intended as the r09 registry oracle."""
    con = duckdb.connect()
    con.register("docs", pd.DataFrame(DOCS, columns=["doc_id", "source"]))
    con.register("pairs", pd.DataFrame(PAIRS, columns=["id1", "id2"]))
    sql = """
SELECT least(a.source, b.source) AS source_a,
       greatest(a.source, b.source) AS source_b,
       CAST(count(*) AS BIGINT) AS n_pairs,
       least(a.source, b.source) = greatest(a.source, b.source)
           AS intra_source
FROM pairs p
JOIN docs a ON a.doc_id = p.id1
JOIN docs b ON b.doc_id = p.id2
GROUP BY 1, 2
"""
    oracle = {
        (r[0], r[1]): (int(r[2]), bool(r[3]))
        for r in con.execute(sql).fetchall()
    }
    assert oracle == result
