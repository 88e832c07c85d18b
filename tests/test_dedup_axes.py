"""operators/dedup.py::dedup_axes_report — axis-agreement rollup over any
set of (id, keep) decision frames (planted fixture + DuckDB replay,
staged r09 for an r10 registry face)."""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest

from pipeline_calculator_v3_spark.operators.dedup import dedup_axes_report

DOCS = [(i,) for i in range(8)]
# exact: removes 1 and 5; lexical: removes 1, 2, 6; semantic frame covers
# only half the ids (absent -> kept by contract) and removes 3
EXACT = [(0, True), (1, False), (2, True), (3, True), (4, True),
         (5, False), (6, True), (7, True)]
LEX = [(0, True), (1, False), (2, False), (3, True), (4, True),
       (5, True), (6, False), (7, True)]
SEM = [(0, True), (1, True), (2, True), (3, False)]


@pytest.fixture(scope="module")
def result(spark):
    docs = spark.createDataFrame(DOCS, "doc_id long")
    axes = {
        "exact": spark.createDataFrame(EXACT, "doc_id long, keep boolean"),
        "lexical": spark.createDataFrame(LEX, "doc_id long, keep boolean"),
        "semantic": spark.createDataFrame(SEM, "doc_id long, keep boolean"),
    }
    rows = dedup_axes_report(docs, axes).collect()
    return {
        (r.keep_exact, r.keep_lexical, r.keep_semantic): (r.n_docs, r.example_id)
        for r in rows
    }


def test_cells(result):
    # doc 1: removed by exact AND lexical, semantic kept
    assert result[(False, False, True)] == (1, 1)
    # doc 5: exact-only removal
    assert result[(False, True, True)] == (1, 5)
    # docs 2, 6: lexical-only removals
    assert result[(True, False, True)] == (2, 2)
    # doc 3: semantic-only removal
    assert result[(True, True, False)] == (1, 3)
    # docs 0, 4, 7: kept everywhere
    assert result[(True, True, True)] == (3, 0)
    assert sum(n for n, _ in result.values()) == len(DOCS)


def test_absent_axis_rows_count_as_kept(result):
    # ids 4..7 are absent from the semantic frame; none land in a
    # semantic-removed cell
    removed_sem = [k for k in result if not k[2]]
    assert removed_sem == [(True, True, False)]


def test_empty_axes_guard(spark):
    docs = spark.createDataFrame(DOCS, "doc_id long")
    with pytest.raises(ValueError):
        dedup_axes_report(docs, {})


def test_duckdb_replay_agrees(result):
    """The exact SQL intended as the r10 registry oracle (axis frames
    become CTEs over the real decision queries)."""
    con = duckdb.connect()
    con.register("docs", pd.DataFrame(DOCS, columns=["doc_id"]))
    con.register("ax_exact", pd.DataFrame(EXACT, columns=["doc_id", "keep"]))
    con.register("ax_lex", pd.DataFrame(LEX, columns=["doc_id", "keep"]))
    con.register("ax_sem", pd.DataFrame(SEM, columns=["doc_id", "keep"]))
    sql = """
SELECT COALESCE(e.keep, TRUE) AS keep_exact,
       COALESCE(l.keep, TRUE) AS keep_lexical,
       COALESCE(s.keep, TRUE) AS keep_semantic,
       CAST(count(*) AS BIGINT) AS n_docs,
       min(d.doc_id) AS example_id
FROM docs d
LEFT JOIN ax_exact e USING (doc_id)
LEFT JOIN ax_lex l USING (doc_id)
LEFT JOIN ax_sem s USING (doc_id)
GROUP BY 1, 2, 3
"""
    oracle = {
        (bool(r[0]), bool(r[1]), bool(r[2])): (int(r[3]), int(r[4]))
        for r in con.execute(sql).fetchall()
    }
    assert oracle == result


# ---------------------------------------------------------------------------
# Randomized property: for ANY axes frames (partial coverage, arbitrary keep
# flags), the rollup equals a naive single-process reference.
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_DECISION = st.dictionaries(st.integers(0, 9), st.booleans(), max_size=10)


@given(ax1=_DECISION, ax2=_DECISION)
@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_property_equals_naive(spark, ax1, ax2):
    ids = list(range(10))
    expect: dict[tuple, list] = {}
    for i in ids:
        key = (ax1.get(i, True), ax2.get(i, True))
        expect.setdefault(key, []).append(i)
    want = {k: (len(v), min(v)) for k, v in expect.items()}
    docs = spark.createDataFrame([(i,) for i in ids], "doc_id long")
    schema = "doc_id long, keep boolean"
    axes = {
        "a": spark.createDataFrame(list(ax1.items()) or [], schema),
        "b": spark.createDataFrame(list(ax2.items()) or [], schema),
    }
    got = {
        (r.keep_a, r.keep_b): (r.n_docs, r.example_id)
        for r in dedup_axes_report(docs, axes).collect()
    }
    assert got == want
