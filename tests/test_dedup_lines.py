"""operators/lines.py::dedup_lines — C4-style cross-document line dedup.

Planted fixture + a DuckDB declarative replay (pre-proving the r09 oracle
face: winner election and reassembly are plain SQL)."""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest

from pipeline_calculator_v3_spark.operators.lines import dedup_lines

DOCS = [
    # "BANNER" recurs in docs 0/1/2 -> kept only at its first occurrence
    # (doc 0, pos 0); "unique to zero" stays; blank lines are exempt.
    (0, "BANNER\nunique to zero\n\nshared tail"),
    (1, "lead one\nBANNER\nshared tail"),
    (2, "BANNER\nlead two"),
    # intra-doc repetition only (one distinct doc) -> untouched
    (3, "echo\necho"),
    # every eligible line duplicated elsewhere -> text may empty out
    (4, "shared tail"),
]


def _naive(min_docs=2, min_chars=1):
    lines = []
    for i, t in DOCS:
        for p, ln in enumerate(t.split("\n")):
            lines.append((i, p, ln))
    spread: dict[str, set] = {}
    first: dict[str, tuple] = {}
    for i, p, ln in lines:
        if len(ln.strip()) < min_chars:
            continue
        spread.setdefault(ln, set()).add(i)
        first[ln] = min(first.get(ln, (i, p)), (i, p))
    dup = {ln for ln, s in spread.items() if len(s) >= min_docs}
    out = {}
    for i, t in DOCS:
        kept, removed = [], 0
        for p, ln in enumerate(t.split("\n")):
            if ln in dup and first[ln] != (i, p):
                removed += 1
            else:
                kept.append(ln)
        out[i] = ("\n".join(kept), len(t.split("\n")), removed)
    return out


@pytest.fixture(scope="module")
def result(spark):
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    rows = dedup_lines(docs).collect()
    return {r.doc_id: (r.text, r.n_lines, r.n_lines_removed) for r in rows}


def test_matches_naive(result):
    assert result == _naive()


def test_first_occurrence_survives(result):
    assert result[0][0].startswith("BANNER")
    assert "BANNER" not in result[1][0]
    assert "BANNER" not in result[2][0]


def test_intra_doc_repetition_untouched(result):
    assert result[3] == ("echo\necho", 2, 0)


def test_fully_deduped_doc_keeps_row(result):
    assert result[4] == ("", 1, 1)


def test_min_docs_guard(spark):
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    with pytest.raises(ValueError):
        dedup_lines(docs, min_docs=1)


def test_null_text_keeps_its_row(spark):
    # review r08: posexplode(split(NULL)) yields no rows — the doc vanished
    docs = spark.createDataFrame(
        [(0, "a\nb"), (1, None), (2, "a\nc")], "doc_id long, text string"
    )
    rows = {r.doc_id: (r.text, r.n_lines, r.n_lines_removed)
            for r in dedup_lines(docs).collect()}
    assert set(rows) == {0, 1, 2}
    assert rows[1] == ("", 1, 0)
    assert rows[0][0] == "a\nb" and rows[2][0] == "c"


def test_duckdb_replay_agrees(result):
    """The exact SQL intended as the r09 registry oracle."""
    con = duckdb.connect()
    con.register(
        "docs", pd.DataFrame(DOCS, columns=["doc_id", "text"])
    )
    sql = """
WITH lines AS (
    SELECT doc_id,
           generate_subscripts(string_split(text, chr(10)), 1) - 1 AS pos,
           unnest(string_split(text, chr(10))) AS line
    FROM docs
),
dup AS (
    SELECT line,
           min(struct_pack(i := doc_id, p := pos)) AS win
    FROM lines
    WHERE length(trim(line)) >= 1
    GROUP BY line
    HAVING count(DISTINCT doc_id) >= 2
),
marked AS (
    SELECT l.doc_id, l.pos, l.line,
           (d.line IS NULL
            OR (d.win.i = l.doc_id AND d.win.p = l.pos)) AS keep
    FROM lines l LEFT JOIN dup d USING (line)
)
SELECT doc_id,
       coalesce(string_agg(CASE WHEN keep THEN line END, chr(10)
                           ORDER BY pos), '') AS text,
       CAST(count(*) AS BIGINT) AS n_lines,
       CAST(sum(CASE WHEN keep THEN 0 ELSE 1 END) AS BIGINT)
           AS n_lines_removed
FROM marked GROUP BY doc_id
"""
    oracle = {
        int(r[0]): (r[1], int(r[2]), int(r[3]))
        for r in con.execute(sql).fetchall()
    }
    assert oracle == result


# ---------------------------------------------------------------------------
# Randomized property: for ANY small corpus drawn from a tiny line alphabet
# (guaranteeing cross-doc collisions), the operator equals the naive
# single-process reference — winner election, exemptions, reassembly.
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_LINE = st.sampled_from(["dup one", "dup two", "x", "", "unique"])
_DOC = st.lists(_LINE, min_size=1, max_size=5).map("\n".join)


@given(texts=st.lists(_DOC, min_size=1, max_size=6), min_docs=st.integers(2, 3))
@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_property_equals_naive(spark, texts, min_docs):
    docs = list(enumerate(texts))
    spread: dict[str, set] = {}
    first: dict[str, tuple] = {}
    for i, t in docs:
        for p, ln in enumerate(t.split("\n")):
            if not ln.strip():
                continue
            spread.setdefault(ln, set()).add(i)
            first[ln] = min(first.get(ln, (i, p)), (i, p))
    dup = {ln for ln, s in spread.items() if len(s) >= min_docs}
    expect = {}
    for i, t in docs:
        kept, removed = [], 0
        for p, ln in enumerate(t.split("\n")):
            if ln in dup and first[ln] != (i, p):
                removed += 1
            else:
                kept.append(ln)
        expect[i] = ("\n".join(kept), len(t.split("\n")), removed)
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        r.doc_id: (r.text, r.n_lines, r.n_lines_removed)
        for r in dedup_lines(df, min_docs=min_docs).collect()
    }
    assert got == expect
