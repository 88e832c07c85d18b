"""operators/packing.py::padding_audit — length-bucketed batching audit
(staged r10 for an r11 registry face): planted fixture + the intended
DuckDB oracle replay built from the SAME generated CASE ladder the Column
face folds over."""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest

from pipeline_calculator_v3_spark.functions.text import TOKENS_SQL
from pipeline_calculator_v3_spark.operators.packing import (
    bucket_edges,
    padding_audit,
    padding_audit_cap_sql,
)

SEQ = 512

# token counts: 1 (floor bucket), 16 (edge inclusive), 17 (next bucket),
# 100, 600 (truncates to 512), empty doc (dropped)
DOCS = [
    (0, "alpha"),
    (1, " ".join(f"w{i}" for i in range(16))),
    (2, " ".join(f"w{i}" for i in range(17))),
    (3, " ".join(f"w{i}" for i in range(100))),
    (4, " ".join(f"w{i}" for i in range(600))),
    (5, ""),
]


def test_edges_cover_and_end_at_seq_len():
    assert bucket_edges(512) == [16, 32, 64, 128, 256, 512]
    assert bucket_edges(500) == [16, 32, 64, 128, 256, 500]


@pytest.fixture(scope="module")
def result(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    rows = padding_audit(df, seq_len=SEQ).collect()
    return {
        r.bucket_cap: (
            r.n_docs, r.n_tokens, r.padded_bucketed, r.padded_naive,
            r.waste_bucketed, r.waste_naive,
        )
        for r in rows
    }


def test_cells(result):
    # cap 16: docs 0 (1 tok) and 1 (16 tok)
    assert result[16][:4] == (2, 17, 15, 2 * SEQ - 17)
    # cap 32: doc 2 (17 tok)
    assert result[32][:4] == (1, 17, 15, SEQ - 17)
    # cap 128: doc 3 (100 tok)
    assert result[128][:4] == (1, 100, 28, SEQ - 100)
    # cap 512: doc 4 truncated to 512 -> zero padding either way
    assert result[512][:4] == (1, 512, 0, 0)
    assert set(result) == {16, 32, 128, 512}, "empty doc must drop"


def test_waste_fractions(result):
    assert result[16][4] == pytest.approx(15 / 32, abs=1e-6)
    assert result[16][5] == pytest.approx((2 * SEQ - 17) / (2 * SEQ), abs=1e-6)
    assert result[512][4] == 0.0 == result[512][5]


def test_duckdb_replay_agrees(spark, result):
    """The exact SQL intended as the r11 registry oracle: shared CASE
    ladder text from padding_audit_cap_sql over the shared TOKENS_SQL."""
    con = duckdb.connect()
    con.register(
        "documents", pd.DataFrame(DOCS, columns=["doc_id", "text"])
    )
    cap = padding_audit_cap_sql("ntok", SEQ)
    sql = f"""
WITH staged AS (
    SELECT doc_id, least(len({TOKENS_SQL}), {SEQ}) AS ntok
    FROM documents
),
capped AS (
    SELECT doc_id, ntok, {cap} AS bucket_cap
    FROM staged WHERE ntok > 0
)
SELECT CAST(bucket_cap AS BIGINT) AS bucket_cap,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(ntok) AS BIGINT) AS n_tokens,
       CAST(sum(bucket_cap - ntok) AS BIGINT) AS padded_bucketed,
       CAST(sum({SEQ} - ntok) AS BIGINT) AS padded_naive,
       ROUND(sum(bucket_cap - ntok) / (count(*) * bucket_cap), 6)
           AS waste_bucketed,
       ROUND(sum({SEQ} - ntok) / (count(*) * {SEQ}), 6) AS waste_naive
FROM capped GROUP BY bucket_cap
"""
    oracle = {
        int(r[0]): tuple(
            int(v) if i < 4 else float(v) for i, v in enumerate(r[1:])
        )
        for r in con.execute(sql).fetchall()
    }
    spark_side = {
        k: tuple(int(v) if i < 4 else float(v) for i, v in enumerate(vals))
        for k, vals in result.items()
    }
    assert oracle == spark_side


def test_seq_len_guard(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    with pytest.raises(ValueError):
        padding_audit(df, seq_len=8)
