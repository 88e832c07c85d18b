"""operators/entropy.py — token-distribution entropy (staged r11 for an
r12 registry face): hand-computed planted values, empty/NULL-document
semantics, the intended DuckDB oracle replay of the per-document pass
and the (lang, bucket) profile over the documents table, and the
zero-shuffle plan gate on the per-document scan."""

from __future__ import annotations

import math

import pytest

from pipeline_calculator_v3_spark.functions.text import TOKENS_SQL
from pipeline_calculator_v3_spark.operators.entropy import (
    entropy_profile,
    token_entropy,
)

_TOK = TOKENS_SQL.replace("text", "coalesce(text, '')")

# Per-document replay shared by both oracles: entropy in nats via
# ln(n) - sum(tf * ln tf) / n over the (doc, term) frequency table,
# 6-dp rounded like the operator; empty docs keep a row with NULLs.
PER_DOC_CTES = f"""
t AS (SELECT doc_id, lang, {_TOK} AS tok FROM documents),
occ AS (SELECT doc_id, unnest(tok) AS term FROM t),
tf AS (SELECT doc_id, term, count(*) AS c FROM occ GROUP BY 1, 2),
ent AS (
    SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_tokens,
           CAST(count(*) AS BIGINT) AS n_types,
           round(ln(sum(c)) - sum(c * ln(c)) / sum(c), 6) AS entropy,
           round(CAST(count(*) AS DOUBLE) / sum(c), 6) AS ttr
    FROM tf GROUP BY 1
),
per_doc AS (
    SELECT t.doc_id, t.lang,
           coalesce(e.n_tokens, 0) AS n_tokens,
           coalesce(e.n_types, 0) AS n_types,
           e.entropy, e.ttr
    FROM t LEFT JOIN ent e USING (doc_id)
)
"""

# The intended r12 face oracle: diversity profile per (lang, 0.5-wide
# entropy bucket over the rounded per-doc value).
PROFILE_SQL = f"""
WITH {PER_DOC_CTES}
SELECT lang, floor(entropy / 0.5) * 0.5 AS entropy_bucket,
       CAST(count(*) AS BIGINT) AS n_docs,
       round(avg(entropy), 6) AS avg_entropy,
       round(avg(ttr), 6) AS avg_ttr,
       round(avg(CAST(n_tokens AS DOUBLE)), 6) AS avg_tokens
FROM per_doc
GROUP BY 1, 2
ORDER BY lang, entropy_bucket NULLS FIRST
"""

PLANTED = [
    (1, "a a b", "en"),        # n=3: ln3 - (2 ln2)/3
    (2, "x x x x", "en"),      # uniform run: exactly 0
    (3, "p q r s", "de"),      # all distinct: ln 4
    (4, "", "de"),             # empty: NULL entropy
    (5, None, "de"),           # NULL text == empty document
]


@pytest.fixture(scope="module")
def planted(spark):
    return spark.createDataFrame(PLANTED, "doc_id long, text string, lang string")


def test_planted_values(planted):
    got = {
        r.doc_id: (r.n_tokens, r.n_types, r.entropy, r.ttr)
        for r in token_entropy(planted).collect()
    }
    assert got[1] == (
        3, 2, round(math.log(3) - 2 * math.log(2) / 3, 6), round(2 / 3, 6)
    )
    assert got[2] == (4, 1, 0.0, 0.25)
    assert got[3] == (4, 4, round(math.log(4), 6), 1.0)
    assert got[4] == (0, 0, None, None)
    assert got[5] == (0, 0, None, None)


def test_extra_cols_passthrough(planted):
    rows = token_entropy(planted, extra_cols=["lang"]).collect()
    assert {(r.doc_id, r.lang) for r in rows} == {
        (1, "en"), (2, "en"), (3, "de"), (4, "de"), (5, "de")
    }


def test_documents_per_doc_oracle(spark, duck, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    got = {
        r.doc_id: (r.n_tokens, r.n_types, r.entropy, r.ttr)
        for r in token_entropy(docs).collect()
    }
    want = {
        d: (n, ty, e, tt)
        for d, _lang, n, ty, e, tt in duck.execute(
            f"WITH {PER_DOC_CTES} SELECT * FROM per_doc"
        ).fetchall()
    }
    assert len(got) == len(want) > 100
    assert got == want


def test_documents_profile_oracle(spark, duck, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    got = [
        (r.lang, r.entropy_bucket, r.n_docs, r.avg_entropy, r.avg_ttr,
         r.avg_tokens)
        for r in entropy_profile(docs).collect()
    ]
    want = [tuple(r) for r in duck.execute(PROFILE_SQL).fetchall()]
    assert got == want
    assert sum(r[2] for r in got) == docs.count()


def test_per_doc_scan_is_shuffle_free(planted):
    # the whole point of the sorted-run fold: no exchange anywhere in the
    # per-document pass
    plan = token_entropy(planted)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_profile_is_one_aggregate_exchange(planted):
    plan = entropy_profile(planted)._jdf.queryExecution().executedPlan().toString()
    # one hash-aggregate exchange (plus the final orderBy range exchange)
    assert plan.count("Exchange hashpartitioning") == 1
    assert "CartesianProduct" not in plan
