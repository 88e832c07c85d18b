"""operators/postings.py — inverted-index build (staged r11 for an r12
registry face): planted-corpus exactness, the intended DuckDB oracle
replay over the documents table, salt-invariance of the two-phase top-k,
cap semantics (stats stay exact past the cap), and plan lints."""

from __future__ import annotations

import pytest

from pipeline_calculator_v3_spark.functions.text import TOKENS_SQL
from pipeline_calculator_v3_spark.operators.postings import postings_index

# Planted corpus: "hot" appears in every doc (the head-term / skew case,
# df past any small cap), "cold" in one, "warm" in two with distinct tfs.
PLANTED = [
    (1, "hot hot warm"),
    (2, "hot cold"),
    (3, "warm warm warm hot"),
    (4, "hot"),
]


# The intended r12 face oracle (term-level replay; the face will wrap it
# with a top-terms LIMIT).  Mirrors the operator contract exactly:
# per-(term, doc) tf + first position, exact df/cf over ALL postings,
# (tf DESC, doc_id ASC) ranking capped at max_postings.
def oracle_sql(k: int, source: str = "documents") -> str:
    return f"""
WITH t AS (SELECT doc_id, {TOKENS_SQL} AS tok FROM {source}),
occ AS (
    SELECT doc_id, unnest(tok) AS term,
           unnest(range(0, len(tok))) AS pos
    FROM t
),
pairs AS (
    SELECT term, doc_id, CAST(count(*) AS BIGINT) AS tf,
           CAST(min(pos) AS BIGINT) AS first_pos
    FROM occ GROUP BY 1, 2
),
stats AS (
    SELECT term, CAST(count(*) AS BIGINT) AS df,
           CAST(sum(tf) AS BIGINT) AS cf
    FROM pairs GROUP BY 1
),
ranked AS (
    SELECT term, doc_id, tf, first_pos,
           CAST(row_number() OVER (
               PARTITION BY term ORDER BY tf DESC, doc_id) AS INT) AS rank
    FROM pairs
)
SELECT r.term, s.df, s.cf, r.rank, r.doc_id, r.tf, r.first_pos
FROM ranked r JOIN stats s USING (term)
WHERE r.rank <= {k}
ORDER BY term, rank
"""


def _rows(df):
    return sorted(
        (r.term, r.df, r.cf, r.rank, r.doc_id, r.tf, r.first_pos)
        for r in df.collect()
    )


@pytest.fixture(scope="module")
def planted(spark):
    return spark.createDataFrame(PLANTED, "doc_id long, text string")


def test_planted_exact(planted):
    got = _rows(postings_index(planted, max_postings=2, salt_buckets=4))
    assert got == sorted(
        [
            # hot: df=4 cf=5; tf order (doc1 tf=2) then doc_id tiebreak
            ("hot", 4, 5, 1, 1, 2, 0),
            ("hot", 4, 5, 2, 2, 1, 0),
            # warm: df=2 cf=4; doc3 tf=3 first_pos=0, doc1 tf=1 pos=2
            ("warm", 2, 4, 1, 3, 3, 0),
            ("warm", 2, 4, 2, 1, 1, 2),
            ("cold", 1, 1, 1, 2, 1, 1),
        ]
    )


def test_cap_keeps_stats_exact(planted):
    # cap=1 drops postings but df/cf still count ALL of them
    got = {
        r.term: (r.df, r.cf, r.doc_id)
        for r in postings_index(planted, max_postings=1).collect()
    }
    assert got["hot"] == (4, 5, 1)
    assert got["warm"] == (2, 4, 3)
    assert len(got) == 3  # exactly one row per term at cap 1


def test_salt_invariance(planted):
    # the two-phase salted top-k must equal the single-partition ranking
    # for every salt width (the order is total, so salting is lossless)
    base = _rows(postings_index(planted, max_postings=2, salt_buckets=1))
    for buckets in (2, 7, 64):
        assert (
            _rows(postings_index(planted, max_postings=2,
                                  salt_buckets=buckets)) == base
        )


def test_documents_oracle_replay(spark, duck, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    got = _rows(postings_index(docs, max_postings=8))
    want = sorted(tuple(r) for r in duck.execute(oracle_sql(8)).fetchall())
    assert len(got) > 100
    assert got == want


def test_plan_lints(planted):
    plan = postings_index(planted)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoop" not in plan


def test_arg_validation(planted):
    with pytest.raises(ValueError):
        postings_index(planted, max_postings=0)
    with pytest.raises(ValueError):
        postings_index(planted, salt_buckets=0)
