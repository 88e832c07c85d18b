"""operators/textnorm.py — Unicode NFC canonicalization (staged r11):
planted combining-sequence parity against DuckDB's nfc_normalize, the
hidden-duplicate recovery the step exists for, NULL/ASCII contracts,
the documents-table oracle replay of the impact report, and the pure-map
plan gate on the per-document pass."""

from __future__ import annotations

import pytest

from pipeline_calculator_v3_spark.operators.textnorm import (
    nfc_impact_report,
    nfc_normalize_docs,
)

# \u00e9 vs e + COMBINING ACUTE (U+0301); \u00c5 vs A + U+030A; \u00f6 vs
# o + COMBINING DIAERESIS (U+0308) — explicit escapes so no editor or
# tooling silently re-composes the fixtures.
COMPOSED = "r\u00e9sum\u00e9 \u00c5ngstr\u00f6m"
COMBINING = "re\u0301sume\u0301 A\u030angstro\u0308m"

PLANTED = [
    (1, COMPOSED, "en"),            # already NFC: unchanged
    (2, COMBINING, "en"),             # NFC-equal to doc 1: hidden dup
    (3, "plain ascii text", "en"),    # identity under NFC
    (4, None, "de"),                  # NULL text == empty document
    (5, "plain ascii text", "en"),    # exact dup of 3 pre- AND post-NFC
]

REPORT_ORACLE = """
WITH n AS (
    SELECT doc_id, lang, coalesce(text, '') AS raw,
           nfc_normalize(coalesce(text, '')) AS t2
    FROM documents
),
f AS (
    SELECT doc_id, lang, raw <> t2 AS changed,
           md5(lower(trim(regexp_replace(raw, '\\s+', ' ', 'g')))) AS fp_raw,
           md5(lower(trim(regexp_replace(t2, '\\s+', ' ', 'g')))) AS fp_nfc
    FROM n
),
dup_raw AS (
    SELECT lang, CAST(sum(n) AS BIGINT) AS n_dup_docs_raw
    FROM (SELECT lang, fp_raw, count(*) AS n FROM f GROUP BY 1, 2)
    WHERE n >= 2 GROUP BY lang
),
dup_nfc AS (
    SELECT lang, CAST(sum(n) AS BIGINT) AS n_dup_docs_nfc
    FROM (SELECT lang, fp_nfc, count(*) AS n FROM f GROUP BY 1, 2)
    WHERE n >= 2 GROUP BY lang
)
SELECT f.lang, CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(CASE WHEN changed THEN 1 ELSE 0 END) AS BIGINT) AS n_changed,
       coalesce(ANY_VALUE(dr.n_dup_docs_raw), 0) AS n_dup_docs_raw,
       coalesce(ANY_VALUE(dn.n_dup_docs_nfc), 0) AS n_dup_docs_nfc
FROM f
LEFT JOIN dup_raw dr USING (lang)
LEFT JOIN dup_nfc dn USING (lang)
GROUP BY f.lang
ORDER BY f.lang
"""


@pytest.fixture(scope="module")
def planted(spark):
    return spark.createDataFrame(PLANTED, "doc_id long, text string, lang string")


def test_planted_nfc_values(planted, duck):
    got = {
        r.doc_id: (r.text_nfc, r.changed, r.n_cp_raw, r.n_cp_nfc)
        for r in nfc_normalize_docs(planted).collect()
    }
    # doc 2's combining sequences compose to doc 1's precomposed form
    assert got[2][0] == COMPOSED and got[2][1] is True
    assert got[2][2] > got[2][3]  # composition shrank the codepoint count
    assert got[1] == (COMPOSED, False, len(COMPOSED), len(COMPOSED))
    assert got[3][1] is False and got[4] == ("", False, 0, 0)
    # engine parity on the planted sequences
    want = duck.execute(
        "SELECT nfc_normalize(?), nfc_normalize(?)", [COMBINING, COMPOSED]
    ).fetchone()
    assert got[2][0] == want[0] == want[1]


def test_hidden_duplicate_recovered(planted):
    rep = {
        r.lang: (r.n_docs, r.n_changed, r.n_dup_docs_raw, r.n_dup_docs_nfc)
        for r in nfc_impact_report(planted).collect()
    }
    # en: docs 3 and 5 are raw dups; NFC additionally merges 1 and 2
    assert rep["en"] == (4, 1, 2, 4)
    assert rep["de"] == (1, 0, 0, 0)


def test_documents_report_oracle(spark, duck, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    got = [
        (r.lang, r.n_docs, r.n_changed, r.n_dup_docs_raw, r.n_dup_docs_nfc)
        for r in nfc_impact_report(docs).collect()
    ]
    want = [tuple(r) for r in duck.execute(REPORT_ORACLE).fetchall()]
    assert got == want
    assert sum(r[1] for r in got) == docs.count()


def test_extra_cols_types_preserved(planted):
    df = nfc_normalize_docs(planted, extra_cols=["lang"])
    kinds = dict(df.dtypes)
    assert kinds["lang"] == "string" and kinds["doc_id"] == "bigint"
    assert kinds["n_cp_raw"] == "bigint"


def test_per_doc_pass_is_pure_map(planted):
    plan = (
        nfc_normalize_docs(planted)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan
    assert "MapInPandas" in plan


def test_null_group_duplicate_mass_is_reported(spark):
    """Documents with a NULL group key form a real group under groupBy;
    the on-names left join never matched it, so the NULL group's
    duplicate counts silently coalesced to 0 (r14 null-unsafe-join
    audit; fails pre-fix)."""
    from pipeline_calculator_v3_spark.operators.textnorm import (
        nfc_impact_report,
    )

    rows = [
        (1, None, "same text"), (2, None, "same text"),
        (3, "en", "other"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    got = {r.lang: r for r in nfc_impact_report(df).collect()}
    assert got[None].n_docs == 2
    assert got[None].n_dup_docs_raw == 2
    assert got["en"].n_dup_docs_raw == 0
