"""operators/winnow.py — winnowing fingerprints (staged r11 for an r12
registry face): planted rightmost-tie behavior, the SIGMOD-03 guarantee
(shared run >= k + w - 1 tokens => shared fingerprint), short-document
contract, the DuckDB oracle replay over documents, pair matching with
the frequency cap, and the zero-shuffle per-document plan gate."""

from __future__ import annotations

import pytest

from pipeline_calculator_v3_spark.functions.text import TOKENS_SQL
from pipeline_calculator_v3_spark.operators.winnow import (
    winnow_fingerprints,
    winnow_match_pairs,
)

K, W = 5, 4
PAD = 1_000_000_000


def oracle_sql(k: int, w: int, source: str = "documents") -> str:
    gram = " || ' ' || ".join(f"tok[i+{off}]" for off in range(k))
    return f"""
WITH t AS (
    SELECT doc_id, {TOKENS_SQL} AS tok FROM {source}
    WHERE len({TOKENS_SQL}) >= {k + w - 1}
),
staged AS (
    SELECT doc_id,
           list_transform(range(1, len(tok) - {k - 1} + 1),
               i -> md5({gram}) || format('{{:010d}}', {PAD} - i)) AS ks
    FROM t
),
sel AS (
    SELECT doc_id,
           unnest(list_distinct(list_transform(
               range(1, len(ks) - {w - 1} + 1),
               j -> list_aggregate(list_slice(ks, j, j + {w - 1}), 'min')
           ))) AS s
    FROM staged
)
SELECT doc_id, s[1:32] AS fp,
       CAST({PAD} - CAST(s[33:42] AS BIGINT) AS BIGINT) AS pos
FROM sel
"""


@pytest.fixture(scope="module")
def planted(spark):
    # doc 1: repetitive alternation (exercises the rightmost-tie rule);
    # docs 2 and 3 share a 10-token run (>= t = 8 at k=5, w=4) embedded
    # in different prefixes/suffixes; doc 4 is unrelated; doc 5 is below
    # the t-token threshold; docs 6-9 are byte-identical, so EVERY one of
    # their fingerprints has df=4 (exercises the max_df cap cleanly —
    # partially-shared text leaks df<=3 boundary fingerprints by design).
    shared = "the quick brown fox jumps over the lazy sleeping dog"
    boiler = "all rights reserved contact us for terms of service today"
    rows = [
        (1, "x y x y x y x y x y z"),
        (2, "alpha beta gamma " + shared + " delta epsilon"),
        (3, "one two three four five " + shared),
        (4, "completely different words with no overlap at all here"),
        (5, "too short"),
        (6, boiler),
        (7, boiler),
        (8, boiler),
        (9, boiler),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def _fp_rows(df):
    return {(r.doc_id, r.fp, r.pos) for r in df.collect()}


def test_planted_matches_duckdb(planted, duck):
    got = _fp_rows(winnow_fingerprints(planted, k=K, w=W))
    duck.register("planted_winnow", planted.toPandas())
    want = {
        (int(d), f, int(p))
        for d, f, p in duck.execute(
            oracle_sql(K, W, source="planted_winnow")
        ).fetchall()
    }
    assert got == want and len(got) > 0


def test_short_doc_has_no_fingerprints(planted):
    got = winnow_fingerprints(planted, k=K, w=W)
    assert got.where("doc_id = 5").count() == 0


def test_guarantee_shared_run_shares_fingerprint(planted):
    # the winnowing guarantee: docs 2 and 3 share a 10-token run >= t=8,
    # so they MUST share at least one fingerprint hash
    fps = winnow_fingerprints(planted, k=K, w=W)
    by_doc = {
        d: {r.fp for r in rows}
        for d, rows in (
            (2, fps.where("doc_id = 2").collect()),
            (3, fps.where("doc_id = 3").collect()),
            (4, fps.where("doc_id = 4").collect()),
        )
    }
    assert by_doc[2] & by_doc[3]
    assert not (by_doc[2] & by_doc[4])


def test_match_pairs_and_cap(planted):
    fps = winnow_fingerprints(planted, k=K, w=W)
    pairs = {
        (r.id_a, r.id_b): r.n_shared
        for r in winnow_match_pairs(fps, max_df=3).collect()
    }
    assert (2, 3) in pairs and pairs[(2, 3)] >= 1
    # the boilerplate fingerprints appear in 4 docs > max_df=3: capped
    # out, so none of 6-9 pair up (their tails are unique)
    assert not any(a >= 6 or b >= 6 for a, b in pairs)
    # raising the cap admits the boilerplate cluster
    pairs_hi = {
        (r.id_a, r.id_b)
        for r in winnow_match_pairs(fps, max_df=8).collect()
    }
    assert (6, 7) in pairs_hi and (8, 9) in pairs_hi


def test_documents_oracle_replay(spark, duck, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    got = _fp_rows(winnow_fingerprints(docs, k=K, w=W))
    want = {
        (int(d), f, int(p))
        for d, f, p in duck.execute(oracle_sql(K, W)).fetchall()
    }
    assert len(got) > 1000
    assert got == want


def test_density_bound(spark, sf_dir):
    # expected fingerprint density ~2/(w+1) of grams; assert a loose
    # ceiling so a broken window pass (selecting every gram) fails loudly
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    from pyspark.sql import functions as F

    n_fp = winnow_fingerprints(docs, k=K, w=W).count()
    n_grams = (
        docs.select(
            F.greatest(
                F.size(F.split(F.lower("text"), r"\s+")) - (K - 1), F.lit(0)
            ).alias("g")
        ).agg(F.sum("g")).collect()[0][0]
    )
    assert n_fp / n_grams < 0.75


def test_per_doc_pass_is_shuffle_free(planted):
    plan = (
        winnow_fingerprints(planted, k=K, w=W)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan


def test_arg_guards(planted):
    with pytest.raises(ValueError):
        winnow_fingerprints(planted, k=0)
    with pytest.raises(ValueError):
        winnow_match_pairs(winnow_fingerprints(planted), max_df=1)


# ---------------------------------------------------------------------------
# property gate: the Spark winnower against a pure-Python reference
# (exact md5 + rightmost-tie spelling) on random corpora, plus the
# paper's coverage guarantee asserted independently.
# ---------------------------------------------------------------------------
import hashlib

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_PAD = 1_000_000_000
_WORDS = st.sampled_from(["aa", "bb", "cc"])  # tiny alphabet forces ties


def _brute_winnow(toks, k, w):
    if len(toks) < k + w - 1:
        return set()
    keys = [
        hashlib.md5(" ".join(toks[i:i + k]).encode()).hexdigest()
        + "%010d" % (_PAD - (i + 1))
        for i in range(len(toks) - k + 1)
    ]
    sel = {min(keys[j:j + w]) for j in range(len(keys) - w + 1)}
    return {(s[:32], _PAD - int(s[32:42])) for s in sel}


@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(st.lists(st.lists(_WORDS, min_size=0, max_size=20).map(" ".join),
                min_size=1, max_size=6))
def test_winnow_matches_reference_and_covers_every_window(spark, texts):
    from pipeline_calculator_v3_spark.operators.winnow import (
        winnow_fingerprints,
    )

    k, w = 2, 3
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = {}
    for r in winnow_fingerprints(df, k=k, w=w).collect():
        got.setdefault(r.doc_id, set()).add((r.fp, r.pos))
    want = {
        i: _brute_winnow(t.split(), k, w)
        for i, t in enumerate(texts)
        if _brute_winnow(t.split(), k, w)
    }
    assert got == want, texts
    # the paper's guarantee, asserted from the OUTPUT alone: every
    # w-window of gram positions contains a selected position
    for i, t in enumerate(texts):
        n_grams = max(0, len(t.split()) - k + 1)
        if len(t.split()) < k + w - 1:
            continue
        poss = {p for _, p in got.get(i, set())}
        for j in range(1, n_grams - w + 2):
            assert poss & set(range(j, j + w)), (t, j)
