"""Retrieval / LM-statistics queries: q_bm25_rank, q_bigram_lm, and the
Efraimidis–Spirakis weighted sampler behind q_sample_weighted.

Each scoring formula gets a THIRD independent recompute in plain
Python/numpy (the oracle-authoring trap: Spark and DuckDB agreeing proves
nothing if both sides replay the same wrong formula — see
tests/test_analytics.py for the pattern).
"""

from __future__ import annotations

import hashlib
import math
import re

import pytest
from pyspark.sql import functions as F

from pipeline_calculator_v3_spark import queries as Q
from pipeline_calculator_v3_spark import queries_pipeline  # noqa: F401
from pipeline_calculator_v3_spark import queries_textml as qt  # noqa: F401
from pipeline_calculator_v3_spark.operators.sampling import weighted_key_sql


def _tok(text: str) -> list[str]:
    return [t for t in re.split(r"\s+", text.lower()) if t]


def _md5_u(key: str) -> float:
    """Independent recompute of the deterministic uniform: md5 32-bit
    prefix mapped into (0, 1]."""
    v = int(hashlib.md5(key.encode()).hexdigest()[:8], 16)
    return (v + 1) / 2**32


# ---------------------------------------------------------------------------
# weighted sampling
# ---------------------------------------------------------------------------
def test_weighted_key_matches_python_recompute(spark):
    """The shared SQL spelling must equal ln(u)/w recomputed from stdlib
    hashlib + math — catches a wrong Horner expansion, off-by-one in the
    uniform, or a dropped clamp on BOTH engines at once."""
    expr = weighted_key_sql("CAST(id AS STRING)", "w")
    rows = (
        spark.range(200)
        .select("id", (F.col("id") % 7 + 1).alias("w"))
        .select("id", "w", F.expr(expr).alias("k"))
        .collect()
    )
    for r in rows:
        expected = math.log(_md5_u(str(r["id"]))) / max(r["w"], 1)
        assert r["k"] == pytest.approx(expected, rel=1e-12), r


def test_weighted_key_prefers_heavy_rows(spark):
    """Selection-probability sanity: with weights 1 vs 100 split evenly
    over 2000 keys, the top-100 ES keys must be overwhelmingly drawn from
    the heavy stratum (each heavy row's key is ~100x closer to 0)."""
    expr = weighted_key_sql("CAST(id AS STRING)", "w")
    top = (
        spark.range(2000)
        .select(
            "id", F.when(F.col("id") % 2 == 0, 100).otherwise(1).alias("w")
        )
        .select("w", F.expr(expr).alias("k"))
        .orderBy(F.desc("k"))
        .limit(100)
        .collect()
    )
    heavy = sum(1 for r in top if r["w"] == 100)
    assert heavy >= 95, f"only {heavy}/100 heavy rows selected"


def test_weighted_key_zero_weight_clamped(spark):
    """w <= 0 must clamp to 1, not raise (ANSI DIVIDE_BY_ZERO) or emit
    NULL/-inf keys that would float to the top of the DESC sort."""
    expr = weighted_key_sql("CAST(id AS STRING)", "w")
    rows = (
        spark.range(5)
        .select("id", (F.col("id") - 2).alias("w"))
        .select("id", "w", F.expr(expr).alias("k"))
        .collect()
    )
    for r in rows:
        w_eff = max(r["w"], 1)
        expected = math.log(_md5_u(str(r["id"]))) / w_eff
        assert r["k"] == pytest.approx(expected, rel=1e-12)


# ---------------------------------------------------------------------------
# BM25
# ---------------------------------------------------------------------------
def test_bm25_matches_python_recompute(spark, sf_dir):
    """Full-query third check: recompute every returned score from raw
    documents with stdlib-only BM25 (k1=1.2, b=0.75, positive-idf form)."""
    docs = {
        r["doc_id"]: _tok(r["text"])
        for r in spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", "text")
        .collect()
    }
    n_docs = len(docs)
    avgdl = sum(len(t) for t in docs.values()) / n_docs
    k1, b = qt._BM25_K1, qt._BM25_B
    # df hoisted out of the per-doc loop (review r07: recomputing it per
    # score() call made this test O(N^2) in corpus size)
    dfreq = {
        term: sum(1 for t in docs.values() if term in t)
        for term in qt._BM25_TERMS
    }

    def score(toks: list[str]) -> tuple[float, int]:
        s, n = 0.0, 0
        for term in qt._BM25_TERMS:
            tf = toks.count(term)
            if tf == 0:
                continue
            idf = math.log((n_docs - dfreq[term] + 0.5) / (dfreq[term] + 0.5) + 1.0)
            s += idf * tf * (k1 + 1.0) / (tf + k1 * (1 - b + b * len(toks) / avgdl))
            n += 1
        return s, n

    got = Q.QUERIES["q_bm25_rank"](spark, sf_dir).collect()
    assert len(got) == 20
    for r in got:
        exp_s, exp_n = score(docs[r["doc_id"]])
        assert r["score"] == pytest.approx(round(exp_s, 6), abs=2e-6)
        assert r["n_terms"] == exp_n
    # and the 20 returned docs are the true argmax set under the recompute
    scores = {i: score(tk)[0] for i, tk in docs.items()}
    ranked = sorted(
        ((round(sc, 6), -i) for i, sc in scores.items() if sc > 0),
        reverse=True,
    )[:20]
    expected_ids = {-neg for _, neg in ranked}
    assert {r["doc_id"] for r in got} == expected_ids


# ---------------------------------------------------------------------------
# bigram LM
# ---------------------------------------------------------------------------
def test_bigram_lm_matches_python_recompute(spark, sf_dir):
    """Third check: bigram counts, context totals, top-5 contexts, and the
    per-context top-3 with conditional probabilities, all from stdlib."""
    from collections import Counter

    bi: Counter = Counter()
    for r in (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("text")
        .collect()
    ):
        toks = _tok(r["text"])
        bi.update(zip(toks, toks[1:]))
    tot: Counter = Counter()
    for (ctx, _), c in bi.items():
        tot[ctx] += c
    top_ctx = sorted(tot, key=lambda c: (-tot[c], c))[:5]

    got = Q.QUERIES["q_bigram_lm"](spark, sf_dir).collect()
    assert {r["ctx"] for r in got} == set(top_ctx)
    for ctx in top_ctx:
        rows = sorted(
            (r for r in got if r["ctx"] == ctx), key=lambda r: r["rnk"]
        )
        expected = sorted(
            ((n, c) for (cx, n), c in bi.items() if cx == ctx),
            key=lambda p: (-p[1], p[0]),
        )[:3]
        assert [(r["nxt"], r["cnt"]) for r in rows] == expected
        for r in rows:
            assert r["prob"] == pytest.approx(
                round(r["cnt"] / tot[ctx], 9), abs=1e-9
            )


def test_bigram_lm_probabilities_bounded(spark, sf_dir):
    df = Q.QUERIES["q_bigram_lm"](spark, sf_dir)
    rows = df.collect()
    assert all(0.0 < r["prob"] <= 1.0 for r in rows)
    assert all(1 <= r["rnk"] <= 3 for r in rows)
    # per context: at most 3 rows, probabilities non-increasing in rank
    by_ctx: dict[str, list] = {}
    for r in rows:
        by_ctx.setdefault(r["ctx"], []).append(r)
    assert len(by_ctx) == 5
    for ctx_rows in by_ctx.values():
        ctx_rows.sort(key=lambda r: r["rnk"])
        assert len(ctx_rows) <= 3
        probs = [r["prob"] for r in ctx_rows]
        assert probs == sorted(probs, reverse=True)


# ---------------------------------------------------------------------------
# hybrid RRF
# ---------------------------------------------------------------------------
def test_hybrid_rrf_matches_python_recompute(spark, sf_dir):
    """Full-fusion third check: BM25 ranks, dense cosine ranks against the
    mean-of-vectors-0..3 query, and the RRF combination, recomputed with
    stdlib + numpy only."""
    import numpy as np

    docs = {
        r["doc_id"]: _tok(r["text"])
        for r in spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", "text")
        .collect()
    }
    n_docs = len(docs)
    avgdl = sum(len(t) for t in docs.values()) / n_docs
    k1, b = qt._BM25_K1, qt._BM25_B

    dfreq = {
        term: sum(1 for t in docs.values() if term in t)
        for term in qt._BM25_TERMS
    }

    def bm25(toks):
        s = 0.0
        for term in qt._BM25_TERMS:
            tf = toks.count(term)
            if tf == 0:
                continue
            s += (
                math.log((n_docs - dfreq[term] + 0.5) / (dfreq[term] + 0.5) + 1.0)
                * tf * (k1 + 1.0)
                / (tf + k1 * (1 - b + b * len(toks) / avgdl))
            )
        return round(s, 6)

    bm25_scores = {i: bm25(tk) for i, tk in docs.items()}
    lex_ranked = sorted(
        ((sc, i) for i, sc in bm25_scores.items() if sc > 0),
        key=lambda p: (-p[0], p[1]),
    )[: qt._RRF_SIGNAL_N]
    r_lex = {i: r + 1 for r, (_, i) in enumerate(lex_ranked)}

    emb = {
        r["vec_id"]: np.array(r["embedding"], dtype=np.float64)
        for r in spark.read.parquet(f"{sf_dir}/embeddings.parquet").collect()
    }
    qv = np.mean([emb[i] for i in range(4)], axis=0)
    cos = {
        vid: round(
            float(v @ qv / (np.linalg.norm(v) * np.linalg.norm(qv))), 9
        )
        for vid, v in emb.items()
        if vid in docs
    }
    dense_ranked = sorted(cos.items(), key=lambda p: (-p[1], p[0]))[
        : qt._RRF_SIGNAL_N
    ]
    r_dense = {i: r + 1 for r, (i, _) in enumerate(dense_ranked)}

    fused = {}
    for i in set(r_lex) | set(r_dense):
        s = 0.0
        if i in r_lex:
            s += 1.0 / (qt._RRF_K + r_lex[i])
        if i in r_dense:
            s += 1.0 / (qt._RRF_K + r_dense[i])
        fused[i] = round(s, 9)
    expected = sorted(fused.items(), key=lambda p: (-p[1], p[0]))[:20]

    got = Q.QUERIES["q_hybrid_rrf"](spark, sf_dir).collect()
    assert [(r["doc_id"], r["rrf_score"]) for r in got] == [
        (i, pytest.approx(s, abs=1e-9)) for i, s in expected
    ]
    for r in got:
        assert r["r_lex"] == r_lex.get(r["doc_id"])
        assert r["r_dense"] == r_dense.get(r["doc_id"])


def test_hybrid_rrf_single_signal_docs_survive(spark, sf_dir):
    """The FULL OUTER fusion must keep documents present in only one
    signal (NULL rank on the other side) rather than dropping them."""
    rows = Q.QUERIES["q_hybrid_rrf"](spark, sf_dir).collect()
    assert len(rows) == 20
    assert all(
        r["r_lex"] is not None or r["r_dense"] is not None for r in rows
    )
