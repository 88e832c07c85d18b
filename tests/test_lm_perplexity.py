"""q_lm_perplexity — bigram-LM perplexity quality filter.

Third check (oracle-authoring trap): the Spark query and its DuckDB
oracle share the same formula text, so an independent pure-Python
replay from the raw parquet guards against both engines agreeing on a
wrong formula.
"""

from __future__ import annotations

import math
import re
from collections import Counter

import pytest

from pipeline_calculator_v3_spark import queries as Q

ALPHA = 0.5


def _score_all(rows):
    """(doc_id, n_bigrams, nll_bits, ppl) for every scoreable document."""
    docs = {}
    for doc_id, text in rows:
        if text is None:
            continue
        toks = [
            t for t in re.split(r"\s+", text.lower(), flags=re.ASCII) if t
        ]
        if len(toks) > 1:
            docs[doc_id] = toks
    cnt: Counter = Counter()
    vocab = set()
    for toks in docs.values():
        vocab.update(toks)
        cnt.update(zip(toks, toks[1:]))
    total: Counter = Counter()
    for (ctx, _), c in cnt.items():
        total[ctx] += c
    v = len(vocab)
    out = []
    for doc_id, toks in docs.items():
        terms = [
            -math.log2((cnt[b] + ALPHA) / (total[b[0]] + ALPHA * v))
            for b in zip(toks, toks[1:])
        ]
        nll = round(sum(terms) / len(terms), 6)
        out.append((doc_id, len(terms), nll, round(2.0**nll, 4)))
    return out


def _load(spark, sf_dir):
    return [
        (r["doc_id"], r["text"])
        for r in spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", "text")
        .collect()
    ]


def test_perplexity_matches_python_reference(spark, sf_dir):
    scores = _score_all(_load(spark, sf_dir))
    scores.sort(key=lambda r: (-r[2], r[0]))
    expected = scores[:20]
    got = Q.QUERIES["q_lm_perplexity"](spark, sf_dir).collect()
    assert [r["doc_id"] for r in got] == [e[0] for e in expected]
    for r, e in zip(got, expected):
        assert r["n_bigrams"] == e[1]
        assert r["nll_bits"] == pytest.approx(e[2], abs=2e-6)
        assert r["ppl"] == pytest.approx(e[3], abs=2e-4)


def test_perplexity_surfaces_the_high_end(spark, sf_dir):
    """Direction sanity: every surfaced nll_bits must sit at or above the
    corpus median (a flipped sort would still hash-match a same-flipped
    oracle, so parity alone can't catch it)."""
    scores = sorted(s[2] for s in _score_all(_load(spark, sf_dir)))
    med = scores[len(scores) // 2]
    got = Q.QUERIES["q_lm_perplexity"](spark, sf_dir).collect()
    assert got and all(r["nll_bits"] >= med for r in got)
