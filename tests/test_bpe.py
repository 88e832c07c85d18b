"""operators/bpe.py — BPE merge steps.

Third check: classic in-memory BPE (Sennrich 2016 reference algorithm —
dict of word->symbols, pair counting, left-to-right non-overlapping
merge) replayed in pure Python against the Spark/oracle pipeline, plus
targeted merge-semantics cases the separator encoding must get right
(consecutive overlaps, mid-symbol false matches).
"""

from __future__ import annotations

from collections import Counter

from pyspark.sql import functions as F

from pipeline_calculator_v3_spark import queries as Q
from pipeline_calculator_v3_spark.operators.bpe import (
    SEP,
    chars,
    merge_pair,
)


def _py_merge(syms: list[str], pair: tuple[str, str]) -> list[str]:
    """Reference left-to-right non-overlapping merge."""
    out, i = [], 0
    while i < len(syms):
        if (
            i + 1 < len(syms)
            and syms[i] == pair[0]
            and syms[i + 1] == pair[1]
        ):
            out.append(pair[0] + pair[1])
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return out


def _py_bpe(vocab: dict[str, int], steps: int):
    """Returns ([(pair, weight) per step], final symbol table)."""
    table = {w: [c for c in w] for w in vocab}
    merges = []
    for _ in range(steps):
        cnt: Counter = Counter()
        for w, syms in table.items():
            for a, b in zip(syms, syms[1:]):
                cnt[(a, b)] += vocab[w]
        # engines break weight ties on the SEP-joined pair string, not
        # the (p1, p2) tuple — match that exactly
        best = min(cnt.items(), key=lambda kv: (-kv[1], SEP.join(kv[0])))
        merges.append(best)
        table = {w: _py_merge(s, best[0]) for w, s in table.items()}
    return merges, table


def test_merge_pair_semantics(spark):
    """Consecutive occurrences merge pairwise; a symbol merely ENDING in
    p1 (or starting with p2) must not match."""
    rows = [
        (["a", "b", "a", "b"], "a" + SEP + "b", ["ab", "ab"]),
        (["x", "a", "b"], "a" + SEP + "b", ["x", "ab"]),
        (["xa", "b"], "a" + SEP + "b", ["xa", "b"]),
        (["a", "by"], "a" + SEP + "b", ["a", "by"]),
        (["l", "l", "l"], "l" + SEP + "l", ["ll", "l"]),
        (["ab", "ab"], "ab" + SEP + "ab", ["abab"]),
    ]
    df = spark.createDataFrame(
        [(s, p) for s, p, _ in rows], "syms array<string>, pair string"
    )
    got = df.select(
        merge_pair(F.col("syms"), F.col("pair")).alias("m")
    ).collect()
    for (syms, pair, expected), r in zip(rows, got):
        assert r["m"] == expected, (syms, pair, r["m"])
        p = tuple(pair.split(SEP))
        assert r["m"] == _py_merge(syms, p)


def test_chars_splits_to_single_characters(spark):
    df = spark.createDataFrame([("hello",), ("x",)], "tok string")
    got = [r["c"] for r in df.select(chars("tok").alias("c")).collect()]
    assert got == [["h", "e", "l", "l", "o"], ["x"]]


def test_bpe_query_matches_python_reference(spark, sf_dir):
    import re

    vocab: Counter = Counter()
    for r in (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("text")
        .collect()
    ):
        # re.ASCII: Java and RE2 \s are ASCII-only; SEP-bearing tokens
        # are excluded by the pipeline up front
        vocab.update(
            t
            for t in re.split(r"\s+", r["text"].lower(), flags=re.ASCII)
            if t and SEP not in t
        )
    merges, table = _py_bpe(dict(vocab), steps=2)

    got = Q.QUERIES["q_bpe_merges"](spark, sf_dir).collect()
    by_step = {}
    for r in got:
        by_step.setdefault(r["step"], []).append(r)
    for step in (1, 2):
        (row,) = by_step[step]
        (pair, w) = merges[step - 1]
        assert (row["p1"], row["p2"]) == pair, step
        assert row["weight"] == w, step
    # step 3: top-5 remaining pairs under the reference table
    cnt: Counter = Counter()
    for word, syms in table.items():
        for a, b in zip(syms, syms[1:]):
            cnt[(a, b)] += vocab[word]
    expected = sorted(cnt.items(), key=lambda kv: (-kv[1], SEP.join(kv[0])))[:5]
    got3 = sorted(by_step[3], key=lambda r: r["rnk"])
    assert [((r["p1"], r["p2"]), r["weight"]) for r in got3] == expected


def test_bpe_encode_matches_python_reference(spark, sf_dir):
    """q_bpe_encode third check: the 4-step trained table applied to every
    document in pure Python — per-doc token/symbol/char counts match."""
    import re

    docs = {
        r["doc_id"]: [
            t
            for t in re.split(r"\s+", r["text"].lower(), flags=re.ASCII)
            if t
        ]
        for r in spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", "text")
        .collect()
    }
    vocab: Counter = Counter()
    for toks in docs.values():
        vocab.update(t for t in toks if SEP not in t)
    _, table = _py_bpe(dict(vocab), steps=4)

    expected = {}
    for doc_id, toks in docs.items():
        enc = [t for t in toks if SEP not in t]
        if not enc:
            continue
        n_bpe = sum(len(table[t]) for t in enc)
        n_chars = sum(len(t) for t in enc)
        expected[doc_id] = (len(enc), n_bpe, n_chars)

    got = {
        r["doc_id"]: (r["n_tokens"], r["n_bpe"], r["n_chars"])
        for r in Q.QUERIES["q_bpe_encode"](spark, sf_dir).collect()
    }
    assert got == expected
