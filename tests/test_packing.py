"""Sequence-packing invariants (operators/packing.py).

Concat-and-slice semantics: per shard, documents lie end-to-end in doc_id
order and the token stream is cut every `budget` tokens; a document belongs
to the example its span starts in.  The invariants below pin exactly that
layout, independent of the oracle (which re-checks values at the corpus
level)."""

from __future__ import annotations

import pytest

from pipeline_calculator_v3_spark.operators.packing import pack_sequences


def _docs(spark, n_tokens_per_doc):
    rows = [
        (i, " ".join(f"w{j}" for j in range(k)))
        for i, k in enumerate(n_tokens_per_doc)
    ]
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def test_single_shard_golden(spark):
    # one shard -> pure sequential packing we can hand-compute:
    # docs of 100 tokens each, budget 250: starts 0,100,200,300,...
    # example 0 gets starts {0,100,200} (300 tokens), example 1 gets
    # {300,400} (200), example 2 gets {500,600,700} ...
    out = pack_sequences(
        _docs(spark, [100] * 8), budget=250, n_shards=1
    ).collect()
    by_ex = {r.example_id: r for r in out}
    assert by_ex[0].n_docs == 3 and by_ex[0].n_tokens == 300
    assert by_ex[0].first_doc == 0 and by_ex[0].last_doc == 2
    assert by_ex[1].n_docs == 2 and by_ex[1].n_tokens == 200
    assert by_ex[2].n_docs == 3


def test_every_doc_packed_exactly_once(spark):
    docs = _docs(spark, [7, 30, 512, 1, 90, 44, 3, 600, 12, 256])
    out = pack_sequences(docs, budget=128, n_shards=4).collect()
    assert sum(r.n_docs for r in out) == 10
    assert sum(r.n_tokens for r in out) == 7 + 30 + 512 + 1 + 90 + 44 + 3 + 600 + 12 + 256


def test_examples_are_contiguous_doc_ranges(spark):
    # within a shard, examples partition the doc_id order: sorted by
    # example_id, the doc ranges must be adjacent and non-overlapping
    docs = _docs(spark, [50] * 40)
    out = pack_sequences(docs, budget=120, n_shards=2).collect()
    shards = {r.shard for r in out}
    for s in shards:
        exs = sorted((r for r in out if r.shard == s), key=lambda r: r.example_id)
        for a, b in zip(exs, exs[1:]):
            assert a.last_doc < b.first_doc


def test_overrun_bounded_by_one_doc(spark):
    # an example never exceeds budget by more than (max doc len - 1): a doc
    # starting inside the window contributes wholly to it
    sizes = [33, 470, 12, 100, 128, 9, 514, 77, 1, 250]
    out = pack_sequences(_docs(spark, sizes), budget=128, n_shards=1).collect()
    for r in sorted(out, key=lambda r: r.example_id)[:-1]:
        assert r.n_tokens < 128 + max(sizes)


def test_empty_docs_excluded_and_bad_args_raise(spark):
    docs = _docs(spark, [0, 5, 0, 7])
    out = pack_sequences(docs, budget=16, n_shards=1).collect()
    assert sum(r.n_docs for r in out) == 2
    with pytest.raises(ValueError):
        pack_sequences(docs, budget=0)
    with pytest.raises(ValueError):
        pack_sequences(docs, n_shards=0)


# ---------------------------------------------------------------------------
# property gate: pack_sequences against a pure-Python reference packer
# (exact md5 shard + prefix-sum/budget example assignment).
# ---------------------------------------------------------------------------
import hashlib

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st


def _ref_pack(doc_toks, budget, n_shards):
    """doc_toks: {doc_id: n_tokens>0}; returns {(shard, example_id):
    (n_docs, n_tokens, first_doc, last_doc)}."""
    shards = {}
    for d in sorted(doc_toks):
        s = int(hashlib.md5(str(d).encode()).hexdigest()[:8], 16) % n_shards
        shards.setdefault(s, []).append(d)
    out = {}
    for s, ds in shards.items():
        start = 0
        for d in ds:
            ex = start // budget
            key = (s, ex)
            nd, nt, fd, ld = out.get(key, (0, 0, d, d))
            out[key] = (nd + 1, nt + doc_toks[d], min(fd, d), max(ld, d))
            start += doc_toks[d]
    return out


@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    lens=st.lists(st.integers(min_value=0, max_value=9),
                  min_size=1, max_size=30),
    budget=st.integers(min_value=1, max_value=12),
    n_shards=st.integers(min_value=1, max_value=4),
)
def test_pack_matches_reference(spark, lens, budget, n_shards):
    from pipeline_calculator_v3_spark.operators.packing import pack_sequences

    rows = [(i, " ".join(["tok"] * n)) for i, n in enumerate(lens)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r.shard, r.example_id): (r.n_docs, r.n_tokens, r.first_doc,
                                  r.last_doc)
        for r in pack_sequences(df, budget=budget, n_shards=n_shards)
        .collect()
    }
    want = _ref_pack(
        {i: n for i, n in enumerate(lens) if n > 0}, budget, n_shards
    )
    assert got == want, (lens, budget, n_shards)
