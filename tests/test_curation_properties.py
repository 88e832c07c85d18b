"""Adversarial-corpus invariants for the curation funnel — crafted inputs
the synthetic documents table never produces (exact duplicates differing
only in whitespace/case, docs overlapping the benchmark holdout, sub-30
token fragments), checking stage semantics directly."""

from __future__ import annotations

import pytest

import pipeline_calculator_v3_spark.queries  # noqa: F401  (registry first)
from pipeline_calculator_v3_spark.queries_pipeline import curation_stages_from

LONG = " ".join(f"tok{i}" for i in range(40))          # 40 tokens, passes quality
OTHER = " ".join(f"alt{i}" for i in range(40))
BENCHY = " ".join(f"bench{i}" for i in range(40))       # shares 8-grams with id 30


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [
        # exact-dup family: same normalized fingerprint, different raw text
        (1, LONG),
        (2, LONG.upper()),
        (3, "  " + LONG.replace(" ", "   ") + " \n"),
        # unique survivor
        (5, OTHER),
        # quality rejects: short doc and empty doc
        (7, "too short"),
        (9, "   "),
        # benchmark holdout doc (doc_id % 10 == 0) + a train doc sharing
        # its 8-grams
        (30, BENCHY),
        (11, BENCHY + " trailer"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


@pytest.fixture(scope="module")
def stages(corpus):
    return {
        name: frame.select("doc_id").toPandas()["doc_id"].tolist()
        for name, frame in curation_stages_from(corpus)
    }


def test_raw_drops_only_empty(stages):
    assert sorted(stages["raw"]) == [1, 2, 3, 5, 7, 11, 30]


def test_quality_drops_short_docs(stages):
    assert sorted(stages["quality"]) == [1, 2, 3, 5, 11, 30]


def test_exact_dedup_collapses_whitespace_case_variants(stages):
    # docs 1/2/3 share the normalized fingerprint; min doc_id wins
    kept = set(stages["exact_dedup"])
    assert 1 in kept
    assert 2 not in kept and 3 not in kept
    assert {5, 11, 30} <= kept


def test_stage_sets_are_nested(stages):
    order = ["raw", "quality", "exact_dedup", "near_dedup",
             "decontaminated", "sampled"]
    for a, b in zip(order, order[1:]):
        assert set(stages[b]) <= set(stages[a]), (a, b)


def test_decontamination_excludes_bench_and_overlapping_train(stages):
    clean = set(stages["decontaminated"])
    # the holdout doc itself is never part of the curated corpus
    assert 30 not in clean
    # the train doc sharing the holdout's 8-grams is flagged out
    assert 11 not in clean
    # untainted survivors remain
    assert 1 in clean and 5 in clean


def test_funnel_on_empty_corpus_is_empty_not_a_crash(spark):
    empty = spark.createDataFrame([], "doc_id long, text string")
    for name, frame in curation_stages_from(empty):
        assert frame.count() == 0, name
