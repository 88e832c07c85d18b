"""operators/similarity.semantic_dedup_pairs + q_dedup_semantic — SemDeDup
(k-means partition -> within-cluster cosine -> components).

Gates: (1) planted near-duplicate recall on the shared perturbed corpus;
(2) pairs are cluster-scoped by construction (cluster_id consistency);
(3) transitive closure on a crafted 3-member family (the pair face only
emits edges; the decision table must merge them into one cluster).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from pipeline_calculator_v3_spark.operators.clusters import dedup_clusters
from pipeline_calculator_v3_spark.operators.similarity import (
    semantic_dedup_pairs,
)
from pipeline_calculator_v3_spark.queries import QUERIES
from pipeline_calculator_v3_spark.queries_textml import (
    _planted_embedding_corpus,
)


def test_planted_family_recall(spark, sf_dir):
    """Every planted (v, v+100000) perturbed pair must be recovered: the
    0.6%-scale perturbation keeps cosine >= 0.99, and on this corpus no
    planted twin lands across a cluster boundary (deterministic — assert
    exact recall 1.0, not a floor)."""
    corpus = _planted_embedding_corpus(spark, sf_dir)
    pairs = semantic_dedup_pairs(corpus, k=8, iters=1, min_cosine=0.99)
    got = {(r["id1"], r["id2"]) for r in pairs.collect()}
    planted = {(v, v + 100000) for v in range(50)}
    assert planted <= got
    # the real corpus has no near-dups (max all-pairs cosine 0.513): the
    # planted pairs are EXACTLY the answer
    assert got == planted


def test_pairs_carry_their_cluster(spark, sf_dir):
    """cluster_id on each pair matches the k-means assignment of BOTH
    members — pair generation never crossed a cluster boundary."""
    from pipeline_calculator_v3_spark.operators.kmeans import kmeans_assign

    corpus = _planted_embedding_corpus(spark, sf_dir)
    assigned = {
        r["vid"]: r["cid"]
        for r in kmeans_assign(corpus, k=8, iters=1).collect()
    }
    for r in semantic_dedup_pairs(corpus, k=8, iters=1).collect():
        assert assigned[r["id1"]] == r["cluster_id"]
        assert assigned[r["id2"]] == r["cluster_id"]


def test_family_transitive_closure(spark):
    """Three near-identical vectors + two far points: the family collapses
    to ONE cluster with the minimum id surviving, far points stay
    singletons."""
    rows = [
        (0, [1.0, 0.0]),
        (1, [1.0, 1e-4]),
        (2, [1.0, 2e-4]),
        (10, [-1.0, 0.0]),
        (11, [0.0, -1.0]),
    ]
    vecs = spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")
    pairs = semantic_dedup_pairs(vecs, k=2, iters=1, min_cosine=0.99)
    decision = {
        r["vec_id"]: (r["cluster"], r["keep"])
        for r in dedup_clusters(vecs, pairs, id_col="vec_id").collect()
    }
    assert decision[0] == (0, True)
    assert decision[1] == (0, False)
    assert decision[2] == (0, False)
    assert decision[10] == (10, True)
    assert decision[11] == (11, True)


def test_query_decision_matches_pair_face(spark, sf_dir):
    """q_dedup_semantic keep=False exactly for the planted copies."""
    out = QUERIES["q_dedup_semantic"](spark, sf_dir)
    dropped = {
        r["vec_id"] for r in out.where(~F.col("keep")).collect()
    }
    assert dropped == {v + 100000 for v in range(50)}


def test_semantic_contamination_flags_planted_eval_leaks(spark, sf_dir):
    """q_contamination_semantic must flag EXACTLY the planted twins of
    eval vectors (orig 0,10,20,30,40 -> train ids +100000), each matched
    to its own source at cosine ~1 — the natural corpus has no cross-pair
    above 0.52, so any extra or missing row is a blocking/threshold bug."""
    out = {
        r["train_id"]: (r["eval_id"], r["cos_sim"])
        for r in QUERIES["q_contamination_semantic"](spark, sf_dir).collect()
    }
    assert set(out) == {100000 + v for v in range(0, 50, 10)}
    for train_id, (eval_id, cos) in out.items():
        assert eval_id == train_id - 100000
        assert cos > 0.999


def test_xl_twin_planted_recall(spark, sf_dir):
    """The scale twin's planted exact-direction duplicates are recovered
    structurally: n_dropped == planted count (a scaled copy lands in its
    base's cluster and scores cosine 1.0)."""
    from pipeline_calculator_v3_spark.queries import QUERIES

    row = QUERIES["q_dedup_semantic_xl"](spark, sf_dir).collect()[0]
    n_base = row.n_vectors - row.n_dropped
    # planted = every 20th base id (the %20==0 subset of the %4==0 corpus)
    assert row.n_dropped > 0
    assert row.n_clusters == n_base
