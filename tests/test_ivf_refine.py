"""operators/similarity.py::cosine_topk_ivf_refine — the FAISS-style
IVF + exact-refine ANN on the unit-normalized ingest contract (r11,
VERDICT r10 #6): code quantization bounds, exact-rescore correctness
against cosine(), recall floor vs the exact top-k, and the
refine-beats-coarse property the second stage exists for."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pipeline_calculator_v3_spark.functions.vectors import (
    cosine,
    unit_normalize,
)
from pipeline_calculator_v3_spark.operators.similarity import (
    cosine_topk,
    cosine_topk_ivf_refine,
    dot_int,
    int8_codes,
)

K, K_COARSE, CENTS, PROBE = 10, 30, 32, 3


def _unit(spark, sf_dir):
    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    return e.select(
        "vec_id", unit_normalize(F.col("embedding")).alias("uv")
    ).where(F.col("uv").isNotNull())


@pytest.fixture(scope="module")
def refined(spark, sf_dir):
    u = _unit(spark, sf_dir)
    return cosine_topk_ivf_refine(
        u.where(F.col("vec_id") < 8), u,
        k=K, k_coarse=K_COARSE, n_centroids=CENTS, nprobe=PROBE,
    ).collect()


def test_codes_bounded_and_integer(spark, sf_dir):
    """Unit-vector elements lie in [-1, 1], so int8-style codes must lie
    in [-127, 127] — the invariant that makes the coarse dot an exact
    small BIGINT on every engine."""
    u = _unit(spark, sf_dir)
    row = u.select(
        F.array_min(int8_codes(F.col("uv"))).alias("lo"),
        F.array_max(int8_codes(F.col("uv"))).alias("hi"),
    ).agg(F.min("lo").alias("lo"), F.max("hi").alias("hi")).collect()[0]
    assert -127 <= row.lo <= row.hi <= 127, row


def test_refine_scores_are_exact_cosine(spark, sf_dir, refined):
    """Stage 2 is EXACT: the reported score must equal cosine(q, c) of
    the original embeddings to double tolerance (dot of unit vectors ==
    cosine by the unit_normalize identity)."""
    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    pairs = {(r.qid, r.cid): r.score for r in refined}
    exact = {
        (r.qid, r.cid): r.c
        for r in (
            e.alias("a").join(
                e.alias("b"),
                F.col("a.vec_id") < F.lit(8),  # small cross, test-only
            )
            .select(
                F.col("a.vec_id").alias("qid"),
                F.col("b.vec_id").alias("cid"),
                cosine(F.col("a.embedding"), F.col("b.embedding")).alias("c"),
            )
            .collect()
        )
    }
    for k, v in pairs.items():
        assert abs(v - exact[k]) < 1e-9, (k, v, exact[k])


def test_output_shape_and_rank(refined):
    by_q = {}
    for r in refined:
        by_q.setdefault(r.qid, []).append(r)
    assert set(by_q) == set(range(8))
    for qid, rows in by_q.items():
        assert len(rows) == K, (qid, len(rows))
        ranked = sorted(rows, key=lambda r: r.rank)
        assert [r.rank for r in ranked] == list(range(1, K + 1))
        # rank order == (score desc, cid asc)
        key = [(-r.score, r.cid) for r in ranked]
        assert key == sorted(key), qid


def test_recall_floor_and_refine_beats_coarse(spark, sf_dir, refined):
    """recall@10 vs the exact top-k must clear the floor, and re-ranking
    the coarse survivors by the EXACT score must do at least as well as
    ranking them by the quantized score — the property stage 2 exists
    for.  Measured: refine 0.7875 / coarse 0.7875 at sf0.001, 0.75/0.75
    at sf0.01 — int8 codes at 64 dims misrank almost nothing INSIDE the
    survivor set (the >= assertion is the guard that stays true when
    they do); the recall ceiling here is list assignment (nprobe), same
    as plain IVF."""
    u = _unit(spark, sf_dir)
    exact = {
        (r.qid, r.cid)
        for r in cosine_topk(
            u.where(F.col("vec_id") < 8).select(
                F.col("vec_id"), F.col("uv").alias("embedding")
            ),
            u.select(F.col("vec_id"), F.col("uv").alias("embedding")),
            k=K,
        ).select("qid", "cid").collect()
    }
    got = {(r.qid, r.cid) for r in refined}
    recall = len(exact & got) / len(exact)
    assert recall >= 0.70, recall

    # coarse-order baseline: top-K of the same survivors by (approx, cid)
    by_q = {}
    for r in refined:
        by_q.setdefault(r.qid, []).append(r)
    # refined only carries the final K; recompute the coarse-ordered K
    # from the operator run with k == k_coarse (identical candidate set)
    coarse_all = cosine_topk_ivf_refine(
        u.where(F.col("vec_id") < 8), u,
        k=K_COARSE, k_coarse=K_COARSE, n_centroids=CENTS, nprobe=PROBE,
    ).collect()
    coarse_top = set()
    per_q = {}
    for r in coarse_all:
        per_q.setdefault(r.qid, []).append(r)
    for qid, rows in per_q.items():
        rows.sort(key=lambda r: (-r.approx, r.cid))
        coarse_top |= {(qid, r.cid) for r in rows[:K]}
    coarse_recall = len(exact & coarse_top) / len(exact)
    assert recall >= coarse_recall, (recall, coarse_recall)


def test_plan_is_broadcast_and_clean(spark, sf_dir):
    from tests.compare import assert_no_plan_antipatterns

    u = _unit(spark, sf_dir)
    df = cosine_topk_ivf_refine(
        u.where(F.col("vec_id") < 8), u,
        k=K, k_coarse=K_COARSE, n_centroids=CENTS, nprobe=PROBE,
    )
    assert_no_plan_antipatterns(df)
