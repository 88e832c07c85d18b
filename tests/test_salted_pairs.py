"""Skew-safety tests for salted_self_pairs (the blocking-join salting used
by q_ngram_jaccard / q_dedup_simhash).

Gates two properties on a planted 30%-hot-block corpus:
1. output equivalence — salting only changes physical distribution, so the
   pair set must equal the plain self-join's exactly;
2. straggler bound — no single physical join key may carry more than a small
   multiple of the ideal per-task share of the hot block's quadratic work.
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from pipeline_calculator_v3_spark.operators.joins import salted_self_pairs

N_DOCS = 1000
HOT_FRACTION = 0.3
N_GROUPS = 8


@pytest.fixture(scope="module")
def skewed(spark):
    """30% of rows share one block; the rest spread over 100 blocks."""
    hot = int(N_DOCS * HOT_FRACTION)
    rows = [(i, "the quick brown fox" if i < hot else f"block{i % 100}")
            for i in range(N_DOCS)]
    return spark.createDataFrame(rows, "doc_id long, block string").cache()


def test_output_equals_plain_self_join(spark, skewed):
    a, b = skewed.alias("a"), skewed.alias("b")
    plain = {
        (r.id1, r.id2)
        for r in a.join(b, "block")
        .where(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(F.col("a.doc_id").alias("id1"), F.col("b.doc_id").alias("id2"))
        .collect()
    }
    salted = {
        (r.id1, r.id2)
        for r in salted_self_pairs(skewed, "block", "doc_id", n_groups=N_GROUPS)
        .where(F.col("a_doc_id") < F.col("b_doc_id"))
        .select(F.col("a_doc_id").alias("id1"), F.col("b_doc_id").alias("id2"))
        .collect()
    }
    hot = int(N_DOCS * HOT_FRACTION)
    assert len(plain) >= hot * (hot - 1) // 2  # the hot block dominates
    assert salted == plain


def test_no_single_task_dominates(spark, skewed):
    """Reproduce the operator's physical key (block, g_left, g_right) and
    check the max per-key pair workload: a plain join puts the hot block's
    ~45k pairs on ONE key; salting must bound every key near the ideal
    share (hot/G)^2."""
    g = F.pmod(F.xxhash64(F.col("doc_id")), F.lit(N_GROUPS)).cast("int")
    sizes = (
        skewed.withColumn("g", g)
        .groupBy("block", "g")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    a, b = sizes.alias("a"), sizes.alias("b")
    per_key = (
        a.join(b, "block")
        .select(
            "block", F.col("a.g").alias("gi"), F.col("b.g").alias("gj"),
            (F.col("a.n") * F.col("b.n")).alias("pairs"),
        )
    )
    hot = int(N_DOCS * HOT_FRACTION)
    total_hot_pairs = hot * hot  # ordered pairs in the hot block
    max_key = per_key.agg(F.max("pairs")).collect()[0][0]
    ideal = total_hot_pairs / (N_GROUPS * N_GROUPS)
    # deterministic group hash is uneven but must stay within 2x of ideal —
    # vs the unsalted plan where one key carries total_hot_pairs (64x ideal)
    assert max_key <= 2 * ideal, (max_key, ideal)
