"""Query-level property gates that no oracle can express directly:
order/partitioning invariance of the replication checksum and the
quantizer's analytic error bound."""

from __future__ import annotations

def test_checksum_order_invariance(spark, sf_dir):
    """q_table_checksum must be invariant to partitioning and row order —
    the property that makes it a replication validator."""
    from pandas.testing import assert_frame_equal

    from pipeline_calculator_v3_spark.queries import QUERIES

    base = (
        QUERIES["q_table_checksum"](spark, sf_dir)
        .toPandas()
        .sort_values("o_orderpriority")
        .reset_index(drop=True)
    )

    from pyspark.sql import functions as F

    from pipeline_calculator_v3_spark.queries import t as _t

    o = _t(spark, sf_dir, "orders").orderBy(F.desc("o_totalprice")).repartition(7)
    digest = F.md5(
        F.concat_ws("|", F.col("o_orderkey").cast("string"), F.col("o_orderstatus"))
    )
    residue = F.conv(F.substring(digest, 1, 12), 16, 10).cast("bigint") % 1000000007
    scrambled = (
        o.groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            F.sum(residue).cast("bigint").alias("checksum"),
        )
        .toPandas()
        .sort_values("o_orderpriority")
        .reset_index(drop=True)
    )
    assert_frame_equal(base, scrambled)


def test_quantize_error_bounded_by_half_step(spark, sf_dir):
    """Affine int8 quantization: |x - recon| <= scale/2 pointwise, so the
    per-label MAX error must respect max_err <= (global max range)/255/2."""
    from pyspark.sql import functions as F

    from pipeline_calculator_v3_spark.queries import QUERIES, t as _t

    out = {r.label: r for r in QUERIES["q_embed_quantize"](spark, sf_dir).collect()}
    ranges = (
        _t(spark, sf_dir, "embeddings")
        .select(
            "label",
            (
                F.array_max("embedding").cast("double")
                - F.array_min("embedding").cast("double")
            ).alias("rng"),
        )
        .groupBy("label")
        .agg(F.max("rng").alias("max_rng"))
        .collect()
    )
    for r in ranges:
        bound = r.max_rng / 255.0 / 2.0 * (1 + 1e-9)
        assert out[r.label].max_err <= bound, (r.label, out[r.label].max_err, bound)


def test_cooccurrence_edges_match_bruteforce(spark):
    from itertools import combinations

    from pipeline_calculator_v3_spark.operators.joins import cooccurrence_edges

    rows = [
        ("b1", 3), ("b1", 1), ("b1", 2), ("b1", 1),  # dup item in block
        ("b2", 2), ("b2", 4),
        ("b3", 9),                                    # singleton: no edges
    ]
    df = spark.createDataFrame(rows, "block string, item bigint")
    got = sorted(
        (r.s1, r.s2)
        for r in cooccurrence_edges(df, "block", "item").collect()
    )
    expect = sorted(
        set(
            pair
            for block in ({1, 2, 3}, {2, 4})
            for pair in combinations(sorted(block), 2)
        )
    )
    assert got == expect


def test_cooccurrence_degree_guard_raises(spark):
    import pytest
    from py4j.protocol import Py4JJavaError
    from pyspark.errors import SparkRuntimeException

    from pipeline_calculator_v3_spark.operators.joins import cooccurrence_edges

    hot = spark.createDataFrame(
        [("hot", i) for i in range(40)], "block string, item bigint"
    )
    with pytest.raises((SparkRuntimeException, Py4JJavaError)):
        cooccurrence_edges(hot, "block", "item", max_degree=16).collect()
    # same data passes with an adequate bound
    n = cooccurrence_edges(hot, "block", "item", max_degree=64).count()
    assert n == 40 * 39 // 2
    with pytest.raises(ValueError):
        cooccurrence_edges(hot, "block", "item", max_degree=1)
