"""spread_small_input gating (VERDICT r03 'What's wrong' #3): the harness
helper must never add a shuffle to an already-well-partitioned input — an
unconditional repartition is a full-corpus shuffle at 100 TB."""

from __future__ import annotations

from pipeline_calculator_v3_spark.operators.partitioning import spread_small_input


def test_spread_is_identity_on_wide_input(spark):
    # `is`-identity is the strongest possible no-added-Exchange assertion:
    # the exact input plan object comes back untouched (comparing AQE plan
    # strings instead is flaky — touching .rdd finalizes stages).
    par = spark.sparkContext.defaultParallelism
    df = spark.range(0, 10000).repartition(par)
    out = spread_small_input(df)
    assert out is df, "spread must be a no-op (same object) at >= parallelism"


def test_spread_widens_single_partition(spark):
    par = spark.sparkContext.defaultParallelism
    df = spark.range(0, 1000).coalesce(1)
    out = spread_small_input(df)
    assert out.rdd.getNumPartitions() == par
