"""Misra-Gries heavy hitters: the candidate-superset guarantee must make
the exact top-k invariant to partitioning, the pass-1 summary must honor
its bounded-size contract, and distributions that void the guarantee must
raise instead of returning a partitioning-dependent answer."""

from __future__ import annotations

import pytest

from pipeline_calculator_v3_spark.operators.sketches import misra_gries_topk


def _words(spark, counts: dict, parts: int):
    rows = [(w,) for w, c in counts.items() for _ in range(c)]
    return spark.createDataFrame(rows, "value string").repartition(parts)


def test_topk_invariant_to_partitioning(spark):
    # k-th true count (37) clears n/capacity (~28), so the guarantee holds
    counts = {f"w{i}": 5 + i for i in range(40)}
    counts["hot"] = 500
    counts["warm"] = 300
    expect = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    for parts in (1, 3, 17):
        got = [
            (r.value, r.n)
            for r in misra_gries_topk(
                _words(spark, counts, parts), "value", k=10, capacity=64
            ).collect()
        ]
        assert got == expect, parts


def test_flat_distribution_raises_not_guesses(spark):
    # 300 values x count 50: n/capacity ~ 234 > 50 — no candidate-superset
    # guarantee exists, and the operator must say so loudly
    counts = {f"v{i:03d}": 50 for i in range(300)}
    with pytest.raises(ValueError, match="cannot guarantee"):
        misra_gries_topk(_words(spark, counts, 7), "value", k=10, capacity=64)


def test_non_string_key_column(spark):
    df = spark.createDataFrame([(i % 7,) for i in range(100)], "value bigint")
    got = [(r.value, r.n) for r in misra_gries_topk(df, "value", k=3, capacity=16).collect()]
    # values 0..1 occur 15x, 2..6 occur 14x: top-3 = 0,1,2 by tie-break
    assert got == [(0, 15), (1, 15), (2, 14)]


def test_summary_rows_bounded_by_capacity(spark):
    # the pass-1 exchange contract: <= capacity summary rows per partition,
    # asserted against the REAL kernel
    from pyspark.sql import functions as F

    from pipeline_calculator_v3_spark.operators.sketches import mg_kernel

    df = _words(spark, {f"v{i}": 3 for i in range(500)}, 1)
    values = df.select(F.col("value"))
    n = (
        values.repartition(1)
        .mapInPandas(mg_kernel(32), "value string, est bigint")
        .count()
    )
    assert n <= 32


def test_bad_args_raise(spark):
    df = _words(spark, {"a": 1}, 1)
    with pytest.raises(ValueError):
        misra_gries_topk(df, "value", k=0)
    with pytest.raises(ValueError):
        misra_gries_topk(df, "value", k=10, capacity=10)


def test_wiped_counters_raise_not_return_partial(spark):
    """Review r06: a stream of distinct singletons whose length is a
    multiple of capacity+1 leaves the MG counters EMPTY (every (c+1)-th
    arrival wipes the c counters), so fewer than k candidates survive and
    the old guarantee check — gated on len(top) >= k — silently returned a
    partition-dependent partial result.  Must raise."""
    import pytest
    from pyspark.sql import functions as F

    from pipeline_calculator_v3_spark.operators.sketches import misra_gries_topk

    df = spark.range(50).select(F.col("id").cast("string").alias("v")).repartition(1)
    with pytest.raises(ValueError, match="cannot guarantee"):
        misra_gries_topk(df, "v", k=3, capacity=4)


def test_fewer_distinct_than_k_is_exact_and_allowed(spark):
    """< k distinct values overall is legitimate: candidates cover the
    whole input, so the (complete) result returns without error."""
    from pyspark.sql import functions as F

    from pipeline_calculator_v3_spark.operators.sketches import misra_gries_topk

    df = spark.range(1000).select((F.col("id") % 2).cast("string").alias("v"))
    got = sorted((r.value, r.n) for r in misra_gries_topk(df, "v", k=20).collect())
    assert got == [("0", 500), ("1", 500)]
