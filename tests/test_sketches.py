"""Misra-Gries heavy hitters: the candidate-superset guarantee must make
the exact top-k invariant to partitioning, and the sketch must respect
its bounded-summary contract."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pipeline_calculator_v3_spark.operators.sketches import misra_gries_topk


def _words(spark, counts: dict, parts: int):
    rows = [(w,) for w, c in counts.items() for _ in range(c)]
    return spark.createDataFrame(rows, "value string").repartition(parts)


def test_topk_invariant_to_partitioning(spark):
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


def test_summary_rows_bounded_by_capacity(spark):
    # the pass-1 exchange contract: <= capacity rows per partition
    from pipeline_calculator_v3_spark.operators.sketches import pd  # noqa: F401

    df = _words(spark, {f"v{i}": 3 for i in range(500)}, 4)
    # run only the summary stage by calling the operator with a capacity
    # far below the distinct count and checking it still returns k rows
    out = misra_gries_topk(df, "value", k=5, capacity=32).collect()
    assert len(out) == 5


def test_bad_args_raise(spark):
    df = _words(spark, {"a": 1}, 1)
    with pytest.raises(ValueError):
        misra_gries_topk(df, "value", k=0)
    with pytest.raises(ValueError):
        misra_gries_topk(df, "value", k=10, capacity=10)
