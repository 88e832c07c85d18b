"""Regression tests for the dtype-strict gate in compare.assert_frames_match.

Round-5 post-mortem: the q_curation_e2e oracle left five UNION ALL branches
uncast, DuckDB resolved the union column to HUGEINT -> pandas float64, and the
driver's TYPED value-hash went red while pytest stayed green because
compare.py silently coerced the int-vs-float split.  These tests pin the new
behaviour: a numerically-identical int64-vs-float64 column pair must FAIL
unless the float side carries NaN (pandas' nullable-int representation).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from tests.compare import assert_frames_match


def test_int_vs_integral_float_fails():
    # The exact r05 failure shape: Spark int64 vs DuckDB HUGEINT->float64,
    # values identical (27165 vs 27165.0).  Must now fail in pytest too.
    spark = pd.DataFrame({"stage_no": [0, 1], "n_tokens": np.int64([27165, 14210])})
    oracle = pd.DataFrame({"stage_no": [0, 1], "n_tokens": np.float64([27165.0, 14210.0])})
    with pytest.raises(AssertionError, match="dtype split"):
        assert_frames_match(spark, oracle)


def test_float_vs_int_fails_symmetrically():
    spark = pd.DataFrame({"v": np.float64([3.0])})
    oracle = pd.DataFrame({"v": np.int64([3])})
    with pytest.raises(AssertionError, match="dtype split"):
        assert_frames_match(spark, oracle)


def test_nullable_int_as_float_with_nan_is_forgiven():
    # Legitimate split: pandas Int64 with pd.NA on one side, float64 with NaN
    # on the other — the classic nullable-int round-trip.  Values (incl. the
    # null pattern) are identical, so this must keep passing.
    spark = pd.DataFrame({"v": pd.array([1, None, 3], dtype="Int64")})
    oracle = pd.DataFrame({"v": np.array([1.0, np.nan, 3.0])})
    assert_frames_match(spark, oracle)


def test_matching_int_dtypes_still_pass():
    a = pd.DataFrame({"v": np.int64([1, 2, 3])})
    b = pd.DataFrame({"v": np.int64([3, 2, 1])})  # order-insensitive
    assert_frames_match(a, b)


def test_true_float_tolerance_retained():
    a = pd.DataFrame({"v": np.float64([1.0000000001])})
    b = pd.DataFrame({"v": np.float64([1.0])})
    assert_frames_match(a, b)


def test_plan_lint_rejects_row_at_a_time_udf(spark):
    """The r10 lint extension must catch a plain (non-Arrow) Python UDF —
    BatchEvalPython is the slow path the scale rules ban registry-wide."""
    from pyspark.sql.functions import udf

    from tests.compare import assert_no_plan_antipatterns

    f = udf(lambda x: x + 1, "long")
    df = spark.range(3).select(f("id").alias("y"))
    with pytest.raises(AssertionError, match="BatchEvalPython"):
        assert_no_plan_antipatterns(df)


def test_plan_lint_accepts_arrow_eval(spark):
    import pandas as pd  # noqa: F811

    from pyspark.sql.functions import pandas_udf

    from tests.compare import assert_no_plan_antipatterns

    @pandas_udf("long")
    def f(x: pd.Series) -> pd.Series:
        return x + 1

    assert_no_plan_antipatterns(spark.range(3).select(f("id").alias("y")))
