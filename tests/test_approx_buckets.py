"""operators/classifier.py::approx_group_buckets — the 100 TB ntile swap
(staged r10 for an r11 registry face): planted fixture + the intended
DuckDB oracle replay + the ntile-equivalence property on distinct scores
in the sketch's rank-exact regime."""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest

from pipeline_calculator_v3_spark.operators.classifier import (
    approx_group_buckets,
)

# two groups: 7 rows (sizes 3/2/2 under ntile) and 4 rows (2/1/1);
# scores deliberately unsorted and negative-heavy
ROWS = [
    ("a", 0, -3.5), ("a", 1, 2.0), ("a", 2, 0.25), ("a", 3, -1.0),
    ("a", 4, 7.5), ("a", 5, 0.5), ("a", 6, -0.25),
    ("b", 10, 1.0), ("b", 11, -2.0), ("b", 12, 3.0), ("b", 13, 0.0),
]


@pytest.fixture(scope="module")
def result(spark):
    df = spark.createDataFrame(ROWS, "g string, id long, s double")
    out = approx_group_buckets(df, ["g"], "s", n_buckets=3).collect()
    return {(r.g, r.id): r.bucket for r in out}


def _oracle_sql(n_buckets: int) -> str:
    # the same doubles the Column face passes to approx_percentile,
    # round-tripped through repr and parsed as strings (string->double is
    # correctly rounded on every engine; a bare decimal literal would go
    # through DuckDB's DECIMAL type first)
    probs = [i / n_buckets for i in range(1, n_buckets)]
    th_cols = ",\n           ".join(
        f"MIN(CASE WHEN rn = CAST(ceil(CAST('{p!r}' AS DOUBLE) * n) AS BIGINT)"
        f" THEN s END) AS t{i}"
        for i, p in enumerate(probs, 1)
    )
    bucket = " + ".join(
        f"(CASE WHEN sd.s > th.t{i} THEN 1 ELSE 0 END)"
        for i in range(1, len(probs) + 1)
    )
    return f"""
WITH sd AS (SELECT g, id, s FROM scores),
rk AS (
    SELECT g, s,
           row_number() OVER (PARTITION BY g ORDER BY s) AS rn,
           count(*) OVER (PARTITION BY g) AS n
    FROM sd
),
th AS (
    SELECT g,
           {th_cols}
    FROM rk GROUP BY g
)
SELECT sd.g, sd.id, CAST(1 + {bucket} AS BIGINT) AS bucket
FROM sd JOIN th USING (g)
"""


def test_duckdb_replay_agrees(result):
    """The exact SQL intended as the r11 registry oracle (rank-exact GK
    regime: threshold_i is the sorted element at rank ceil(p_i * n))."""
    con = duckdb.connect()
    con.register("scores", pd.DataFrame(ROWS, columns=["g", "id", "s"]))
    oracle = {
        (r[0], int(r[1])): int(r[2])
        for r in con.execute(_oracle_sql(3)).fetchall()
    }
    assert oracle == result


def test_matches_ntile_on_distinct_scores(result):
    """On distinct scores the value-based assignment IS ntile(3)'s
    (larger groups first): group a (n=7) splits 3/2/2, group b (n=4)
    splits 2/1/1 over the score order."""
    a_sorted = [0, 3, 6, 2, 5, 1, 4]  # ids of group a by ascending score
    expect_a = dict(zip(a_sorted, [1, 1, 1, 2, 2, 3, 3]))
    for i, b in expect_a.items():
        assert result[("a", i)] == b, i
    b_sorted = [11, 13, 10, 12]
    expect_b = dict(zip(b_sorted, [1, 1, 2, 3]))
    for i, b in expect_b.items():
        assert result[("b", i)] == b, i


def test_null_scores_bucket_null(spark):
    df = spark.createDataFrame(
        [("a", 0, 1.0), ("a", 1, 2.0), ("a", 2, None)],
        "g string, id long, s double",
    )
    out = {
        r.id: r.bucket
        for r in approx_group_buckets(df, ["g"], "s", n_buckets=2).collect()
    }
    assert out[2] is None
    assert out[0] is not None and out[1] is not None


def test_guards(spark):
    df = spark.createDataFrame([("a", 1.0)], "g string, s double")
    with pytest.raises(ValueError):
        approx_group_buckets(df, ["g"], "s", n_buckets=1)
    with pytest.raises(ValueError):
        approx_group_buckets(
            df.withColumnRenamed("g", "bucket"), ["bucket"], "s"
        )


def test_plan_has_no_sort_over_the_corpus(spark):
    """The point of the swap: no per-group rank window — the only window-
    free plan shape is aggregate + broadcast join + map-side fold."""
    df = spark.createDataFrame(ROWS, "g string, id long, s double")
    plan = (
        approx_group_buckets(df, ["g"], "s", n_buckets=3)
        ._jdf.queryExecution()
        .toString()
    )
    assert "Window" not in plan


# Property: for ANY distinct-score frame (rank-exact regime), the bucket
# sizes match ntile's (larger first) per group.
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    st.lists(
        st.integers(-1000, 1000), min_size=2, max_size=14, unique=True
    )
)
def test_bucket_sizes_match_ntile(spark, xs):
    df = spark.createDataFrame(
        [("g", i, float(x)) for i, x in enumerate(xs)],
        "g string, id long, s double",
    )
    out = approx_group_buckets(df, ["g"], "s", n_buckets=3).collect()
    sizes = [0, 0, 0]
    for r in out:
        sizes[int(r.bucket) - 1] += 1
    n = len(xs)
    expect = [n // 3 + (1 if i < n % 3 else 0) for i in range(3)]
    assert sizes == expect, (sorted(xs), sizes, expect)


def test_null_group_rows_survive(spark):
    """NULL-group rows must keep their rows AND get buckets from their
    own group's thresholds (r14 null-unsafe-join audit; fails pre-fix)."""
    from pipeline_calculator_v3_spark.operators.classifier import (
        approx_group_buckets,
    )

    rows = [(1, "en", 1.0), (2, "en", 2.0), (3, "en", 3.0),
            (4, None, 10.0), (5, None, 20.0), (6, None, 30.0)]
    df = spark.createDataFrame(rows, "doc_id long, lang string, s double")
    out = approx_group_buckets(df, ["lang"], "s", n_buckets=3)
    assert out.count() == len(rows)
    got = {r.doc_id: r.bucket for r in out.collect()}
    assert got[4] == 1 and got[6] == 3
