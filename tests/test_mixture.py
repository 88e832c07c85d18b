"""operators/mixture.py — temperature-scaled mixture with exact
closed-form waterfilling (staged r14): hand-computed exact-double
cases, the brute-force iterative-waterfill cross-check, budget
conservation, the all-clamp edge, and the DuckDB window-SQL replay."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pipeline_calculator_v3_spark.operators.mixture import (
    temperature_mixture_plan,
)


def _plan(spark, rows, **kw):
    df = spark.createDataFrame(rows, "source string, n_tokens long")
    return {
        r.source: r
        for r in temperature_mixture_plan(df, **kw).collect()
    }


def test_unclamped_hand_case_exact(spark):
    # T=2, n={16,4}: sqrt exact in doubles.  s=(2/3,1/3), N=20, B=10.
    # caps (24, 12) -> no clamps -> lambda = B = 10:
    # rate_A = 10*(2/3)/16 = 5/12, rate_B = 10*(1/3)/4 = 5/6
    got = _plan(spark, [("A", 16), ("B", 4)],
                budget_frac=0.5, temperature=2.0)
    assert not got["A"].clamped and not got["B"].clamped
    assert got["A"].rate == pytest.approx(5 / 12, abs=1e-9)
    assert got["B"].rate == pytest.approx(5 / 6, abs=1e-9)
    assert got["A"].expected_tokens + got["B"].expected_tokens == (
        pytest.approx(10.0, abs=1e-6)
    )


def test_clamped_hand_case_exact(spark):
    # T=2, n={16,1}: s=(4/5,1/5), N=17, B=8.5, caps (20,5).
    # B clamps (5*(4/5)=4 <= 7.5); lambda* = 7.5/(4/5) = 9.375;
    # rate_A = 9.375*(4/5)/16 = 0.46875.  Budget conserved: 7.5 + 1.
    got = _plan(spark, [("A", 16), ("B", 1)],
                budget_frac=0.5, temperature=2.0)
    assert got["B"].clamped and got["B"].rate == 1.0
    assert not got["A"].clamped
    assert got["A"].rate == pytest.approx(0.46875, abs=1e-9)
    assert got["A"].expected_tokens == pytest.approx(7.5, abs=1e-6)


def _brute_waterfill(ns, shares, budget):
    """Iterative reference: clamp any over-demanded source, redistribute,
    repeat to fixed point."""
    alloc = {}
    live = dict(zip(ns.keys(), shares.values()))
    b = budget
    while True:
        stot = sum(live.values())
        lam = b / stot if stot > 0 else 0.0
        newly = [k for k in live if lam * live[k] >= ns[k]]
        if not newly:
            for k in live:
                alloc[k] = lam * live[k]
            return alloc
        for k in newly:
            alloc[k] = ns[k]
            b -= ns[k]
            del live[k]
        if not live:
            return alloc


@pytest.mark.parametrize("temperature", [1.0, 2.0, 5.0])
@pytest.mark.parametrize("budget_frac", [0.3, 0.7, 1.0])
def test_matches_iterative_waterfill(spark, temperature, budget_frac):
    ns = {"a": 1000, "b": 50, "c": 7, "d": 400, "e": 2, "f": 120}
    shares_un = {k: v ** (1.0 / temperature) for k, v in ns.items()}
    z = sum(shares_un.values())
    shares = {k: v / z for k, v in shares_un.items()}
    want = _brute_waterfill(ns, shares, budget_frac * sum(ns.values()))
    got = _plan(spark, list(ns.items()),
                budget_frac=budget_frac, temperature=temperature)
    for k in ns:
        # expected_tokens is rounded to 3 dp on output — compare at that
        # grain, not at float precision
        assert got[k].expected_tokens == pytest.approx(
            want[k], abs=5e-4
        ), (k, temperature, budget_frac)
    # budget conservation: sum(expected) = min(B, N)
    assert sum(g.expected_tokens for g in got.values()) == pytest.approx(
        min(budget_frac * sum(ns.values()), sum(ns.values())), abs=1e-2
    )


def test_budget_frac_one_takes_everything(spark):
    got = _plan(spark, [("a", 10), ("b", 90)],
                budget_frac=1.0, temperature=3.0)
    assert all(g.clamped and g.rate == 1.0 for g in got.values())


def test_temperature_one_is_proportional(spark):
    # T=1: shares = n/N, caps all equal N -> nobody clamps below
    # budget_frac 1, every rate = budget_frac exactly
    got = _plan(spark, [("a", 10), ("b", 90), ("c", 900)],
                budget_frac=0.4, temperature=1.0)
    for g in got.values():
        assert g.rate == pytest.approx(0.4, abs=1e-9)


def test_higher_temperature_lifts_low_resource(spark):
    lo = _plan(spark, [("small", 10), ("big", 1000)],
               budget_frac=0.3, temperature=1.0)
    hi = _plan(spark, [("small", 10), ("big", 1000)],
               budget_frac=0.3, temperature=5.0)
    assert hi["small"].rate > lo["small"].rate
    assert hi["big"].rate < lo["big"].rate


def test_arg_guards(spark):
    df = spark.createDataFrame([("a", 1)], "source string, n_tokens long")
    with pytest.raises(ValueError):
        temperature_mixture_plan(df, budget_frac=0.0)
    with pytest.raises(ValueError):
        temperature_mixture_plan(df, budget_frac=1.5)
    with pytest.raises(ValueError):
        temperature_mixture_plan(df, temperature=0.0)


DUCK_REPLAY = """
WITH src AS (
    SELECT source, CAST(count(*) AS BIGINT) AS n_tokens
    FROM documents GROUP BY source
),
tot AS (
    SELECT sum(CAST(n_tokens AS DOUBLE)) AS bign,
           sum(pow(CAST(n_tokens AS DOUBLE), 0.5)) AS z
    FROM src
),
base AS (
    SELECT source, n_tokens,
           pow(CAST(n_tokens AS DOUBLE), 0.5) / z AS s,
           0.5 * bign AS b
    FROM src CROSS JOIN tot
),
cum AS (
    SELECT *,
           CAST(n_tokens AS DOUBLE) / s AS cap,
           sum(CAST(n_tokens AS DOUBLE))
               OVER (ORDER BY CAST(n_tokens AS DOUBLE) / s, source) AS cumn,
           sum(s)
               OVER (ORDER BY CAST(n_tokens AS DOUBLE) / s, source) AS cums
    FROM base
),
flagged AS (
    SELECT *, cap * (1.0 - cums) <= b - cumn AS clamped FROM cum
),
lev AS (
    SELECT *,
           coalesce(
               max(CASE WHEN clamped
                        THEN (b - cumn) / (1.0 - cums) END) OVER (),
               b) AS lam
    FROM flagged
)
SELECT source, n_tokens,
       round(s, 9) AS share,
       round(CASE WHEN clamped THEN 1.0
                  ELSE lam * s / CAST(n_tokens AS DOUBLE) END, 9) AS rate,
       clamped,
       round(CASE WHEN clamped THEN 1.0
                  ELSE lam * s / CAST(n_tokens AS DOUBLE) END
             * CAST(n_tokens AS DOUBLE), 3) AS expected_tokens
FROM lev
"""


def test_documents_oracle_replay(spark, duck, sf_dir):
    # per-source doc counts stand in for token counts — the plan only
    # sees the (source, n) table either way
    src = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .groupBy("source")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_tokens"))
    )
    got = {
        r.source: (r.n_tokens, r.share, r.rate, r.clamped,
                   r.expected_tokens)
        for r in temperature_mixture_plan(
            src, budget_frac=0.5, temperature=2.0
        ).collect()
    }
    want = {
        r[0]: (r[1], r[2], r[3], r[4], r[5])
        for r in duck.execute(DUCK_REPLAY).fetchall()
    }
    assert set(got) == set(want) and len(got) >= 3
    for k in got:
        assert got[k][0] == want[k][0]
        assert got[k][3] == want[k][3]
        for i in (1, 2, 4):
            assert got[k][i] == pytest.approx(want[k][i], rel=1e-6), k


from hypothesis import HealthCheck, given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402


@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    ns=st.lists(st.integers(min_value=1, max_value=10_000),
                min_size=1, max_size=8),
    budget_frac=st.floats(min_value=0.05, max_value=1.0,
                          allow_nan=False, allow_infinity=False),
    temperature=st.floats(min_value=0.25, max_value=10.0,
                          allow_nan=False, allow_infinity=False),
)
def test_waterfill_property(spark, ns, budget_frac, temperature):
    """Random corpora: closed-form plan == brute-force iterative
    waterfill; rates in [0, 1] (positive unless the TRUE rate is below
    the 9-dp output grain — an extreme-skew share under low temperature
    can price a source at < 5e-10, which legitimately rounds to 0.0);
    budget conserved to rounding grain."""
    names = [f"s{i}" for i in range(len(ns))]
    shares_un = {k: v ** (1.0 / temperature)
                 for k, v in zip(names, ns)}
    z = sum(shares_un.values())
    shares = {k: v / z for k, v in shares_un.items()}
    nd = dict(zip(names, ns))
    want = _brute_waterfill(nd, shares, budget_frac * sum(ns))
    got = _plan(spark, list(nd.items()),
                budget_frac=budget_frac, temperature=temperature)
    for k in nd:
        assert 0.0 <= got[k].rate <= 1.0
        # below the 9-dp grain the rounded rate may be exactly 0; any
        # true rate at or above the grain must survive as positive
        if want[k] / nd[k] >= 1e-9:
            assert got[k].rate > 0.0
        assert got[k].expected_tokens == pytest.approx(
            want[k], abs=5e-4, rel=1e-6
        ), (k, nd, budget_frac, temperature)
    assert sum(g.expected_tokens for g in got.values()) == pytest.approx(
        min(budget_frac * sum(ns), sum(ns)), abs=1e-2, rel=1e-6
    )


def test_zero_token_source_dropped_not_crashed(spark):
    """A zero-token source has nothing to sample: it must drop out of
    the plan (share 0 by definition) rather than put 0 in the
    capacity-per-share denominator — ANSI mode throws DIVIDE_BY_ZERO
    pre-fix."""
    got = _plan(spark, [("a", 100), ("empty", 0), ("b", 50)],
                budget_frac=0.5, temperature=2.0)
    assert set(got) == {"a", "b"}
    assert sum(g.expected_tokens for g in got.values()) == pytest.approx(
        75.0, abs=1e-2
    )
