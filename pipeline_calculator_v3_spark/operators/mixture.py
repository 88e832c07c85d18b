"""Temperature-scaled data-mixture planning — the multilingual/domain
rebalancing rule training pipelines actually ship (XLM-R §3.1, mT5
§3.2): sampling proportionally to size starves low-resource sources,
so the target share of source i is flattened to

    s_i = n_i^(1/T) / sum_j n_j^(1/T)

(T = 1 proportional, T -> inf uniform).  Against a token budget
B = budget_frac * N the demanded allocation lambda * s_i can exceed a
small source's actual size; the correct fix is WATERFILLING — clamp
exhausted sources at rate 1 and redistribute their unused demand over
the rest — which q_mixture_plan's single least(1, .) clamp deliberately
does not do (its contract is one-shot rates; the budget under-fills
when any source clamps).

This module spells exact waterfilling CLOSED-FORM, no driver loop: sort
sources by capacity-per-share c_i = n_i / s_i ascending; the clamp set
is a prefix of that order (clamping a source with c_i below the current
water level only RAISES the level, so clamp membership is monotone in
c_i), and prefix k is clamped iff

    c_k * (1 - cumS_k) <= B - cumN_k

— the multiplicative spelling of c_k <= lambda_k that stays
division-free (no 0/0 when the whole corpus fits the budget).  The
final level lambda* = (B - cumN_k*) / (1 - cumS_k*) prices every
unclamped source at rate lambda* * s_i / n_i, and the budget is
conserved exactly: sum(rate_i * n_i) = min(B, N).

Scale shape: ONE per-source aggregate (the caller usually feeds
per-source token counts straight off a scan), then window passes over
the |sources|-row table — bounded by the source catalog, never the
corpus.  The sort/cumsum windows run single-partition BY DESIGN on that
bounded table.  ANSI-replayable with window functions verbatim
(tests/test_mixture.py; staged r14 for an r15 face).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def temperature_mixture_plan(
    src_tokens: DataFrame,
    source_col: str = "source",
    tokens_col: str = "n_tokens",
    budget_frac: float = 0.5,
    temperature: float = 2.0,
) -> DataFrame:
    """Per-source sampling rates for a temperature-T mixture under an
    exact token budget.

    ``src_tokens`` holds one row per source (``source_col``,
    ``tokens_col`` > 0).  Returns one row per source: ``source_col``,
    ``n_tokens`` BIGINT, ``share`` DOUBLE (the temperature-flattened
    target, 9 dp), ``rate`` DOUBLE in [0, 1] (9 dp — a true rate below
    5e-10, extreme share skew under low temperature, rounds to 0.0:
    sub-grain demand is not representable at the output precision, and
    the budget error that drops is below the conservation grain), ``clamped``
    BOOLEAN (source fully consumed), ``expected_tokens`` DOUBLE (3 dp);
    sum(expected_tokens) = min(budget, corpus) by construction.

    The downstream sampler is hash_sample_predicate at these rates —
    deterministic, scan-side, oracle-checkable."""
    if not 0.0 < budget_frac <= 1.0:
        raise ValueError("budget_frac must be in (0, 1]")
    if temperature <= 0.0:
        raise ValueError("temperature must be positive")
    inv_t = 1.0 / float(temperature)
    # a non-positive source carries no tokens to sample: it gets share 0
    # by definition, and keeping it would put 0 in the capacity-per-share
    # and level denominators (ANSI DIVIDE_BY_ZERO — the try_divide class)
    src_tokens = src_tokens.where(F.col(tokens_col) > 0)
    n = F.col(tokens_col).cast("double")
    tot = src_tokens.agg(
        F.sum(n).alias("_N"),
        F.sum(F.pow(n, F.lit(inv_t))).alias("_Z"),
    )
    base = src_tokens.crossJoin(F.broadcast(tot)).select(
        F.col(source_col),
        F.col(tokens_col).cast("bigint").alias("n_tokens"),
        (F.pow(n, F.lit(inv_t)) / F.col("_Z")).alias("_s"),
        (F.lit(float(budget_frac)) * F.col("_N")).alias("_B"),
    )
    # capacity-per-share order; source name tiebreaks equal capacities so
    # the cumulative sums (hence the clamp prefix) are deterministic
    cap = F.col("n_tokens").cast("double") / F.col("_s")
    w = Window.orderBy(cap, source_col)
    cum = base.select(
        "*",
        F.sum(F.col("n_tokens").cast("double")).over(w).alias("_cumN"),
        F.sum("_s").over(w).alias("_cumS"),
        cap.alias("_cap"),
    ).withColumn(
        "clamped",
        F.col("_cap") * (F.lit(1.0) - F.col("_cumS"))
        <= F.col("_B") - F.col("_cumN"),
    )
    # the water level after the full clamp prefix; with no clamped rows
    # the level is simply B (sum of shares is 1)
    wg = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    # try_divide: the LAST row in cap order always has 1 - cumS = 0, and
    # when the whole corpus fits the budget that row is clamped — ANSI
    # mode would throw DIVIDE_BY_ZERO on a level nobody reads (every
    # rate is 1 in that case); NULL drops out of the max instead
    lam = F.coalesce(
        F.max(
            F.when(
                F.col("clamped"),
                F.try_divide(
                    F.col("_B") - F.col("_cumN"),
                    F.lit(1.0) - F.col("_cumS"),
                ),
            )
        ).over(wg),
        F.col("_B"),
    )
    rate = F.when(F.col("clamped"), F.lit(1.0)).otherwise(
        lam * F.col("_s") / F.col("n_tokens").cast("double")
    )
    return cum.select(
        source_col,
        "n_tokens",
        F.round("_s", 9).alias("share"),
        F.round(rate, 9).alias("rate"),
        "clamped",
        F.round(rate * F.col("n_tokens").cast("double"), 3).alias(
            "expected_tokens"
        ),
    )
