"""Semantic invariants for the statistical event-analytics family
(queries_analytics.py) — properties the oracle-parity hash check cannot
express: probability normalization, convex-combination bounds, and
rule-evaluation consistency."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from pipeline_calculator_v3_spark.queries import QUERIES
from pipeline_calculator_v3_spark.queries import events_t, t


def test_markov_rows_are_a_probability_matrix(spark, sf_dir):
    pdf = QUERIES["q_markov_transitions"](spark, sf_dir).toPandas()
    # row-normalized: P(next | prev) sums to 1 over next for every prev
    sums = pdf.groupby("prev_type")["p_transition"].sum()
    assert all(math.isclose(s, 1.0, rel_tol=1e-12) for s in sums), sums
    assert (pdf["p_transition"] > 0).all()
    assert (pdf["p_transition"] <= 1.0).all()
    # total transitions = events minus one sequence head per user
    ev = events_t(spark, sf_dir)
    n_events = ev.count()
    n_users = ev.select("user_id").distinct().count()
    assert int(pdf["n_transitions"].sum()) == n_events - n_users


def test_anomaly_zscore_counts_bounded(spark, sf_dir):
    pdf = QUERIES["q_anomaly_zscore"](spark, sf_dir).toPandas()
    assert (pdf["n_anomalies"] <= pdf["n_events"]).all()
    assert (pdf["n_anomalies"] >= 0).all()
    assert (pdf["max_abs_z"] >= 0).all()
    # segments partition the table
    assert int(pdf["n_events"].sum()) == events_t(spark, sf_dir).count()


def test_ewma_is_a_convex_combination_per_user(spark, sf_dir):
    sm = QUERIES["q_ewma_smooth"](spark, sf_dir)
    bounds = (
        events_t(spark, sf_dir)
        .groupBy("user_id")
        .agg(F.min("value").alias("vmin"), F.max("value").alias("vmax"))
    )
    joined = sm.join(bounds, "user_id")
    eps = 1e-9
    bad = joined.where(
        (F.col("ewma_last") < F.col("vmin") - eps)
        | (F.col("ewma_last") > F.col("vmax") + eps)
        | (F.col("ewma_mean") < F.col("vmin") - eps)
        | (F.col("ewma_mean") > F.col("vmax") + eps)
    ).count()
    assert bad == 0


def test_data_quality_rules_consistent(spark, sf_dir):
    pdf = (
        QUERIES["q_data_quality"](spark, sf_dir)
        .toPandas()
        .set_index("rule_name")
    )
    assert len(pdf) == 7
    li = t(spark, sf_dir, "lineitem")
    n = li.count()
    assert (pdf["n_checked"] == n).all()
    assert ((pdf["violation_rate"] >= 0) & (pdf["violation_rate"] <= 1)).all()
    # clean-by-construction rules on the synthetic data: every predicate
    # rule is calibrated to the generator's actual ranges, so the only
    # rule with real violations is the duplicate-key one — a DQ suite that
    # flags good rows carries no signal (review finding, r05)
    for rule in ("quantity_in_range", "discount_in_range", "price_positive",
                 "returnflag_domain", "shipdate_window", "order_fk_exists"):
        assert pdf.loc[rule, "n_violations"] == 0, rule
    # duplicate-key rule matches a direct recount
    dup = n - li.select("l_orderkey", "l_linenumber").distinct().count()
    assert int(pdf.loc["line_key_unique", "n_violations"]) == dup


def test_profile_table_invariants(spark, sf_dir):
    pdf = (
        QUERIES["q_profile_table"](spark, sf_dir)
        .toPandas()
        .set_index("column_name")
    )
    n = t(spark, sf_dir, "orders").count()
    assert len(pdf) == 6
    assert (pdf["n_rows"] == n).all()
    # distinct counts non-null values only
    assert (pdf["n_distinct"] <= pdf["n_rows"] - pdf["n_nulls"]).all()
    # o_orderkey is the primary key: dense, unique, null-free
    assert pdf.loc["o_orderkey", "n_nulls"] == 0
    assert pdf.loc["o_orderkey", "n_distinct"] == n
    # numeric summary present only for numeric columns
    assert pdf.loc["o_orderstatus", ["min_num", "max_num", "avg_num"]].isna().all()
    row = pdf.loc["o_totalprice"]
    assert row["min_num"] <= row["avg_num"] <= row["max_num"]


def test_rfm_tiles_are_balanced_quartiles(spark, sf_dir):
    pdf = QUERIES["q_rfm_segmentation"](spark, sf_dir).toPandas()
    for c in ("r_score", "f_score", "m_score"):
        assert set(pdf[c]) <= {1, 2, 3, 4}
    n_cust = (
        t(spark, sf_dir, "orders").select("o_custkey").distinct().count()
    )
    assert int(pdf["n_customers"].sum()) == n_cust
    # anchor is past the generator's max order date -> recency never negative
    assert (pdf["best_recency_days"] >= 0).all()
    # each dimension's marginal is an ntile(4) partition: sizes differ by <=1
    for c in ("r_score", "f_score", "m_score"):
        marg = pdf.groupby(c)["n_customers"].sum()
        assert marg.max() - marg.min() <= 1, (c, dict(marg))


def _events_pdf(sf_dir):
    import pandas as pd

    pdf = pd.read_parquet(f"{sf_dir}/events.parquet")
    return pdf.sort_values(["ts", "event_id"]).reset_index(drop=True)


def test_ewma_matches_independent_numpy_recompute(spark, sf_dir):
    """Third-implementation gate: the Spark and DuckDB EWMA share their
    kernel fragments verbatim (by design, for bit-identical sums), so the
    oracle can't catch a shared-formula bug.  Recompute from the parquet
    with plain numpy and compare."""
    import numpy as np

    pdf = _events_pdf(sf_dir)
    out = (
        QUERIES["q_ewma_smooth"](spark, sf_dir)
        .toPandas()
        .set_index("user_id")
        .sort_index()
    )
    w = np.array([0.5 ** (k + 1) for k in range(8)])
    expect_last, expect_mean = {}, {}
    for uid, g in pdf.groupby("user_id"):
        v = g["value"].to_numpy()
        sm = np.empty(len(v))
        for i in range(len(v)):
            k = min(i + 1, 8)
            taps = v[i::-1][:k]
            sm[i] = float(np.dot(taps, w[:k])) / float(w[:k].sum())
        expect_last[uid], expect_mean[uid] = sm[-1], sm.mean()
    assert set(out.index) == set(expect_last)
    for uid in out.index:
        assert abs(out.loc[uid, "ewma_last"] - expect_last[uid]) < 1e-9, uid
        assert abs(out.loc[uid, "ewma_mean"] - expect_mean[uid]) < 1e-9, uid


def test_markov_matches_independent_pandas_recompute(spark, sf_dir):
    pdf = _events_pdf(sf_dir)
    out = QUERIES["q_markov_transitions"](spark, sf_dir).toPandas()
    got = {
        (r.prev_type, r.next_type): r.n_transitions
        for r in out.itertuples()
    }
    expect: dict[tuple[str, str], int] = {}
    for _, g in pdf.groupby("user_id"):
        types = g["event_type"].tolist()
        for a, b in zip(types, types[1:]):
            expect[(a, b)] = expect.get((a, b), 0) + 1
    assert got == expect


def test_zscore_zero_variance_segment_yields_zero_not_null(spark):
    """Review finding (r05): a constant-value segment makes sigma_pop 0 and
    every z-score NULL; the rollup must report 0 anomalies (as the SQL
    CASE does), never a NULL count."""
    from pipeline_calculator_v3_spark.queries_analytics import (
        zscore_anomaly_rollup,
    )

    df = spark.createDataFrame(
        [("const", 5.0)] * 4 + [("single", 1.0)]
        + [("normal", float(x)) for x in (1, 2, 3, 400)],
        "seg string, v double",
    )
    out = {
        r["seg"]: r
        for r in zscore_anomaly_rollup(df, "seg", "v").collect()
    }
    assert out["const"]["n_anomalies"] == 0
    assert out["const"]["max_abs_z"] is None
    assert out["single"]["n_anomalies"] == 0
    assert out["normal"]["n_anomalies"] == 0  # |z| maxes at ~1.73 for n=4


def test_curation_funnel_is_monotone(spark, sf_dir):
    pdf = (
        QUERIES["q_curation_e2e"](spark, sf_dir)
        .toPandas()
        .sort_values("stage_no")
        .reset_index(drop=True)
    )
    assert list(pdf["stage"]) == [
        "raw", "quality", "exact_dedup", "near_dedup",
        "decontaminated", "sampled",
    ]
    # each stage only removes documents/tokens
    assert pdf["n_docs"].is_monotonic_decreasing
    assert pdf["n_tokens"].is_monotonic_decreasing
    assert pdf["n_docs"].iloc[-1] > 0
