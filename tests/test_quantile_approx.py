"""Approx-quantile error bound vs the exact path (scale-path honesty)."""

from __future__ import annotations

from pyspark.sql import functions as F

from pipeline_calculator_v3_spark.queries import QUERIES


def test_approx_within_rank_error(spark, sf_dir):
    approx = {
        r.l_returnflag: r
        for r in QUERIES["q_quantile_approx"](spark, sf_dir).collect()
    }
    exact = {
        r.l_returnflag: r
        for r in spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        .groupBy("l_returnflag")
        .agg(
            F.expr("percentile(l_extendedprice, 0.5)").alias("p50"),
            F.expr("percentile(l_extendedprice, 0.99)").alias("p99"),
            F.expr(
                "percentile(l_extendedprice, array(0.495, 0.505, 0.985, 0.995))"
            ).alias("band"),
        )
        .collect()
    }
    assert set(approx) == set(exact)
    for flag, a in approx.items():
        e = exact[flag]
        # GK accuracy=1000 bounds RANK error at ~1/1000: the approx p50 must
        # land inside the exact [p49.5, p50.5] value band (ditto p99).
        lo50, hi50, lo99, hi99 = e.band
        assert lo50 <= a.p50_price <= hi50, (flag, a.p50_price, (lo50, hi50))
        assert lo99 <= a.p99_price <= hi99, (flag, a.p99_price, (lo99, hi99))
