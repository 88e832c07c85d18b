"""Bucketed co-located join: same-bucketed tables must join with ZERO
exchanges (the pre-shuffled-storage technique for repeated big-big joins)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pipeline_calculator_v3_spark.operators.bucketing import (
    bucketed_join,
    write_bucketed,
)


@pytest.fixture(scope="module")
def bucketed_tables(spark, sf_dir, tmp_path_factory):
    # NB: spark.sql.warehouse.dir is a static config — managed tables land in
    # ./spark-warehouse (gitignored); dropped in teardown
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_orderkey", "l_quantity", "l_extendedprice"
    )
    o = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_totalprice"
    )
    write_bucketed(li, "li_bkt", "l_orderkey", 8)
    write_bucketed(o, "o_bkt", "l_orderkey", 8)
    yield "li_bkt", "o_bkt"
    spark.sql("DROP TABLE IF EXISTS li_bkt")
    spark.sql("DROP TABLE IF EXISTS o_bkt")


def test_bucketed_join_has_no_exchange(spark, bucketed_tables):
    l, r = bucketed_tables
    df = bucketed_join(spark, l, r, "l_orderkey")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange hashpartitioning" not in plan, plan
    assert "SortMergeJoin" in plan
    assert "Bucketed: true" in plan


def test_bucketed_join_correct(spark, sf_dir, bucketed_tables):
    l, r = bucketed_tables
    got = bucketed_join(spark, l, r, "l_orderkey").count()
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    expect = li.join(o, li.l_orderkey == o.o_orderkey).count()
    assert got == expect
