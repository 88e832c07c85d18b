"""The raw-SQL entry point (sql.py): view registration + ANSI SQL through
Spark's parser, cross-checked against DuckDB on the same text."""

from __future__ import annotations

from pipeline_calculator_v3_spark.sql import TABLES, register_views, run_sql

from .compare import assert_frames_match

_Q = """
SELECT n.n_name AS nation,
       CAST(COUNT(*) AS BIGINT) AS n_customers,
       SUM(c.c_acctbal) AS total_balance
FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
GROUP BY n.n_name
"""


def test_run_sql_matches_duckdb_on_shared_text(spark, duck, sf_dir):
    got = run_sql(spark, sf_dir, _Q).toPandas()
    expect = duck.execute(_Q).df()
    assert_frames_match(got, expect)


def test_register_views_covers_declared_tables(spark, sf_dir):
    register_views(spark, sf_dir)
    for name in TABLES:
        assert spark.sql(f"SELECT * FROM {name} LIMIT 1").count() >= 0
