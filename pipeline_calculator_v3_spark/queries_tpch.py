"""TPC-H-classic query shapes over the star schema — the lingua-franca
workload proving the relational engine composes (multi-join + agg + sort +
filter pushdown in one plan), plus explicit big-big join strategies."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .operators.joins import merge_join, salted_join
from .queries import query, t


@query(
    "q_tpch_q3_shipping_priority",
    oracle="""
SELECT l.l_orderkey,
       SUM(l.l_extendedprice * (1.0 - l.l_discount)) AS revenue,
       strftime(o.o_orderdate, '%Y-%m-%d') AS orderdate
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE c.c_mktsegment = 'BUILDING'
  AND o.o_orderdate < TIMESTAMP '1995-03-15'
  AND l.l_shipdate > TIMESTAMP '1995-03-15'
GROUP BY l.l_orderkey, orderdate
ORDER BY revenue DESC, l.l_orderkey
LIMIT 10
""",
)
def q_tpch_q3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: segment filter pushes into the customer scan, date
    filters into orders/lineitem; dims broadcast; one agg shuffle; top-k."""
    c = t(spark, sf_dir, "customer").where(F.col("c_mktsegment") == "BUILDING")
    o = t(spark, sf_dir, "orders").where(F.col("o_orderdate") < "1995-03-15")
    li = t(spark, sf_dir, "lineitem").where(F.col("l_shipdate") > "1995-03-15")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy(
            "l_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
        )
        .agg(F.sum(F.col("l_extendedprice") * (1.0 - F.col("l_discount"))).alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


@query(
    "q_tpch_q5_local_volume",
    oracle="""
SELECT n.n_name,
       SUM(l.l_extendedprice * (1.0 - l.l_discount)) AS revenue
FROM region r
JOIN nation n ON n.n_regionkey = r.r_regionkey
JOIN customer c ON c.c_nationkey = n.n_nationkey
JOIN orders o ON o.o_custkey = c.c_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN supplier s ON s.s_suppkey = l.l_suppkey AND s.s_nationkey = c.c_nationkey
WHERE r.r_name = 'ASIA'
GROUP BY n.n_name
""",
)
def q_tpch_q5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: 6-way join with a same-nation residual; every dim
    broadcasts, lineitem streams through exactly one agg shuffle."""
    r = t(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    n = t(spark, sf_dir, "nation")
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders")
    li = t(spark, sf_dir, "lineitem")
    s = t(spark, sf_dir, "supplier")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(
            F.broadcast(s),
            (s.s_suppkey == li.l_suppkey) & (s.s_nationkey == c.c_nationkey),
        )
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(F.sum(F.col("l_extendedprice") * (1.0 - F.col("l_discount"))).alias("revenue"))
    )


@query(
    "q_tpch_q10_returned",
    oracle="""
SELECT c.c_custkey, c.c_name,
       SUM(l.l_extendedprice * (1.0 - l.l_discount)) AS revenue,
       n.n_name
FROM customer c
JOIN orders o ON o.o_custkey = c.c_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN nation n ON n.n_nationkey = c.c_nationkey
WHERE l.l_returnflag = 'R'
GROUP BY c.c_custkey, c.c_name, n.n_name
ORDER BY revenue DESC, c.c_custkey
LIMIT 20
""",
)
def q_tpch_q10(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: returned-item revenue per customer, top 20."""
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders")
    li = t(spark, sf_dir, "lineitem").where(F.col("l_returnflag") == "R")
    n = t(spark, sf_dir, "nation")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(F.sum(F.col("l_extendedprice") * (1.0 - F.col("l_discount"))).alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


@query(
    "q_join_big_sort_merge",
    oracle="""
SELECT l.l_orderkey, CAST(COUNT(*) AS BIGINT) AS n_lines, o.o_totalprice
FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
GROUP BY l.l_orderkey, o.o_totalprice
""",
)
def q_join_big_sort_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact-fact join pinned to sort-merge (operators/joins.py): the 100 TB
    shape where neither side broadcasts — both shuffle on the key once and
    the aggregation reuses that partitioning."""
    li = t(spark, sf_dir, "lineitem")
    o = t(spark, sf_dir, "orders")
    return (
        merge_join(
            li.select("l_orderkey"),
            o.select(F.col("o_orderkey").alias("l_orderkey"), "o_totalprice"),
            on=["l_orderkey"],
        )
        .groupBy("l_orderkey", "o_totalprice")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_lines"))
        .select("l_orderkey", "n_lines", "o_totalprice")
    )


@query(
    "q_join_salted_skew",
    oracle="""
WITH skewed AS (
    SELECT CASE WHEN l_orderkey % 3 = 0 THEN 0 ELSE l_suppkey END AS skey,
           l_extendedprice
    FROM lineitem
)
SELECT s.s_name,
       CAST(COUNT(*) AS BIGINT) AS n,
       SUM(k.l_extendedprice) AS volume
FROM skewed k JOIN supplier s ON s.s_suppkey = k.skey
GROUP BY s.s_name
""",
)
def q_join_salted_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-safe salted join (operators/joins.py): a third of lineitem is
    forced onto one hot key; the salt spreads it over 8 reducers while the
    small side replicates 8x.  Same result as the plain join, skew-proof
    plan."""
    li = t(spark, sf_dir, "lineitem").select(
        F.when(F.col("l_orderkey") % 3 == 0, 0)
        .otherwise(F.col("l_suppkey"))
        .alias("skey"),
        "l_extendedprice",
    )
    s = t(spark, sf_dir, "supplier").select(
        F.col("s_suppkey").alias("skey"), "s_name"
    )
    return (
        salted_join(li, s, key="skey", n_salts=8)
        .groupBy("s_name")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum("l_extendedprice").alias("volume"),
        )
    )


# ONE SQL text, executed verbatim by BOTH Spark (spark.sql over registered
# views) and DuckDB (oracle) — dialect-common ANSI SQL.
_SHARED_SQL_PRICING = """
SELECT l_returnflag, l_linestatus,
       SUM(l_quantity) AS sum_qty,
       SUM(l_extendedprice * (1.0 - l_discount)) AS sum_disc_price,
       SUM(l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax)) AS sum_charge,
       AVG(l_quantity) AS avg_qty,
       CAST(COUNT(*) AS BIGINT) AS count_order
FROM lineitem
WHERE l_quantity < 45
GROUP BY l_returnflag, l_linestatus
"""

_SHARED_SQL_SUBQUERY = """
SELECT o_orderkey, o_totalprice
FROM orders
WHERE o_totalprice > (SELECT AVG(o_totalprice) * 1.5 FROM orders)
  AND o_custkey IN (SELECT c_custkey FROM customer WHERE c_acctbal > 0)
"""


@query("q_sql_shared_pricing", oracle=_SHARED_SQL_PRICING)
def q_sql_shared_pricing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Raw-SQL surface (sql.py): the exact oracle text runs through
    spark.sql — parser-level parity, not just semantic parity."""
    from .sql import run_sql

    return run_sql(spark, sf_dir, _SHARED_SQL_PRICING)


@query("q_sql_shared_subquery", oracle=_SHARED_SQL_SUBQUERY)
def q_sql_shared_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar + IN subqueries through the shared-SQL path."""
    from .sql import run_sql

    return run_sql(spark, sf_dir, _SHARED_SQL_SUBQUERY)


_SHARED_SQL_LATERAL = """
SELECT c.c_custkey, o.o_orderkey, o.o_totalprice
FROM customer c, LATERAL (
    SELECT o_orderkey, o_totalprice FROM orders
    WHERE o_custkey = c.c_custkey
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 2
) o
"""


@query("q_sql_lateral_topn", oracle=_SHARED_SQL_LATERAL)
def q_sql_lateral_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated LATERAL subquery (top-2 orders per customer) — the same
    text parses and plans on both engines; Spark rewrites it to a window
    top-N under the hood."""
    from .sql import run_sql

    return run_sql(spark, sf_dir, _SHARED_SQL_LATERAL)


@query(
    "q_tpch_q1_pricing_summary",
    oracle="""
SELECT l_returnflag,
       l_linestatus,
       ROUND(SUM(l_quantity), 3) AS sum_qty,
       ROUND(SUM(l_extendedprice), 3) AS sum_base_price,
       ROUND(SUM(l_extendedprice * (1.0 - l_discount)), 3) AS sum_disc_price,
       ROUND(SUM(l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax)), 3)
           AS sum_charge,
       ROUND(AVG(l_quantity), 6) AS avg_qty,
       ROUND(AVG(l_extendedprice), 6) AS avg_price,
       ROUND(AVG(l_discount), 6) AS avg_disc,
       CAST(COUNT(*) AS BIGINT) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
""",
)
def q_tpch_q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 pricing summary — THE scan-dominated aggregation benchmark:
    one pass over the fact table, map-side partial agg collapses to 4-6
    groups, the exchange carries grouped partials only.  Float sums rounded
    to 3 decimals on both engines (double addition order differs; magnitude
    ~1e8 leaves >= 1e-7 absolute precision, so millis-rounding is stable)."""
    li = t(spark, sf_dir, "lineitem").where(F.col("l_shipdate") <= "1998-09-02")
    disc = F.col("l_extendedprice") * (1.0 - F.col("l_discount"))
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        F.round(F.sum("l_quantity"), 3).alias("sum_qty"),
        F.round(F.sum("l_extendedprice"), 3).alias("sum_base_price"),
        F.round(F.sum(disc), 3).alias("sum_disc_price"),
        F.round(F.sum(disc * (1.0 + F.col("l_tax"))), 3).alias("sum_charge"),
        F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
        F.round(F.avg("l_extendedprice"), 6).alias("avg_price"),
        F.round(F.avg("l_discount"), 6).alias("avg_disc"),
        F.count(F.lit(1)).cast("bigint").alias("count_order"),
    )


@query(
    "q_tpch_q6_forecast_revenue",
    oracle="""
SELECT ROUND(SUM(l_extendedprice * l_discount), 3) AS revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate < TIMESTAMP '1997-01-01'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24.0
""",
)
def q_tpch_q6(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 forecast revenue — pure predicate-pushdown showcase: all
    three filters reach the parquet scan (min/max row-group skipping at
    scale), zero joins, single scalar result."""
    li = t(spark, sf_dir, "lineitem")
    return (
        li.where(
            (F.col("l_shipdate") >= "1996-01-01")
            & (F.col("l_shipdate") < "1997-01-01")
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24.0)
        )
        .agg(F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 3).alias("revenue"))
    )
