"""Raw-SQL entry point: register the star-schema tables as temp views and
run ANSI SQL through Spark's SQL parser.

The engine is DataFrame-first, but a user of the reference switching here
gets a full SQL surface for free (Catalyst parses/plans the same way).  The
`q_sql_*` queries run ONE shared SQL text through BOTH Spark and the DuckDB
oracle — dialect-common ANSI SQL, the strongest possible parity statement.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "documents", "embeddings",
]


def register_views(spark: SparkSession, sf_dir: str) -> None:
    for name in TABLES:
        spark.read.parquet(f"{sf_dir}/{name}.parquet").createOrReplaceTempView(name)


def run_sql(spark: SparkSession, sf_dir: str, query: str) -> DataFrame:
    register_views(spark, sf_dir)
    return spark.sql(query)
