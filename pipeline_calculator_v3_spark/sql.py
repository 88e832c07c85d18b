"""Raw-SQL entry point: register the star-schema tables as temp views and
run ANSI SQL through Spark's SQL parser.

The engine is DataFrame-first, but a user of the reference switching here
gets a full SQL surface for free (Catalyst parses/plans the same way).  The
`q_sql_*` queries run ONE shared SQL text through BOTH Spark and the DuckDB
oracle — dialect-common ANSI SQL, the strongest possible parity statement.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "documents", "embeddings",
]


def register_views(
    spark: SparkSession, sf_dir: str, only: list[str] | None = None
) -> None:
    for name in (only if only is not None else TABLES):
        spark.read.parquet(f"{sf_dir}/{name}.parquet").createOrReplaceTempView(name)


def run_sql(spark: SparkSession, sf_dir: str, query: str) -> DataFrame:
    """Register the referenced tables as temp views, then spark.sql.

    Only tables whose name appears in the query text are registered
    (word-boundary match — a CTE shadowing a table name just registers
    one unused view): each registration is a parquet footer/file-listing
    read, and at a million files per table that is real per-query cost
    for tables the query never touches (review r12); it also kept every
    q_sql_* face hostage to ALL nine fixture files existing."""
    referenced = [
        t for t in TABLES if re.search(rf"\b{t}\b", query, re.IGNORECASE)
    ]
    register_views(spark, sf_dir, only=referenced)
    from pyspark.errors import AnalysisException

    try:
        return spark.sql(query)
    except AnalysisException as e:
        # the literal-name scan can miss a table reached through a
        # non-literal spelling (f-string-built name, quoted identifier
        # variants) and the resulting TABLE_OR_VIEW_NOT_FOUND surfaces far
        # from the cause (review r12) — register everything and retry once.
        # Gated on the missing-relation error class: a syntax/type error
        # must not pay 8 parquet footer reads and a second plan just to
        # re-raise identically (review r13).
        if "TABLE_OR_VIEW_NOT_FOUND" not in str(e):
            raise
        missing = [t for t in TABLES if t not in referenced]
        if not missing:
            raise
        for t in missing:
            try:
                register_views(spark, sf_dir, only=[t])
            except Exception:
                pass  # fixture absent — keep the q_sql_* faces un-hostaged
        return spark.sql(query)
