"""Bucketed tables: pre-shuffled storage for repeated co-located joins.

At 100 TB, a fact-fact join repeated across many queries should not pay its
shuffle every time.  Writing both tables bucketed by the join key into the
warehouse lets every subsequent equi-join on that key plan with ZERO
exchanges — the sort-merge join reads co-located buckets directly.  This is
the storage-side optimization Catalyst cannot invent; it has to be a
deliberate layout decision (SURVEY.md §4's 'bucketing for co-located joins').
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(df: DataFrame, table: str, bucket_col: str,
                   n_buckets: int = 16, sort: bool = True) -> None:
    """Persist a DataFrame as a bucketed (and bucket-sorted) managed table."""
    w = df.write.mode("overwrite").bucketBy(n_buckets, bucket_col)
    if sort:
        w = w.sortBy(bucket_col)
    w.saveAsTable(table)


def bucketed_join(spark: SparkSession, left_table: str, right_table: str,
                  on: str, how: str = "inner") -> DataFrame:
    """Join two same-bucketed tables on the bucket key: plans with no
    shuffle Exchange on either side (verify via .explain — tests do).

    Pinned to sort-merge: at small test sizes the planner would broadcast
    and skip the bucketed layout entirely; SMJ is the strategy the bucketing
    exists for (both sides read pre-partitioned, pre-sorted buckets)."""
    l = spark.table(left_table).hint("merge")
    r = spark.table(right_table).hint("merge")
    return l.join(r, on, how)
