"""As-of join: for each left row, the most recent right row at-or-before it.

Scalable union+window formulation: instead of a range join (quadratic worst
case), tag and union both sides, sort once within each key partition, and
carry the latest right-side payload forward with ``last(..., ignorenulls)``.
One shuffle on the join key; no build-side explosion — this is the plan that
survives 100 TB (a range join + max-aggregate re-reads the right side per
left row).

Ties: right rows at ts == left ts sort *before* left rows (tag 0 < 1), so the
match is inclusive (asof <=), matching DuckDB ``ASOF JOIN`` / correlated-max
semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str,
    right_ts: str,
    payload: list[str],
    suffix: str = "_asof",
) -> DataFrame:
    """Left as-of join. ``payload`` columns from ``right`` are carried onto
    each ``left`` row as ``<name><suffix>`` (NULL when no prior right row).
    """
    lcols = left.columns
    l = left.withColumn("__tag", F.lit(1)).withColumn("__ts", F.col(left_ts))
    r = right.select(
        *on,
        F.lit(0).alias("__tag"),
        F.col(right_ts).alias("__ts"),
        *[F.col(c).alias(f"{c}{suffix}") for c in payload],
    )
    for c in lcols:
        if c not in on:
            r = r.withColumn(c, F.lit(None).cast(dict(left.dtypes)[c]))
    payload_cols = [f"{c}{suffix}" for c in payload]
    for c in payload_cols:
        l = l.withColumn(c, F.lit(None).cast(dict(r.dtypes)[c]))
    u = l.select(*lcols, *payload_cols, "__tag", "__ts").unionByName(
        r.select(*lcols, *payload_cols, "__tag", "__ts")
    )
    w = (
        Window.partitionBy(*on)
        .orderBy("__ts", "__tag")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = u.select(
        *[c for c in lcols if c not in on],
        *on,
        "__tag",
        *[F.last(c, ignorenulls=True).over(w).alias(c) for c in payload_cols],
    )
    return filled.where(F.col("__tag") == 1).drop("__tag")
