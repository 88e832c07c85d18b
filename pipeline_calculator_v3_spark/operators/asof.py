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

    The payload travels as ONE struct column (review r06): per-column
    ``last(ignorenulls)`` could not distinguish the union's filler NULLs
    from genuine NULL payload values, so a NULL in the most recent right
    row was silently replaced by an older row's value — and multi-column
    payloads could be TORN across different right rows.  The struct is
    non-null for every right row even when its members are null, so the
    whole matched row is carried atomically.
    """
    lcols = left.columns
    payload_cols = [f"{c}{suffix}" for c in payload]
    clash = set(payload_cols) & set(lcols)
    if clash:
        raise ValueError(
            f"payload+suffix collides with left columns {sorted(clash)}; "
            f"the old code silently overwrote the left values (review r06) "
            f"— pick a different suffix"
        )
    r = right.select(
        *on,
        F.lit(0).alias("__tag"),
        F.col(right_ts).alias("__ts"),
        F.struct(
            *[F.col(c).alias(f"{c}{suffix}") for c in payload]
        ).alias("__p"),
    )
    p_type = dict(r.dtypes)["__p"]
    l = (
        left.withColumn("__tag", F.lit(1))
        .withColumn("__ts", F.col(left_ts))
        .withColumn("__p", F.lit(None).cast(p_type))
    )
    for c in lcols:
        if c not in on:
            r = r.withColumn(c, F.lit(None).cast(dict(left.dtypes)[c]))
    u = l.select(*lcols, "__p", "__tag", "__ts").unionByName(
        r.select(*lcols, "__p", "__tag", "__ts")
    )
    w = (
        Window.partitionBy(*on)
        .orderBy("__ts", "__tag")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = u.select(
        *lcols,
        "__tag",
        F.last("__p", ignorenulls=True).over(w).alias("__p"),
    )
    return filled.where(F.col("__tag") == 1).select(
        *lcols,
        *[F.col(f"__p.{pc}").alias(pc) for pc in payload_cols],
    )
