"""Binned interval join — the 1-D analog of the spatial grid join
(operators/spatial.py): points ⋈ intervals WITHOUT an equi key normally
plans as a broadcast-nested-loop (fine only while one side is tiny) or a
cartesian (never fine).  Binning converts it to an EQUI-join:

- each point lands in exactly ONE bin (floor(value / w)),
- each interval explodes to every bin it overlaps (ceil(len/w)+1 rows),
- equi-join on the bin id, exact BETWEEN as residual filter.

Because a point has a single bin, no pair dedup is needed (the interval
side may cover the bin multiple ways only if intervals duplicate — caller's
contract).  Shuffle is keyed on a dense integer; skew follows the data
distribution and is AQE-splittable.  Bin width trades interval fan-out
(len/w rows per interval) against bin population — pick w near the median
interval length, same sizing rule as the spatial cell.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_bin_join(
    points: DataFrame,
    intervals: DataFrame,
    value_col: str,
    lo_col: str,
    hi_col: str,
    bin_width: float,
) -> DataFrame:
    """Inner-join points to every interval containing them, via bin equi-join
    + exact residual.  Returns all point columns + all interval columns."""
    if bin_width <= 0:
        raise ValueError("bin_width must be positive")
    # review r06: a shared column name would emit ambiguous duplicates
    # (downstream select throws AMBIGUOUS_REFERENCE), and a pre-existing
    # '_bin' would be silently overwritten then dropped from the output
    overlap = set(points.columns) & set(intervals.columns)
    if overlap:
        raise ValueError(
            f"points and intervals share column names {sorted(overlap)}; "
            f"rename one side — the result carries all columns of both"
        )
    if "_bin" in points.columns or "_bin" in intervals.columns:
        raise ValueError("'_bin' is reserved by interval_bin_join")
    p = points.withColumn(
        "_bin", F.floor(F.col(value_col) / F.lit(bin_width)).cast("long")
    )
    iv = intervals.withColumn(
        "_bin",
        F.explode(
            F.sequence(
                F.floor(F.col(lo_col) / F.lit(bin_width)).cast("long"),
                F.floor(F.col(hi_col) / F.lit(bin_width)).cast("long"),
            )
        ),
    )
    return (
        p.join(iv, "_bin")
        .where(
            (F.col(value_col) >= F.col(lo_col))
            & (F.col(value_col) <= F.col(hi_col))
        )
        .drop("_bin")
    )
