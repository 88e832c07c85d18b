"""OHLC time-bucket downsampling — the classic time-series reduction
(open/high/low/close + count/mean per fixed bucket), shaped as ONE
aggregation.

The naive spelling uses row_number windows to find the first/last row per
bucket (two sorts) plus a separate min/max aggregate, i.e. two shuffles and
a window sort.  The scale-right spelling is a single hash aggregate with
map-side partials: `min_by`/`max_by` carry the open/close through the
partial-merge tree, so the data crosses exactly one exchange keyed on
(key, bucket) and nothing is ever sorted.

Determinism contract: open/close pick the value at the MINIMUM/MAXIMUM
(ts, tiebreak) ordering — so rows sharing a timestamp resolve identically
on every engine.  Callers pass a unique ``tiebreak_col`` (e.g. event_id);
timestamps are the repo-canonical epoch-µs BIGINT (README: cross-engine
time form).

Plan-shape trade (measured): a STRUCT ordering key is not a mutable
hash-agg buffer type, so the tie-broken form plans SortAggregate — still
ONE exchange with map-side partials, but each partition sorts on the
grouping key.  With ``tiebreak_col=None`` the ordering key stays a
primitive BIGINT and the same code plans HashAggregate; use that when the
timestamp is already unique per (key, bucket).

Replays in ANSI SQL as ``first_value(value) OVER (PARTITION BY key,
bucket ORDER BY ts, tb)`` joined to the grouped min/max — staged here for
the r09 registry face (DuckDB's arg_min rejects struct ordering args).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def ohlc_downsample(
    df: DataFrame,
    ts_col: str,
    value_col: str,
    bucket_us: int,
    key_cols: list[str] | None = None,
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Per (key_cols..., bucket) OHLC summary of ``value_col``.

    Returns key_cols + ``bucket_start_us`` (BIGINT, inclusive lower edge)
    + open/high/low/close (value type) + ``n_rows`` BIGINT +
    ``mean_value`` DOUBLE.  One hash aggregate, one exchange.
    """
    if bucket_us <= 0:
        raise ValueError("bucket_us must be positive")
    keys = list(key_cols or [])
    # primitive ordering key when possible: a bare column keeps the
    # aggregate hash-based (struct buffers demote it to SortAggregate)
    order = (
        F.struct(F.col(ts_col), F.col(tiebreak_col))
        if tiebreak_col
        else F.col(ts_col)
    )
    # pure integer arithmetic: ts - pmod(ts, w) is the floor-aligned bucket
    # edge over the FULL bigint range — ts/w promotes to DOUBLE and rounds
    # past 2^53, and engines disagree on negative integer division (DuckDB
    # // truncates toward zero, floor() rounds down; pmod sidesteps both —
    # review r08)
    bucket = (
        (F.col(ts_col) - F.pmod(F.col(ts_col), F.lit(bucket_us)))
        .cast("bigint")
        .alias("bucket_start_us")
    )
    v = F.col(value_col)
    return df.groupBy(*keys, bucket).agg(
        F.min_by(v, order).alias("open"),
        F.max(v).alias("high"),
        F.min(v).alias("low"),
        F.max_by(v, order).alias("close"),
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        F.avg(v).alias("mean_value"),
    )
