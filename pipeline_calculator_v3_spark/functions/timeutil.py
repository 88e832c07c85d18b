"""Timezone-independent time conversions.

The events timestamp is parquet TIMESTAMP(MICROS, isAdjustedToUTC=false) —
Spark TIMESTAMP_NTZ.  The cross-engine canonical form (matching DuckDB's
``epoch_us(ts)`` on the same naive timestamp) is epoch-microseconds as
BIGINT.  ``unix_micros()`` only accepts TIMESTAMP (session-timezone
dependent); ``timestampdiff`` from the NTZ epoch never consults a timezone,
so results are identical on any driver/executor TZ configuration — the
property that matters on a heterogeneous 1000-executor cluster.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def epoch_us_sql(col: str) -> str:
    """SQL fragment: epoch-µs BIGINT of a TIMESTAMP_NTZ column/expression."""
    return f"timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', {col})"


def epoch_us(col: str) -> Column:
    return F.expr(epoch_us_sql(col))


def epoch_us_extractor(events):
    """Pick the tz-independent epoch-µs extractor for a frame's ``ts`` type.

    Batch frames carry the parquet-native TIMESTAMP_NTZ; streaming frames
    carry TIMESTAMP rebuilt as ``timestamp_micros(ts_us)`` (Structured
    Streaming watermarks reject NTZ) whose UTC instant encodes the same
    wall clock.  Both extractors below are session-timezone independent, so
    batch and stream outputs are bit-identical: timestampdiff-from-NTZ-epoch
    for NTZ, unix_micros (pure UTC-instant read) for TIMESTAMP.
    """
    t = events.schema["ts"].dataType.typeName()
    if t == "timestamp_ntz":
        return epoch_us
    return lambda c: F.unix_micros(F.col(c))
