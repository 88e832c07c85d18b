"""Direct unit tests for the tz-independence contract in
functions/timeutil.py — the property whose absence caused the r03
events-timestamp regression, previously pinned only indirectly through
query parity."""

from __future__ import annotations

from pyspark.sql import functions as F

from pipeline_calculator_v3_spark.functions.timeutil import (
    epoch_us,
    epoch_us_extractor,
)
from pipeline_calculator_v3_spark.session import scoped_conf


def _ntz_frame(spark):
    return spark.sql(
        """SELECT * FROM VALUES
           (TIMESTAMP_NTZ '1970-01-01 00:00:00'),
           (TIMESTAMP_NTZ '1970-01-01 00:00:01.000001'),
           (TIMESTAMP_NTZ '2001-09-09 01:46:40')
           AS t(ts)"""
    )


def test_epoch_us_known_values(spark):
    got = [r[0] for r in _ntz_frame(spark).select(epoch_us("ts")).collect()]
    assert got == [0, 1_000_001, 1_000_000_000_000_000]


def test_epoch_us_is_session_timezone_independent(spark):
    base = [r[0] for r in _ntz_frame(spark).select(epoch_us("ts")).collect()]
    for tz in ("Asia/Tokyo", "America/Chicago", "UTC"):
        with scoped_conf(spark, "spark.sql.session.timeZone", tz):
            got = [
                r[0]
                for r in _ntz_frame(spark).select(epoch_us("ts")).collect()
            ]
        assert got == base, tz


def test_extractor_dispatch_agrees_across_ts_types(spark):
    """The NTZ path (batch) and the TIMESTAMP path (streaming rebuild via
    timestamp_micros) must produce identical epoch-us for the same wall
    clock — the batch==stream equivalence hinge."""
    ntz = _ntz_frame(spark)
    micros = [r[0] for r in ntz.select(epoch_us("ts")).collect()]
    ts = spark.createDataFrame(
        [(m,) for m in micros], "us long"
    ).select(F.timestamp_micros("us").alias("ts"))

    ex_ntz = epoch_us_extractor(ntz)
    ex_ts = epoch_us_extractor(ts)
    a = [r[0] for r in ntz.select(ex_ntz("ts")).collect()]
    b = [r[0] for r in ts.select(ex_ts("ts")).collect()]
    assert a == b == micros
