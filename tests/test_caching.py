"""Cache/checkpoint lifecycle: nothing the engine persists may outlive
``release_caches`` (VERDICT r02 'What's wrong' #1) — and session confs set
by readers must not leak (#2)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from pipeline_calculator_v3_spark import release_caches
from pipeline_calculator_v3_spark.caching import _persistent_ids
from pipeline_calculator_v3_spark.functions.geodesy import EARTH_RADIUS_M
from pipeline_calculator_v3_spark.plans.overlap import analyze_pipelines
from pipeline_calculator_v3_spark.queries import QUERIES, events_t

DEG_PER_M_LAT = 180.0 / (math.pi * EARTH_RADIUS_M)
T1_SCHEMA = (
    "pipeline_id bigint, name string, "
    "geometry array<struct<lon:double, lat:double>>"
)


def test_dedup_clusters_releases_everything(spark, sf_dir):
    release_caches(spark)  # start from a clean slate (other tests may pin)
    df = QUERIES["q_dedup_clusters"](spark, sf_dir)
    n = df.count()  # final materialization
    assert n > 0
    assert _persistent_ids(spark), "expected pinned state before release"
    release_caches(spark)
    assert _persistent_ids(spark) == set(), "dangling cached RDDs after release"


def test_overlap_e2e_releases_everything(spark):
    release_caches(spark)
    pipes = spark.createDataFrame(
        [
            (1, "A", [{"lon": -100.0, "lat": 40.0},
                      {"lon": -100.0, "lat": 40.0 + 400 * DEG_PER_M_LAT}]),
            (2, "B", [{"lon": -100.0 + 1e-5, "lat": 40.0},
                      {"lon": -100.0 + 1e-5, "lat": 40.0 + 400 * DEG_PER_M_LAT}]),
        ],
        T1_SCHEMA,
    )
    results = analyze_pipelines(pipes)
    # materialize the full envelope (the driver/sinks would)
    for name in ("lengths", "totals", "sections", "per_pipeline_overlap",
                 "effective", "summary"):
        results[name].collect()
    assert _persistent_ids(spark), "expected pinned segments/hits before release"
    release_caches(spark)
    assert _persistent_ids(spark) == set(), "dangling cached RDDs after release"


def test_minhash_releases_staged(spark, sf_dir):
    release_caches(spark)
    QUERIES["q_dedup_minhash"](spark, sf_dir).count()
    release_caches(spark)
    assert _persistent_ids(spark) == set()


def test_events_ts_unit(spark, sf_dir):
    """Guards the r03 regression class: events_t must decode the parquet's
    TIMESTAMP(MICROS) at the right unit, timezone-independently, with no
    session-conf mutation."""
    import datetime

    key = "spark.sql.legacy.parquet.nanosAsLong"
    before = spark.conf.get(key, None)
    ev = events_t(spark, sf_dir)
    assert spark.conf.get(key, None) == before, "events_t leaked the conf"
    # ts_us is the exact epoch-micros of the naive (NTZ) timestamp
    row = ev.select("ts", "ts_us").limit(1).collect()[0]
    epoch = datetime.datetime(1970, 1, 1)
    assert (row.ts - epoch) // datetime.timedelta(microseconds=1) == row.ts_us
    # the event timeline spans weeks — a wrong unit collapses it 1000x
    # (the r03 bug turned 30 days into 43 minutes)
    lo, hi = ev.agg(F.min("ts_us"), F.max("ts_us")).collect()[0]
    assert hi - lo > 20 * 24 * 3600 * 1_000_000, (
        f"events span {(hi - lo) / 86400e6:.3f} days — timestamp unit bug?"
    )
    # positive inference assert (ADVICE r03): the session-default read of the
    # same file must land on a timestamp type — catches both conf leaks and
    # unexpected inference changes (PySpark 4.1.2 infers TimestampNTZType).
    inferred = spark.read.parquet(f"{sf_dir}/events.parquet").schema["ts"].dataType
    assert inferred.typeName() in ("timestamp_ntz", "timestamp"), (
        f"post-events_t session infers events.ts as {inferred}"
    )
